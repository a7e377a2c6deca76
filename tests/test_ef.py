"""Elias-Fano succinct index round trips (replaces sux's EliasFano +
SelectAdaptConst; reference: src/bvgraph/factories/mod.rs:6-8)."""

import ctypes

import numpy as np
import pytest

from webgraph_ans_tpu.utils import native


def ef_roundtrip(vals: np.ndarray):
    lib = native.get_lib()
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    u = int(vals[-1]) + 1 if len(vals) else 1
    size = lib.wgt_ef_build_size(native.as_ptr(vals, ctypes.c_uint64), len(vals), u)
    assert size > 0
    blob = np.empty(size, dtype=np.uint8)
    assert lib.wgt_ef_build(native.as_ptr(vals, ctypes.c_uint64), len(vals), u,
                            native.as_ptr(blob, ctypes.c_uint8)) == 0
    h = native.check_ptr(lib.wgt_ef_load(native.as_ptr(blob, ctypes.c_uint8), size))
    try:
        idx = np.arange(len(vals), dtype=np.uint64)
        out = np.empty(len(vals), dtype=np.uint64)
        lib.wgt_ef_get_many(h, native.as_ptr(idx, ctypes.c_uint64), len(vals),
                            native.as_ptr(out, ctypes.c_uint64))
        np.testing.assert_array_equal(out, vals)
    finally:
        lib.wgt_ef_free(h)
    return size


@pytest.mark.parametrize("n,scale", [(10, 100), (1000, 5), (100_000, 37), (65_537, 1)])
def test_ef_roundtrip_random_monotone(n, scale):
    rng = np.random.default_rng(n)
    vals = np.cumsum(rng.integers(0, scale + 1, size=n, dtype=np.uint64))
    ef_roundtrip(vals)


def test_ef_with_repeats_and_zeros():
    vals = np.array([0, 0, 0, 5, 5, 7, 7, 7, 7, 100], dtype=np.uint64)
    ef_roundtrip(vals)


def test_ef_compresses_dense_sequences():
    # n values bounded by 2n must take ~2-3 bits per element, far below 64.
    n = 100_000
    vals = np.arange(n, dtype=np.uint64) * 2
    size = ef_roundtrip(vals)
    assert size * 8 < 4 * n  # < 4 bits/value including header

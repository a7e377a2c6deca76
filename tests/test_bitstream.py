"""Tier-0: instantaneous-code round trips through the native bit writer/reader."""

import ctypes

import numpy as np
import pytest

from webgraph_ans_tpu.utils import native
from webgraph_ans_tpu.bvgraph.properties import UNARY, GAMMA, DELTA, ZETA


def roundtrip(values, codes, zeta_k=3):
    lib = native.get_lib()
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    cds = np.ascontiguousarray(codes, dtype=np.int32)
    unary_bits = int(vals[cds == UNARY].sum()) if (cds == UNARY).any() else 0
    cap = unary_bits // 8 + len(vals) * 16 + 64
    buf = np.zeros(cap, dtype=np.uint8)
    nbytes = lib.wgt_write_codes(
        native.as_ptr(vals, ctypes.c_uint64), native.as_ptr(cds, ctypes.c_int32),
        len(vals), zeta_k, native.as_ptr(buf, ctypes.c_uint8), cap,
    )
    assert nbytes > 0
    out = np.empty(len(vals), dtype=np.uint64)
    rc = lib.wgt_read_codes(
        native.as_ptr(buf, ctypes.c_uint8), nbytes,
        native.as_ptr(cds, ctypes.c_int32), len(vals), zeta_k,
        native.as_ptr(out, ctypes.c_uint64),
    )
    assert rc == 0
    return out


@pytest.mark.parametrize("code", [UNARY, GAMMA, DELTA, ZETA])
def test_small_values_roundtrip(code):
    values = np.arange(0, 300, dtype=np.uint64)
    out = roundtrip(values, np.full(len(values), code))
    np.testing.assert_array_equal(out, values)


@pytest.mark.parametrize("code", [GAMMA, DELTA, ZETA])
@pytest.mark.parametrize("zeta_k", [1, 2, 3, 5])
def test_random_values_roundtrip(code, zeta_k):
    rng = np.random.default_rng(42)
    values = rng.integers(0, 1 << 40, size=5000, dtype=np.uint64)
    out = roundtrip(values, np.full(len(values), code), zeta_k)
    np.testing.assert_array_equal(out, values)


def test_mixed_codes_roundtrip():
    rng = np.random.default_rng(7)
    values = rng.integers(0, 1 << 20, size=2000, dtype=np.uint64)
    codes = rng.integers(0, 4, size=2000, dtype=np.int32)
    values[codes == UNARY] %= 64  # keep unary lengths sane
    out = roundtrip(values, codes)
    np.testing.assert_array_equal(out, values)


def test_known_gamma_codewords():
    # gamma(0)='1', gamma(1)='010', gamma(2)='011' -> byte 0b10100110...
    lib = native.get_lib()
    vals = np.array([0, 1, 2], dtype=np.uint64)
    cds = np.full(3, GAMMA, dtype=np.int32)
    buf = np.zeros(16, dtype=np.uint8)
    n = lib.wgt_write_codes(
        native.as_ptr(vals, ctypes.c_uint64), native.as_ptr(cds, ctypes.c_int32),
        3, 3, native.as_ptr(buf, ctypes.c_uint8), 16,
    )
    assert n == 1
    assert buf[0] == 0b10100110


def test_known_zeta3_lengths():
    # zeta_3(0) occupies 3 bits ('100'), zeta_3(7) -> unary(1)+5 bits = 7 bits
    lib = native.get_lib()
    for value, nbits in [(0, 3), (7, 7), (15, 8)]:
        vals = np.array([value] * 8, dtype=np.uint64)
        cds = np.full(8, ZETA, dtype=np.int32)
        buf = np.zeros(64, dtype=np.uint8)
        n = lib.wgt_write_codes(
            native.as_ptr(vals, ctypes.c_uint64), native.as_ptr(cds, ctypes.c_int32),
            8, 3, native.as_ptr(buf, ctypes.c_uint8), 64,
        )
        assert n == nbits  # 8 copies of an nbits codeword = nbits bytes


def test_nibble_roundtrip():
    """NIBBLE (Java webgraph variable-length nibble code): known lengths +
    random round trip. 0 -> '1000' (4 bits), 7 -> '1111', 8 -> 0|001 1|000."""
    from webgraph_ans_tpu.bvgraph.properties import NIBBLE

    values = np.concatenate([
        np.arange(0, 200, dtype=np.uint64),
        np.random.default_rng(7).integers(0, 1 << 40, size=3000,
                                          dtype=np.uint64),
    ])
    out = roundtrip(values, np.full(len(values), NIBBLE))
    np.testing.assert_array_equal(out, values)

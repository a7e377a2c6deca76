"""Model-builder semantics: folding, scaling invariants, grid-search behavior
(reference: src/ans/model4encoder_builder.rs, src/utils/data_utils.rs)."""

import ctypes

import numpy as np

from webgraph_ans_tpu.ans.model import (
    MAX_RAW_SYMBOL,
    PARAMS_COMBINATIONS,
    build_model,
    fold_one,
    fold_symbols,
)
from webgraph_ans_tpu.bvgraph.estimators import entropy_tables
from webgraph_ans_tpu.utils import native

from conftest import zipf_symbols


def make_hists(per_comp: dict[int, np.ndarray]):
    hists = []
    for comp in range(9):
        if comp in per_comp:
            syms, counts = np.unique(per_comp[comp], return_counts=True)
            hists.append((syms.astype(np.uint64), counts.astype(np.uint64)))
        else:
            hists.append((np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)))
    return hists


def test_params_combinations_match_reference_order():
    # reference builder.rs:28-37: (fidelity, radix) with 4 <= f+r <= 11
    assert PARAMS_COMBINATIONS[:3] == ((1, 3), (2, 2), (3, 1))
    assert PARAMS_COMBINATIONS[-1] == (10, 1)
    assert len(PARAMS_COMBINATIONS) == 52
    assert all(4 <= f + r <= 11 for f, r in PARAMS_COMBINATIONS)


def test_fold_matches_scalar():
    rng = np.random.default_rng(0)
    for fidelity, radix in [(1, 3), (2, 2), (5, 1), (1, 10), (10, 1)]:
        threshold = 1 << (fidelity + radix - 1)
        syms = rng.integers(threshold, MAX_RAW_SYMBOL, size=1000, dtype=np.uint64)
        vec = fold_symbols(syms, radix, fidelity)
        ref = np.array([fold_one(int(s), radix, fidelity) for s in syms])
        np.testing.assert_array_equal(vec, ref)
        assert (vec <= 0xFFFF).all()


def test_fold_max_symbol_bounded():
    for fidelity, radix in PARAMS_COMBINATIONS:
        assert fold_one(MAX_RAW_SYMBOL, radix, fidelity) <= 0xFFFF


def test_scale_freqs_invariants():
    lib = native.get_lib()
    rng = np.random.default_rng(1)
    freqs = np.zeros(1000, dtype=np.uint64)
    nz = rng.choice(1000, size=300, replace=False)
    freqs[nz] = rng.integers(1, 10_000, size=300)
    total = int(freqs.sum())
    order = np.argsort(freqs[np.sort(nz)], kind="stable")
    sorted_idx = np.sort(nz)[order].astype(np.uint64)
    for new_m in (512, 1024, 4096, 65536):
        out = freqs.copy()
        rc = lib.wgt_scale_freqs(
            native.as_ptr(freqs, ctypes.c_uint64),
            native.as_ptr(sorted_idx, ctypes.c_uint64),
            len(sorted_idx), total, new_m,
            native.as_ptr(out, ctypes.c_uint64),
        )
        if rc != 0:
            assert new_m < 300  # can only fail when frame < #symbols
            continue
        assert (out[nz] >= 1).all()
        assert (out[freqs == 0] == 0).all()
        assert out[nz].sum() <= new_m


def test_built_model_invariants():
    hists = make_hists({0: zipf_symbols(100_000, 1.3, seed=2),
                        8: zipf_symbols(100_000, 1.6, seed=3)})
    model = build_model(hists)
    for comp in (0, 8):
        c = model.components[comp]
        assert 0 < c.log_m <= 16
        total = int(c.freqs.sum())
        assert total <= (1 << c.log_m)
        # every observed folded symbol has nonzero scaled frequency
        syms, _ = hists[comp]
        threshold = c.folding_threshold
        folded = np.where(
            syms < threshold, syms.astype(np.int64),
            fold_symbols(np.maximum(syms, threshold), c.radix, c.fidelity),
        )
        assert (c.freqs[folded] > 0).all()
    # empty components get the default placeholder
    assert len(model.components[1].freqs) == 0


def test_entropy_tables_cover_all_folded_symbols():
    hists = make_hists({0: zipf_symbols(10_000, 1.4, seed=4)})
    model = build_model(hists)
    tables = entropy_tables(model)
    c = model.components[0]
    assert int(tables.lens[0]) == fold_one(MAX_RAW_SYMBOL, c.radix, c.fidelity) + 1
    assert (tables.costs[: int(tables.lens[0])] > 0).all()


def test_singleton_distribution():
    # A singleton component in a graph where other components carry entropy
    # gets a frame of size 1 (cost difference 0 -> ratio 1 <= THETA at m=1).
    hists = make_hists({0: np.full(100, 7, dtype=np.uint64),
                        8: zipf_symbols(1000, 1.5, seed=6)})
    model = build_model(hists)
    c = model.components[0]
    assert c.log_m == 0  # one symbol -> frame of size 1
    assert int(c.freqs.sum()) == 1

    # Degenerate all-deterministic graph: the reference's 0/0=NaN path ends
    # in UB (u16-wrapped frequency, unchecked division by zero); we instead
    # accept the smallest zero-cost frame. See model.py build_model.
    hists0 = make_hists({0: np.full(100, 7, dtype=np.uint64)})
    model0 = build_model(hists0)
    assert model0.components[0].log_m == 0
    assert int(model0.components[0].freqs.sum()) == 1

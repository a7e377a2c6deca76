"""Succinct-pointer random access: the Elias-Fano `.pointers` structure
stays resident and every phase lookup selects into it, instead of
decompressing to a plain u64 array at load (reference keeps the sux EF +
SelectAdaptConst in memory the same way:
src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58)."""

import numpy as np

from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import store

from conftest import CNR


def _store(tmp_path, **kw):
    base = str(tmp_path / "cnr")
    store(CNR, base, **kw)
    return base


def test_ef_mode_matches_array_mode(tmp_path, cnr2000):
    base = _store(tmp_path)
    g_ef = ANSBvGraph.load(base)                     # succinct (default)
    g_arr = ANSBvGraph.load(base, ef_pointers=False)  # materialized
    assert g_ef._pointers is None and g_ef._ef_handle

    rng = np.random.default_rng(7)
    nodes = rng.integers(0, g_ef.num_nodes, size=200)
    a = g_ef.successors_batch(nodes)
    b = g_arr.successors_batch(nodes)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.succs, b.succs)

    adj, _ = cnr2000
    for x in [0, 1, 77, g_ef.num_nodes - 1]:
        np.testing.assert_array_equal(g_ef.successors(x), adj.successors(x))

    # the native bench walks the same arcs through either pointer form
    assert g_ef.bench_random(2000, seed=3) == g_arr.bench_random(2000, seed=3)


def test_ef_mode_materializes_pointers_lazily(tmp_path):
    base = _store(tmp_path)
    g_ef = ANSBvGraph.load(base)
    g_arr = ANSBvGraph.load(base, ef_pointers=False)
    np.testing.assert_array_equal(g_ef.pointers, g_arr.pointers)
    assert g_ef._pointers is not None  # cached after first use


def test_ef_mode_with_phase_sampling(tmp_path, cnr2000):
    base = _store(tmp_path, phase_step=8)
    g_ef = ANSBvGraph.load(base)
    adj, _ = cnr2000
    rng = np.random.default_rng(11)
    nodes = rng.integers(0, g_ef.num_nodes, size=64)
    got = g_ef.successors_batch(nodes)
    for i, x in enumerate(nodes):
        np.testing.assert_array_equal(got.successors(i), adj.successors(x))

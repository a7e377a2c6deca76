"""Phase sampling (.states/.pointers at every k-th node): random access
must stay exact while the phase artifacts shrink ~k x.

The reference stores a phase per node and its authors flag the resulting
2.4-3.4x overhead vs BVGraph offsets as an open problem (reference
README.md:176-179); sampling is this framework's answer (the same dial
BVGraph's own offset steps use)."""

import dataclasses

import numpy as np
import pytest

from webgraph_ans_tpu.ans.prelude import Prelude
from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency


def _sampled_graph(res, step):
    """Build the sampled-phase reader from a full CompressionResult the
    same way store(phase_step=...) persists it."""
    prelude = dataclasses.replace(res.prelude, phase_step=step)
    n = prelude.num_nodes
    keep_nodes = np.arange(0, n, step)
    rev_idx = (n - 1 - keep_nodes)[::-1]
    return ANSBvGraph(prelude,
                      np.ascontiguousarray(res.states[rev_idx]),
                      np.ascontiguousarray(res.pointers[rev_idx]))


def _random_adj(seed, n=300, dmax=14):
    rng = np.random.default_rng(seed)
    lists = []
    for i in range(n):
        dd = int(rng.integers(0, dmax))
        lists.append(sorted(rng.choice(n, size=dd, replace=False).tolist()))
    return Adjacency.from_lists(lists)


@pytest.mark.parametrize("step", [2, 3, 7])
def test_sampled_random_access_matches_full(step):
    adj = _random_adj(5)
    res = compress_adjacency(adj, 7, 3, 2)
    full = ANSBvGraph(res.prelude, res.states, res.pointers)
    sub = _sampled_graph(res, step)
    rng = np.random.default_rng(1)
    queries = rng.integers(0, adj.num_nodes, size=400).astype(np.uint64)
    assert (sub.successors_batch(queries).to_lists()
            == full.successors_batch(queries).to_lists())


def test_sampled_deep_chains():
    """High-compression-style settings (big window, unbounded ref chains):
    skip-decode must recurse through references that predate the sample."""
    adj = _random_adj(9, n=200, dmax=10)
    res = compress_adjacency(adj, 16, 2_000_000_000, 2)
    full = ANSBvGraph(res.prelude, res.states, res.pointers)
    sub = _sampled_graph(res, 5)
    queries = np.arange(adj.num_nodes, dtype=np.uint64)
    assert (sub.successors_batch(queries).to_lists()
            == full.successors_batch(queries).to_lists())


def test_sampled_bench_random_runs():
    adj = _random_adj(3)
    res = compress_adjacency(adj, 7, 3, 2)
    sub = _sampled_graph(res, 4)
    full = ANSBvGraph(res.prelude, res.states, res.pointers)
    assert sub.bench_random(500, seed=2) == full.bench_random(500, seed=2)


def test_sampled_artifacts_serialize_roundtrip(tmp_path):
    """Prelude v3 + sampled .states/.pointers persist and reload exactly
    (the on-disk path store(phase_step=k) uses)."""
    import os

    from webgraph_ans_tpu.ans.prelude import (load_pointers, load_states,
                                              save_pointers, save_states)

    adj = _random_adj(12)
    res = compress_adjacency(adj, 7, 3, 2)
    step = 3
    prelude = dataclasses.replace(res.prelude, phase_step=step)
    n = prelude.num_nodes
    keep_nodes = np.arange(0, n, step)
    rev_idx = (n - 1 - keep_nodes)[::-1]
    base = str(tmp_path / "samp")
    full_base = str(tmp_path / "full")
    prelude.save(base)
    save_states(base, res.states[rev_idx])
    save_pointers(base, res.pointers[rev_idx])
    res.prelude.save(full_base)
    save_states(full_base, res.states)
    save_pointers(full_base, res.pointers)

    gs = ANSBvGraph.load(base)
    gf = ANSBvGraph.load(full_base)
    assert gs.prelude.phase_step == step
    assert len(gs.states) == -(-n // step)
    assert (os.path.getsize(base + ".states")
            < os.path.getsize(full_base + ".states"))
    assert (os.path.getsize(base + ".pointers")
            < os.path.getsize(full_base + ".pointers"))
    q = np.arange(n, dtype=np.uint64)
    assert (gs.successors_batch(q).to_lists()
            == gf.successors_batch(q).to_lists())


@pytest.mark.parametrize("encode_blocks", [1, 8])
def test_tpu_decode_on_sampled_artifact(encode_blocks):
    """Full-graph TPU decode works on phase-sampled artifacts: lanes snap
    to valid entry points (sampled nodes + encode-block starts) and rings
    seed through the native skip-decoder."""
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct

    adj = _random_adj(21, n=250, dmax=12)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=encode_blocks)
    sub = _sampled_graph(res, 4)
    dec = TpuGraphDecoder(sub)
    vals, comps = dec.decode_tokens(num_lanes=16)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, 2)
    np.testing.assert_array_equal(succs, adj.succs)
    # device CSR path too
    offs_d, F, E = dec.decode_to_csr_device(num_lanes=16)
    np.testing.assert_array_equal(
        np.asarray(F[:E]).astype(np.uint32), adj.succs)

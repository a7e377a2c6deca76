"""TPU lane-parallel rANS encoder.

Single block: the device encoder must be BIT-IDENTICAL to the native serial
encoder (same algorithm, division-free). Multi block: streams differ by
design (independent per-block states); every decode path must reproduce the
graph bit-exactly and the stream must not grow more than a few words per
block.
"""

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
from webgraph_ans_tpu.bvgraph.store import compress_adjacency, dump_tokens
from webgraph_ans_tpu.ops.encode_jax import lane_encode_tokens
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct


def _rand_adj(n=300, seed=3, dmax=15):
    rng = np.random.default_rng(seed)
    lists = [sorted(rng.choice(n, size=int(rng.integers(0, dmax)),
                               replace=False).tolist()) for _ in range(n)]
    return Adjacency.from_lists(lists)


def test_single_block_bit_identical():
    adj = _rand_adj()
    res = compress_adjacency(adj, 7, 3, 2)
    vals, comps = dump_tokens(adj, 7, 3, 2, res.est_tables)
    stream, states, ptrs, fstate, blocks = lane_encode_tokens(
        res.prelude.model, vals, comps, num_blocks=1, window=7)
    np.testing.assert_array_equal(stream, res.prelude.stream)
    np.testing.assert_array_equal(states, res.states)
    np.testing.assert_array_equal(ptrs, res.pointers)
    assert fstate == res.prelude.state


@pytest.mark.parametrize("blocks", [4, 32])
def test_multi_block_all_decode_paths(blocks):
    adj = _rand_adj(n=400, seed=9)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=blocks)
    serial = compress_adjacency(adj, 7, 3, 2)
    # a few words per block of overhead at most (often smaller)
    assert len(res.prelude.stream) <= len(serial.prelude.stream) + 2 * blocks
    assert res.prelude.blocks is not None

    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    vals, comps = dec.decode_tokens(num_lanes=8)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, 2)
    assert np.array_equal(succs, adj.succs)

    seq = ANSBvGraphSeq(res.prelude).decode_all()
    assert np.array_equal(seq.succs, adj.succs)

    q = np.arange(0, adj.num_nodes, 7, dtype=np.uint64)
    got = g.successors_batch(q)
    want = [adj.successors(int(i)).tolist() for i in q]
    assert got.to_lists() == want


def test_prelude_v2_roundtrip(tmp_path):
    adj = _rand_adj(n=200, seed=1)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=8)
    base = str(tmp_path / "g")
    res.prelude.save(base)
    from webgraph_ans_tpu.ans.prelude import Prelude
    loaded = Prelude.load(base)
    assert loaded.blocks is not None
    for a, b in zip(loaded.blocks, res.prelude.blocks):
        np.testing.assert_array_equal(a, b)
    seq = ANSBvGraphSeq(loaded).decode_all()
    assert np.array_equal(seq.succs, adj.succs)


@pytest.mark.slow
def test_cnr2000_parallel_encode(cnr2000):
    adj, _ = cnr2000
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=512)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    vals, comps = dec.decode_tokens(num_lanes=256)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, 2)
    assert np.array_equal(succs, adj.succs)
    seq = ANSBvGraphSeq(res.prelude).decode_all()
    assert np.array_equal(seq.succs, adj.succs)


def test_parallel_encode_edge_graphs():
    for lists in ([[]], [[], [], []], [[1], [], [0, 2]]):
        adj = Adjacency.from_lists(lists)
        res = compress_adjacency(adj, 7, 3, 2, encode_blocks=4)
        seq = ANSBvGraphSeq(res.prelude).decode_all()
        assert seq.to_lists() == lists

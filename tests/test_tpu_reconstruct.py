"""TPU successor reconstruction (parse + prefill + gather/sort rounds) vs
the native serial reconstruction, end to end through the TPU token decoder."""

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct


def _roundtrip_tpu(adj, window=7, max_ref=3, min_interval=2, num_lanes=4):
    res = compress_adjacency(adj, window, max_ref, min_interval)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    vals, comps = dec.decode_tokens(num_lanes=num_lanes)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, min_interval)
    got = Adjacency(offsets, succs)
    assert got.to_lists() == adj.to_lists()


def test_reconstruct_dummy(dummy_graph):
    _roundtrip_tpu(dummy_graph, num_lanes=2)


def test_reconstruct_structured():
    n = 64
    lists = []
    for i in range(n):
        if i % 4 == 0:
            lists.append(list(range(0, 32)))
        elif i % 4 == 1:
            lists.append(list(range(0, 32)))
        elif i % 4 == 2:
            lists.append([j for j in range(0, 32) if j % 3 != 0])
        else:
            lists.append([1, 5, 50, 63])
    _roundtrip_tpu(Adjacency.from_lists(lists), min_interval=4, num_lanes=8)


def test_reconstruct_window_zero():
    lists = [[1, 2], [0, 2], [0, 1], [3]]
    _roundtrip_tpu(Adjacency.from_lists(lists), window=0, max_ref=0,
                   num_lanes=2)


def test_reconstruct_no_intervals():
    lists = [[1, 2, 3, 4], [1, 2, 3, 4], [0, 4], []]
    _roundtrip_tpu(Adjacency.from_lists(lists), min_interval=0, num_lanes=2)


def test_reconstruct_random_graph():
    rng = np.random.default_rng(23)
    lists = []
    for i in range(300):
        dcur = int(rng.integers(0, 15))
        lists.append(sorted(rng.choice(300, size=dcur, replace=False).tolist()))
    _roundtrip_tpu(Adjacency.from_lists(lists), num_lanes=16)


def test_reconstruct_deep_ref_chains():
    """max_ref_count > default: long copy chains exercise multiple rounds."""
    lists = [sorted({1, 3, 5, 7, 9} | {i % 11}) for i in range(40)]
    _roundtrip_tpu(Adjacency.from_lists(lists), max_ref=10, num_lanes=4)


@pytest.mark.slow
def test_reconstruct_cnr2000(cnr2000):
    adj, _ = cnr2000
    _roundtrip_tpu(adj, num_lanes=256)


@pytest.mark.slow
def test_reconstruct_cnr2000_high_compression(cnr2000):
    """High-compression mode (reference: -w 16 -c 2000000000, script.py:24):
    unbounded reference chains exercise the deep-chain reconstruction path."""
    adj, _ = cnr2000
    res = compress_adjacency(adj, compression_window=16,
                             max_ref_count=2_000_000_000,
                             min_interval_length=4)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    vals, comps = dec.decode_tokens(num_lanes=64)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, 4)
    assert Adjacency(offsets, succs).to_lists() == adj.to_lists()


def test_device_reconstruct_random_graph():
    """Full device pipeline (decode_to_csr_device) matches the host path."""
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    rng = np.random.default_rng(55)
    lists = []
    for i in range(600):
        dd = int(rng.integers(0, 16))
        lists.append(sorted(rng.choice(600, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    for blocks in (1, 8):
        res = compress_adjacency(adj, 7, 3, 2, encode_blocks=blocks)
        g = ANSBvGraph(res.prelude, res.states, res.pointers)
        dec = TpuGraphDecoder(g)
        offsets, succs, E = dec.decode_to_csr_device(num_lanes=16)
        assert E == adj.num_arcs
        got = Adjacency(np.asarray(offsets).astype(np.uint64),
                        np.asarray(succs[:E]).astype(np.uint32))
        assert got.to_lists() == lists


def test_device_reconstruct_structured():
    """Intervals + copy chains + residuals through the device parser."""
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    lists = []
    for i in range(200):
        base = list(range(10, 10 + (i % 13)))           # interval-friendly
        extra = [((i * 37 + k * 11) % 200) for k in range(i % 5)]
        lists.append(sorted(set(base + extra)))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    offsets, succs, E = dec.decode_to_csr_device(num_lanes=8)
    got = Adjacency(np.asarray(offsets).astype(np.uint64),
                    np.asarray(succs[:E]).astype(np.uint32))
    assert got.to_lists() == lists


def test_device_reconstruct_deep_chains():
    """Chains past the 64-bucket depth histogram trigger the while-loop
    deep-resolution path (hc-style; cnr-2000 hc reaches depth 4506)."""
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    lists = [sorted({1, 3, 5, 7, 9} | {i % 11}) for i in range(160)]
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 150, 2)   # chains up to 150 deep
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    offsets, succs, E = dec.decode_to_csr_device(num_lanes=4)
    got = Adjacency(np.asarray(offsets).astype(np.uint64),
                    np.asarray(succs[:E]).astype(np.uint32))
    assert got.to_lists() == lists

"""TPU batch random access vs the native recursive random-access decoder."""

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.random_tpu import TpuRandomAccess


def _check(adj, queries, window=7, max_ref=3, min_interval=2):
    res = compress_adjacency(adj, window, max_ref, min_interval)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    ra = TpuRandomAccess(TpuGraphDecoder(g))
    got = ra.successors_batch(queries)
    want = g.successors_batch(np.asarray(queries, np.uint64))
    assert got.to_lists() == want.to_lists()


def test_random_access_dummy(dummy_graph):
    _check(dummy_graph, [4, 0, 2, 0, 5])


def test_random_access_structured():
    n = 64
    lists = []
    for i in range(n):
        if i % 4 in (0, 1):
            lists.append(list(range(0, 32)))
        elif i % 4 == 2:
            lists.append([j for j in range(0, 32) if j % 3 != 0])
        else:
            lists.append([1, 5, 50, 63])
    _check(Adjacency.from_lists(lists), [63, 3, 17, 17, 0, 62],
           min_interval=4)


def test_random_access_random_graph():
    rng = np.random.default_rng(9)
    lists = []
    for i in range(500):
        dd = int(rng.integers(0, 16))
        lists.append(sorted(rng.choice(500, size=dd, replace=False).tolist()))
    queries = rng.integers(0, 500, size=200)
    _check(Adjacency.from_lists(lists), queries)


@pytest.mark.slow
def test_random_access_cnr2000(cnr2000):
    adj, _ = cnr2000
    res = compress_adjacency(adj, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    ra = TpuRandomAccess(TpuGraphDecoder(g))
    rng = np.random.default_rng(0)
    queries = rng.integers(0, adj.num_nodes, size=5000)
    got = ra.successors_batch(queries)
    want = g.successors_batch(queries.astype(np.uint64))
    assert got.to_lists() == want.to_lists()


def test_csr_server_random_graph():
    from webgraph_ans_tpu.ops.random_tpu import TpuCsrServer

    rng = np.random.default_rng(11)
    lists = []
    for i in range(400):
        dd = int(rng.integers(0, 12))
        lists.append(sorted(rng.choice(400, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    srv = TpuCsrServer(TpuGraphDecoder(g), num_lanes=16)
    queries = rng.integers(0, 400, size=1000)
    got = srv.successors_batch(queries)
    want = g.successors_batch(queries.astype(np.uint64))
    assert got.to_lists() == want.to_lists()


def test_csr_server_empty_rows_and_repeats(dummy_graph):
    from webgraph_ans_tpu.ops.random_tpu import TpuCsrServer

    res = compress_adjacency(dummy_graph, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    srv = TpuCsrServer(TpuGraphDecoder(g), num_lanes=4)
    queries = [5, 5, 0, 3, 3, 3, 1]
    got = srv.successors_batch(queries)
    want = g.successors_batch(np.asarray(queries, np.uint64))
    assert got.to_lists() == want.to_lists()


def test_random_access_phase_sampled():
    """On phase-sampled artifacts the wave decoder enters at the
    preceding sampled entry and decodes the whole entry segment (VERDICT
    r02: sampling and TPU random access used to be mutually exclusive)."""
    import dataclasses

    rng = np.random.default_rng(17)
    lists = [sorted(rng.choice(400, size=int(rng.integers(0, 12)),
                               replace=False).tolist()) for _ in range(400)]
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2)
    k = 8
    n = adj.num_nodes
    keep = (n - 1 - np.arange(0, n, k))[::-1]
    prelude = dataclasses.replace(res.prelude, phase_step=k)
    g = ANSBvGraph(prelude, np.ascontiguousarray(res.states[keep]),
                   np.ascontiguousarray(res.pointers[keep]))
    ra = TpuRandomAccess(TpuGraphDecoder(g))
    queries = [0, 7, 8, 9, 133, 399, 250, 250, 31]
    got = ra.successors_batch(queries)
    assert got.to_lists() == [lists[q] for q in queries]

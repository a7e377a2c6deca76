"""Multi-host shard decoding (run single-process; node ranges + closure
logic are what multi-host execution exercises per shard)."""

import numpy as np

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.parallel.multihost import MultihostGraphDecoder


def test_shard_decode_matches_full():
    rng = np.random.default_rng(77)
    lists = []
    for i in range(500):
        dd = int(rng.integers(0, 14))
        lists.append(sorted(rng.choice(500, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)

    # single process: the "shard" is the whole graph
    mh = MultihostGraphDecoder(g, lanes_per_host=16)
    lo, hi, offsets, succs = mh.decode_shard()
    assert (lo, hi) == (0, 500)
    assert Adjacency(offsets, succs).to_lists() == lists
    assert mh.total_arcs() == adj.num_arcs

    # force a mid-graph shard to exercise the closure path
    mh.node_lo, mh.node_hi = 200, 400
    lo, hi, offsets, succs = mh.decode_shard()
    got = Adjacency(offsets, succs).to_lists()
    assert got == lists[200:400]


def test_shard_decode_block_encoded_file():
    """ADVICE r01 (high): decode lanes must not cross encode-block
    boundaries of block-parallel (prelude v2) files."""
    rng = np.random.default_rng(99)
    lists = []
    for i in range(300):
        dd = int(rng.integers(0, 10))
        lists.append(sorted(rng.choice(300, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=8)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)

    mh = MultihostGraphDecoder(g, lanes_per_host=3)
    lo, hi, offsets, succs = mh.decode_shard()
    assert Adjacency(offsets, succs).to_lists() == lists

    mh.node_lo, mh.node_hi = 100, 250
    lo, hi, offsets, succs = mh.decode_shard()
    assert Adjacency(offsets, succs).to_lists() == lists[100:250]


def test_shard_closure_deep_chain():
    """hc-style artifact (window 16, unbounded max_ref, NO safe breaks):
    consecutive near-identical lists make every node copy from its
    predecessor, so a shard at node 500 has a reference chain reaching
    toward node 0. The batched closure must resolve it in O(log depth)
    ranged decodes, not one host round trip per chain level."""
    rng = np.random.default_rng(5)
    base = sorted(rng.choice(5000, size=24, replace=False).tolist())
    lists = []
    for i in range(600):
        l = sorted(set(base) | {5000 + i})
        lists.append(l)
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 16, 2_000_000_000, 4)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)

    mh = MultihostGraphDecoder(g, lanes_per_host=8)
    mh.node_lo, mh.node_hi = 500, 600
    calls = []
    orig = mh._decode_range_tokens
    mh._decode_range_tokens = lambda lo, hi: (calls.append((lo, hi)),
                                              orig(lo, hi))[1]
    lo, hi, offsets, succs = mh.decode_shard()
    assert Adjacency(offsets, succs).to_lists() == lists[500:600]
    closure_calls = [c for c in calls if c[1] == 500]
    # chain depth is O(500); geometric extension must close it fast
    assert 1 <= len(closure_calls) <= 12, closure_calls

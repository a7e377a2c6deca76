"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency, dump_tokens
from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct
from webgraph_ans_tpu.parallel.sharded import (
    ShardedGraphDecoder, make_mesh, sharded_histogram)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_sharded_histogram():
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    sym = rng.integers(0, 50, size=8 * 1000).astype(np.int32)
    comp = rng.integers(0, 9, size=8 * 1000).astype(np.int32)
    hist = np.asarray(sharded_histogram(mesh, jnp.asarray(sym), jnp.asarray(comp), 64))
    want = np.zeros((9, 64), np.int64)
    np.add.at(want, (comp, sym), 1)
    np.testing.assert_array_equal(hist, want)


def test_sharded_decode_matches_serial():
    rng = np.random.default_rng(31)
    lists = []
    for i in range(400):
        dcur = int(rng.integers(0, 14))
        lists.append(sorted(rng.choice(400, size=dcur, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2)
    want_v, want_c = dump_tokens(adj, 7, 3, 2, res.est_tables)

    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = ShardedGraphDecoder(g, make_mesh())
    got_v, got_c = dec.decode_tokens(lanes_per_device=4)
    np.testing.assert_array_equal(got_c.astype(np.uint8), want_c)
    np.testing.assert_array_equal(got_v.astype(np.uint64), want_v)

    offsets, succs = reconstruct(got_v, got_c, adj.num_nodes, 2)
    assert Adjacency(offsets, succs).to_lists() == lists


def test_sharded_decode_block_encoded_file():
    """ADVICE r01 (medium): after encode-block starts are unioned into the
    lane bounds, the lane count must stay divisible by the mesh (padded
    with empty lanes)."""
    rng = np.random.default_rng(13)
    lists = []
    for i in range(300):
        dcur = int(rng.integers(0, 10))
        lists.append(sorted(rng.choice(300, size=dcur, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=8)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = ShardedGraphDecoder(g, make_mesh(4))
    got_v, got_c = dec.decode_tokens(lanes_per_device=4)
    offsets, succs = reconstruct(got_v, got_c, adj.num_nodes, 2)
    assert Adjacency(offsets, succs).to_lists() == lists


def test_sharded_emit_adjacency_bit_exact(monkeypatch):
    """Merged-emit kernel chunks sharded over the 8-device mesh
    (interpret-mode Pallas inside shard_map): the gathered channels must
    post-process to the exact adjacency (VERDICT r04 item 4)."""
    monkeypatch.setenv("WGT_PALLAS", "interpret")
    from webgraph_ans_tpu.bvgraph.synth import synth_web_graph
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.parallel.sharded import sharded_emit_adjacency

    adj = synth_web_graph(700, seed=13)
    res = compress_adjacency(adj)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    mesh = make_mesh()
    s2d, st, dg = sharded_emit_adjacency(mesh, dec, num_lanes=16,
                                         interpret=True)
    F = np.asarray(s2d).reshape(-1)
    stn = np.asarray(st).astype(np.int64)
    d = np.asarray(dg).astype(np.int64)
    G = np.asarray(s2d).shape[1]
    offs = adj.offsets.astype(np.int64)
    assert np.array_equal(d, np.diff(offs))
    for x in range(adj.num_nodes):
        got = F[stn[x] + np.arange(d[x]) * G].astype(np.uint32)
        np.testing.assert_array_equal(got, adj.succs[offs[x]:offs[x + 1]],
                                      err_msg=f"node {x}")

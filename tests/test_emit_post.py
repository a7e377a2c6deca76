"""Post-pass of the merged-emit pipeline (ops/emit_post.py) against
simulator-generated contract channels on a small synthetic graph."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from webgraph_ans_tpu.bvgraph.synth import synth_web_graph
from webgraph_ans_tpu.ops import emit_post


@pytest.fixture(scope="module")
def small_channels():
    from proto_merged_emit import emit_channels

    adj = synth_web_graph(3000, seed=3)
    ch = emit_channels(adj, L=8, T=256)
    return adj, ch


def test_postprocess_bit_exact(small_channels):
    adj, (val, xch, nib, lane_of, bounds, dirty) = small_channels
    n = adj.num_nodes
    assert len(dirty) > 0, "fixture should exercise the dirty path"
    import jax.numpy as jnp

    succs2d, starts, degs, tabs = emit_post.postprocess(
        jnp.asarray(val), jnp.asarray(xch), jnp.asarray(nib),
        lane_of, bounds, n)
    assert bool(tabs["ok"])
    lists = emit_post.to_host_lists(succs2d, starts, degs, n)
    offs = adj.offsets.astype(np.int64)
    for x in range(n):
        want = adj.succs[offs[x]:offs[x + 1]]
        np.testing.assert_array_equal(
            np.asarray(lists[x], np.uint32), want, err_msg=f"node {x}")


def test_dense_csr(small_channels):
    adj, (val, xch, nib, lane_of, bounds, dirty) = small_channels
    n = adj.num_nodes
    import jax.numpy as jnp

    succs2d, starts, degs, tabs = emit_post.postprocess(
        jnp.asarray(val), jnp.asarray(xch), jnp.asarray(nib),
        lane_of, bounds, n)
    E = int(adj.num_arcs)
    from webgraph_ans_tpu.ops.reconstruct_device import _quant
    offsets, succs = emit_post.to_dense_csr(succs2d, starts, degs,
                                            _quant(E))
    np.testing.assert_array_equal(np.asarray(succs)[:E].astype(np.uint32),
                                  adj.succs)
    np.testing.assert_array_equal(
        np.asarray(offsets)[:n + 1].astype(np.int64),
        adj.offsets.astype(np.int64))


def test_postprocess_with_empty_nodes():
    """Zero-degree nodes emit C_EMPTY marker rows; degs must read 0."""
    import jax.numpy as jnp
    from webgraph_ans_tpu.bvgraph.graph import Adjacency
    from proto_merged_emit import emit_channels

    base = synth_web_graph(800, seed=9)
    offs = base.offsets.astype(np.int64)
    # knock out every 7th node's list
    keep = np.ones(len(base.succs), bool)
    n = base.num_nodes
    new_offs = [0]
    for x in range(n):
        a, b = offs[x], offs[x + 1]
        if x % 7 == 3:
            keep[a:b] = False
            new_offs.append(new_offs[-1])
        else:
            new_offs.append(new_offs[-1] + (b - a))
    adj = Adjacency(np.array(new_offs, np.uint64), base.succs[keep])
    val, xch, nib, lane_of, bounds, dirty = emit_channels(adj, L=4, T=256)
    succs2d, starts, degs, tabs = emit_post.postprocess(
        jnp.asarray(val), jnp.asarray(xch), jnp.asarray(nib),
        lane_of, bounds, n)
    assert bool(tabs["ok"])
    d = np.asarray(degs)
    offs2 = adj.offsets.astype(np.int64)
    np.testing.assert_array_equal(d, np.diff(offs2))
    lists = emit_post.to_host_lists(succs2d, starts, degs, n)
    for x in range(n):
        np.testing.assert_array_equal(
            np.asarray(lists[x], np.uint32),
            adj.succs[offs2[x]:offs2[x + 1]], err_msg=f"node {x}")


def test_adjacency_fallback_on_cpu(tmp_path):
    """decode_to_adjacency_device falls back to the sort path where the
    merged-emit kernel is unavailable (CPU backend)."""
    import jax
    import jax.numpy as jnp  # noqa: F401
    from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.store import compress_adjacency
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    adj = synth_web_graph(600, seed=11)
    base = str(tmp_path / "g")
    res = compress_adjacency(adj)
    res.prelude.save(base)
    save_states(base, res.states)
    save_pointers(base, res.pointers)
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=32)
    F = np.asarray(s2d).reshape(-1)
    stn = np.asarray(st).astype(np.int64)
    d = np.asarray(dg).astype(np.int64)
    G = np.asarray(s2d).shape[1]
    offs = adj.offsets.astype(np.int64)
    assert np.array_equal(d, np.diff(offs))
    for x in range(adj.num_nodes):
        got = F[stn[x] + np.arange(d[x]) * G].astype(np.uint32)
        np.testing.assert_array_equal(got, adj.succs[offs[x]:offs[x + 1]])

"""Merged-emit on-demand random access (ops/random_tpu.TpuEmitRandomAccess)
in Pallas interpret mode on a small synthetic artifact."""

import os

import numpy as np
import pytest

from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.bvgraph.synth import synth_web_graph


@pytest.fixture(scope="module")
def small_artifact(tmp_path_factory):
    adj = synth_web_graph(400, seed=5)
    base = str(tmp_path_factory.mktemp("emitra") / "g")
    res = compress_adjacency(adj)
    res.prelude.save(base)
    save_states(base, res.states)
    save_pointers(base, res.pointers)
    return adj, base


def test_emit_random_access_interpret(small_artifact, monkeypatch):
    monkeypatch.setenv("WGT_PALLAS", "interpret")
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.random_tpu import TpuEmitRandomAccess

    adj, base = small_artifact
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    ra = TpuEmitRandomAccess(dec)
    rng = np.random.default_rng(3)
    qs = np.concatenate([rng.integers(0, adj.num_nodes, 12),
                         [0, adj.num_nodes - 1, 7, 7]])  # dup + edges
    got = ra.successors_batch(qs)
    offs = adj.offsets.astype(np.int64)
    for i, x in enumerate(qs):
        np.testing.assert_array_equal(
            got.successors(i), adj.succs[offs[x]:offs[x + 1]],
            err_msg=f"query {x}")

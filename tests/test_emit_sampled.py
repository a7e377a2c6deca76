"""Merged-emit pipeline on a PHASE-SAMPLED artifact (interpret mode):
lane bounds must snap to valid entries and the pipeline stays bit-exact
(dirty fixup covers the cross-entry references)."""

import numpy as np
import pytest

from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.bvgraph.synth import synth_web_graph


def test_emit_on_sampled_artifact(tmp_path, monkeypatch):
    monkeypatch.setenv("WGT_PALLAS", "interpret")
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    adj = synth_web_graph(500, seed=7)
    base = str(tmp_path / "g")
    res = compress_adjacency(adj)
    n = adj.num_nodes
    step = 4
    keep = (n - 1 - np.arange(0, n, step))[::-1]
    res.prelude.phase_step = step
    res.prelude.save(base)
    save_states(base, np.ascontiguousarray(res.states[keep]))
    save_pointers(base, np.ascontiguousarray(res.pointers[keep]))
    g = ANSBvGraph.load(base)
    assert g.prelude.phase_step == step
    dec = TpuGraphDecoder(g)
    s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=8)
    s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=8)  # rebal
    F = np.asarray(s2d).reshape(-1)
    stn = np.asarray(st).astype(np.int64)
    d = np.asarray(dg).astype(np.int64)
    G = np.asarray(s2d).shape[1]
    offs = adj.offsets.astype(np.int64)
    assert np.array_equal(d, np.diff(offs))
    for x in range(n):
        got = F[stn[x] + np.arange(d[x]) * G].astype(np.uint32)
        np.testing.assert_array_equal(got, adj.succs[offs[x]:offs[x + 1]],
                                      err_msg=f"node {x}")

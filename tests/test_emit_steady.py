"""Steady-state merged-emit path: after warmup + rebalance, the decoder
must (a) actually take the fused fast path (no silent emit_broken
degradation to the sort path — VERDICT r04 weak #3) and (b) stay
bit-exact through the single-dispatch fused program."""

import numpy as np

from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.bvgraph.synth import synth_web_graph


def _check(adj, s2d, st, dg):
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


def test_emit_steady_state_fast_path(tmp_path, monkeypatch):
    monkeypatch.setenv("WGT_PALLAS", "interpret")
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    adj = synth_web_graph(900, seed=21)
    base = str(tmp_path / "g")
    res = compress_adjacency(adj)
    res.prelude.save(base)
    save_states(base, res.states)
    save_pointers(base, res.pointers)
    dec = TpuGraphDecoder(ANSBvGraph.load(base))

    # warmup (first call), rebalance passes, then the steady state
    for _ in range(3):
        s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=8)
    pl0 = dec._plans[("emit", 8)]
    assert not pl0.get("emit_broken"), \
        "emit path silently degraded to the sort fallback"
    assert pl0.get("verified"), "plan never reached the verified state"
    assert "mrow_d" in (pl0.get("post_meta") or {}), \
        "post meta not cached for the fused steady state"
    # this call must go through _emit_e2e_fused (single dispatch)
    s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=8)
    _check(adj, s2d, st, dg)

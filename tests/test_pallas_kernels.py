"""Pallas kernels vs their XLA twins, in interpret mode on CPU.

The Mosaic kernels only run on real TPU hardware, but `interpret=True`
executes the same kernel program under the Pallas interpreter, so the
FSM/rANS logic (not the Mosaic lowering) is covered by CI. Both kernels
must be output-identical to the XLA reference kernels on the same
artifacts. Small graphs: the interpreter is slow.
"""

import os

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency, dump_tokens
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder


def _rand_adj(n=120, seed=5, dmax=9):
    rng = np.random.default_rng(seed)
    lists = [sorted(rng.choice(n, size=int(rng.integers(0, dmax)),
                               replace=False).tolist()) for _ in range(n)]
    return Adjacency.from_lists(lists)


@pytest.fixture()
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("WGT_PALLAS", "interpret")


def test_encode_kernel_interpret_matches_xla(pallas_interpret, monkeypatch):
    from webgraph_ans_tpu.ops.encode_jax import encode_plan, lane_encode_tokens

    adj = _rand_adj()
    res = compress_adjacency(adj, 7, 3, 2)
    vals, comps = dump_tokens(adj, 7, 3, 2, res.est_tables)

    out_p = lane_encode_tokens(res.prelude.model, vals, comps, num_blocks=8)
    monkeypatch.setenv("WGT_PALLAS", "0")
    out_x = lane_encode_tokens(res.prelude.model, vals, comps, num_blocks=8)

    np.testing.assert_array_equal(out_p[0], out_x[0])   # stream
    np.testing.assert_array_equal(out_p[1], out_x[1])   # states
    np.testing.assert_array_equal(out_p[2], out_x[2])   # pointers
    assert out_p[3] == out_x[3]                         # final state
    for a, b in zip(out_p[4], out_x[4]):                # block table
        np.testing.assert_array_equal(a, b)


def test_decode_kernel_interpret_matches_xla(pallas_interpret, monkeypatch):
    adj = _rand_adj(n=150, seed=11)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=4)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)

    dec = TpuGraphDecoder(g)
    assert dec._use_pallas(8)
    vals_p, comps_p = dec.decode_tokens(num_lanes=8)

    monkeypatch.setenv("WGT_PALLAS", "0")
    dec2 = TpuGraphDecoder(g)
    vals_x, comps_x = dec2.decode_tokens(num_lanes=8)

    np.testing.assert_array_equal(vals_p, vals_x)
    np.testing.assert_array_equal(comps_p, comps_x)


def test_encode_kernel_fold_shift_wrap(pallas_interpret, monkeypatch,
                                       cnr2000):
    """Regression: cnr-2000's model has components where the fold
    threshold exponent fid + k*radix - 1 exceeds 31 for k <= max_folds
    (e.g. radix 6, fid 1, mf 7 -> exponent 42). A raw `1 << e` wraps mod
    32 on the TPU VPU, overcounting folds and corrupting every stream
    (caught on hardware; the interpreter wraps the same way through
    XLA's shl). Encode a slice of the real cnr token stream under the
    real cnr model through both kernels."""
    from webgraph_ans_tpu.ans.model import build_model
    from webgraph_ans_tpu.bvgraph.store import compress_adjacency, dump_tokens
    from webgraph_ans_tpu.ops.encode_jax import lane_encode_tokens

    adj, _ = cnr2000
    res = compress_adjacency(adj, 7, 3, 2)
    params_probe = __import__(
        "webgraph_ans_tpu.ops.encode_jax", fromlist=["build_encoder_tables"]
    ).build_encoder_tables(res.prelude.model)[1]
    mf = params_probe[9]
    assert any(p[3] + mf * p[2] - 1 >= 32 for p in params_probe[:9]
               if isinstance(p, tuple)), \
        "model no longer triggers the wrap; pick another fixture"

    vals, comps = dump_tokens(adj, 7, 3, 2, res.est_tables)
    # slice to a node boundary so block splitting stays valid
    K = int(np.nonzero(comps[:30000] == 0)[0][-1])
    out_p = lane_encode_tokens(res.prelude.model, vals[:K], comps[:K],
                               num_blocks=8)
    monkeypatch.setenv("WGT_PALLAS", "0")
    out_x = lane_encode_tokens(res.prelude.model, vals[:K], comps[:K],
                               num_blocks=8)
    np.testing.assert_array_equal(out_p[0], out_x[0])
    np.testing.assert_array_equal(out_p[1], out_x[1])
    np.testing.assert_array_equal(out_p[2], out_x[2])

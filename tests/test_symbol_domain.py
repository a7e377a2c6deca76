"""Raw-symbol domain bounds of the TPU paths.

The reference supports MAX_RAW_SYMBOL = 2^48 - 1 with u64 symbols
(reference: src/lib.rs:18, src/ans/encoder.rs:39); the serial native
codec here matches that. The TPU kernels keep token values in u32 lanes
with 31-bit symbol prefixes, which covers every graph with < 2^31 nodes
(all of BASELINE.md) — and BOTH boundaries must fail loudly, not
corrupt: the device encoder rejects out-of-domain values at plan time,
and the decode-table builder rejects models whose prefixes exceed 31
bits (VERDICT r02 missing #3)."""

import numpy as np
import pytest

from webgraph_ans_tpu.ans.codec import decode_raw, encode_raw
from webgraph_ans_tpu.ans.model import build_model

RESIDUAL = 8


def _model_for(values):
    hists = [(np.array([], np.uint64), np.array([], np.uint64))
             for _ in range(9)]
    vals, counts = np.unique(np.asarray(values, np.uint64),
                             return_counts=True)
    hists[RESIDUAL] = (vals, counts.astype(np.uint64))
    return build_model(hists, max_frame_log2=12)


def test_native_codec_u64_above_31_bits():
    """The serial native codec round-trips symbols past 2^31 (u64
    domain, like the reference's MAX_RAW_SYMBOL = 2^48 - 1)."""
    vals = np.array([1, (1 << 33) + 5, (1 << 40) - 3, 7], np.uint64)
    model = _model_for(vals)
    comps = np.full(len(vals), RESIDUAL, np.uint8)
    enc = encode_raw(model, vals, comps)
    got = decode_raw(model, enc.stream, enc.final_state, comps[::-1])
    np.testing.assert_array_equal(got[::-1], vals)


def test_tpu_encoder_rejects_out_of_domain():
    from webgraph_ans_tpu.ops.encode_jax import lane_encode_tokens

    vals = np.array([1, 2, 1 << 33], np.uint64)
    model = _model_for(vals)
    comps = np.full(len(vals), RESIDUAL, np.uint8)
    with pytest.raises(ValueError, match="uint31"):
        lane_encode_tokens(model, vals, comps, num_blocks=1)


def test_tpu_decoder_tables_reject_wide_prefix():
    from webgraph_ans_tpu.ops.decode_jax import build_decoder_tables_np

    model = _model_for([1, 2, 1 << 33])
    with pytest.raises(ValueError, match="31 bits"):
        build_decoder_tables_np(model, np.zeros(4, np.uint16))


def test_tpu_paths_accept_31_bit_boundary():
    """Values just under 2^31 (the largest int2nat(succ - node) a
    < 2^31-node graph can produce) pass both TPU table builders."""
    from webgraph_ans_tpu.ops.decode_jax import build_decoder_tables_np
    from webgraph_ans_tpu.ops.encode_jax import build_encoder_tables

    model = _model_for([1, 2, (1 << 31) - 1])
    build_encoder_tables(model)         # must not raise
    build_decoder_tables_np(model, np.zeros(4, np.uint16))

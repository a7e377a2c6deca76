"""TPU (JAX) lane-parallel decoder vs the native serial decoder.

The TPU path must produce exactly the token stream BvComp emitted (ground
truth: native wgt_bvcomp_tokens), for the dummy executable-spec graph,
structured graphs, and cnr-2000.
"""

import numpy as np
import pytest

from webgraph_ans_tpu.ans.codec import encode_raw, model_from_sequences
from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.bvgraph.store import compress_adjacency, dump_tokens
from webgraph_ans_tpu.ops.decode_jax import build_decoder_tables, decode_token_plan
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct

from conftest import zipf_symbols


def _tokens_ground_truth(adj, res, window=7, max_ref=3, min_interval=2):
    return dump_tokens(adj, window, max_ref, min_interval, res.est_tables)


def _assert_tpu_tokens_match(adj, window=7, max_ref=3, min_interval=2,
                             num_lanes=4):
    res = compress_adjacency(adj, window, max_ref, min_interval)
    want_v, want_c = _tokens_ground_truth(adj, res, window, max_ref, min_interval)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    got_v, got_c = dec.decode_tokens(num_lanes=num_lanes)
    np.testing.assert_array_equal(got_c.astype(np.uint8), want_c)
    np.testing.assert_array_equal(got_v.astype(np.uint64), want_v)


def test_raw_codec_plan_matches_native():
    """decode_token_plan reproduces the native LIFO decode of a random
    multi-component sequence (tier-2 codec round trip on the TPU path)."""
    rng = np.random.default_rng(7)
    n = 4096
    comps = rng.integers(0, 9, size=n).astype(np.uint8)
    vals = zipf_symbols(n, 1.3, seed=3, max_val=1 << 28)
    model = model_from_sequences({c: vals[comps == c] for c in range(9)})
    enc = encode_raw(model, vals, comps)

    tables, params = build_decoder_tables(model, enc.stream)
    import jax.numpy as jnp
    # Single lane decodes the whole sequence in LIFO order.
    state = jnp.asarray(np.array([enc.final_state], np.uint32))
    ptr = jnp.asarray(np.array([len(enc.stream)], np.int32))
    plan = jnp.asarray(comps[::-1].astype(np.int32)[None, :])
    got, _, _ = decode_token_plan(params, tables, state, ptr, plan, n)
    np.testing.assert_array_equal(
        np.asarray(got)[0], vals[::-1].astype(np.uint32))


def test_tpu_tokens_dummy_graph(dummy_graph):
    _assert_tpu_tokens_match(dummy_graph, num_lanes=2)


def test_tpu_tokens_structured():
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
    _assert_tpu_tokens_match(Adjacency.from_lists(lists), min_interval=4,
                             num_lanes=8)


def test_tpu_tokens_window_zero():
    lists = [[1, 2], [0, 2], [0, 1], [3]]
    _assert_tpu_tokens_match(Adjacency.from_lists(lists), window=0, max_ref=0,
                             num_lanes=2)


def test_tpu_tokens_random_graph():
    rng = np.random.default_rng(11)
    lists = []
    for i in range(200):
        d = int(rng.integers(0, 12))
        lists.append(sorted(rng.choice(200, size=d, replace=False).tolist()))
    _assert_tpu_tokens_match(Adjacency.from_lists(lists), num_lanes=16)


@pytest.mark.slow
def test_tpu_tokens_cnr2000(cnr2000):
    adj, _ = cnr2000
    _assert_tpu_tokens_match(adj, num_lanes=256)


def test_decode_window0_block_encoded_file():
    """ADVICE r01 (medium): window=0 ring must size from the post-union
    lane count, not the requested one."""
    rng = np.random.default_rng(21)
    lists = []
    for i in range(300):
        dd = int(rng.integers(0, 10))
        lists.append(sorted(rng.choice(300, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 0, 0, 2, encode_blocks=8)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)
    dec = TpuGraphDecoder(g)
    vals, comps = dec.decode_tokens(num_lanes=16)
    offsets, succs = reconstruct(vals, comps, adj.num_nodes, 2)
    assert Adjacency(offsets, succs).to_lists() == lists


def test_lane_bases_64bit_arithmetic():
    """64-bit stream addressing (VERDICT r01 item 4): _lane_bases must
    split u64 phase pointers into per-lane (row base, relative i32
    pointer) with base*WORDS_PER_ROW + rel == ptr, rel >= 0, even when
    pointers exceed 2^31 words (the int32 wrap the old path had).
    Reference analog: the usize decoder pointer, src/ans/decoder.rs:41-53."""
    from webgraph_ans_tpu.ops.decode_jax import ROW_SHIFT

    rng = np.random.default_rng(3)
    # fabricate a descending-pointer phase table far above 2^31
    n = 1000
    base_word = (1 << 33) + 12345
    ptrs = base_word + np.sort(rng.integers(0, 1 << 20, n))[::-1].astype(np.int64)
    ptrs = ptrs.astype(np.uint64)

    dec = TpuGraphDecoder.__new__(TpuGraphDecoder)
    dec.num_nodes = n
    dec.phase_step = 1
    dec.pointers = np.asarray(ptrs, dtype=np.int64)

    # sub-range decode (a multihost shard): the tail lane ends below n —
    # a FULL-graph tail lane must consume down to word 0 and correctly
    # raises "use more lanes" when that span exceeds 2^31 words
    starts = np.array([0, 250, 500, 750, 1000], np.int64)
    ends = np.array([250, 500, 750, 999, 1000], np.int64)  # last lane empty
    base, rel = dec._lane_bases(starts, ends)
    assert base.dtype == np.int32 and rel.dtype == np.int32
    for l in range(4):
        abs_ptr = (int(base[l]) << ROW_SHIFT) + int(rel[l])
        assert abs_ptr == int(ptrs[starts[l]])
        assert int(rel[l]) >= 0
        # every pointer the lane touches stays addressable in i32
        lane_ptrs = ptrs[starts[l]:ends[l]].astype(np.int64)
        rels = lane_ptrs - (int(base[l]) << ROW_SHIFT)
        assert rels.min() >= 0 and rels.max() < 1 << 31
    assert base[4] == 0 and rel[4] == 0  # empty padding lane

"""TPU-native ANS decode: lane-parallel rANS token decoding (JAX/XLA).

The reference decodes a graph with ONE serial u32 decoder state walking the
u16 stream backwards (reference: src/ans/decoder.rs:58-100). That LIFO chain
is the serialization bottleneck. But the format already snapshots a phase —
(state, stream pointer) — at every node boundary (reference:
src/ans/mod.rs:56-68, bvgraph_encoder.rs:159-174), which makes EVERY node an
independent decode entry point. This module exploits that: node ranges become
parallel decode *lanes*; each lane runs the rANS hot loop (LUT gather, state
update, 16-bit refill, quasi-unfold) as vectorized u32 arithmetic across the
lane dimension, and the BvGraph component grammar (decode order executable
spec: native/src/bvgraph.hpp read_successors) runs as a per-lane finite-state
machine in lockstep.

TPU-first layout rules (measured on v5e; per-token gathers and loop
carries are the scarce resources):
- the only per-token gathers hit the small flat LUT buffer (three regions:
  freq|cumul, symbol prefix, fold count). Kept under the chip's staging
  budget (the model builder caps frame sizes), XLA stages it into VMEM
  once and the gathers run at VPU speed;
- the u16 stream is NEVER element-gathered: words are packed two-per-u32
  into 16-pair rows, and each token fetches the 2 (or 3, for high-fold
  models) rows straddling its pointer with fast per-lane ROW gathers;
  renormalization refills then select the word from those register-resident
  pairs (select_n chains, pure VPU);
- ALL per-lane FSM registers (including the sliding outdegree ring and the
  packed component-nibble accumulator) live in ONE [rows, L] i32 array:
  with more than one small vector carry, XLA re-stages gather operands
  every iteration; with one packed carry the staging hoists;
- the quasi-unfold loop is statically unrolled to the MODEL's maximum fold
  count (params[10]) — no nested while, no data-dependent trip sync;
- per-component codec parameters are STATIC Python constants baked in as
  9-way select chains — no parameter-table gathers;
- the loop body decodes ONE token (no unrolling): TPU instruction memory
  is limited, and an oversized loop body de-optimizes every op in it;
- token output is step-major: row s of the fused output buffer holds the
  values of lockstep step s, and component ids are packed 8-per-u32 in the
  rows after `cap`.

Everything is jit-compatible (static shapes, lax control flow) and runs
unchanged under shard_map over a device mesh (webgraph_ans_tpu.parallel).

Numeric domain: token values must fit in uint31, which holds for graphs
with < 2^31 nodes (covers every LAW graph in BASELINE.md); the table
builder checks this.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ans.model import ANSModel

# rANS constants (reference: src/ans/mod.rs:18-24).
B = 16
LOWER_BOUND = np.uint32(1 << 16)

# Component ids double as FSM phase ids (reference: src/bvgraph/mod.rs:13-23).
P_OUT, P_REF, P_BC, P_BLK, P_IC, P_IS, P_IL, P_FR, P_RES = range(9)
P_DONE = 9
# aux mode only: one summary pseudo-step per node (nibble 0x9) after its
# last token, carrying (ncop, niv, tail_len) for the device reconstructor.
P_SUM = 10
NIB_SUM = 9

# Component nibbles are packed 8 per u32 output word.
UNROLL = 8

# Stream layout: words packed 2-per-u32, 16 pairs (32 words) per row.
# Wide rows amortize the per-row DMA cost: the hot decoder holds
# `_rows_back` rows register-resident and refetches only every
# `_chunk_steps` tokens (worst-case word consumption bounds the interval).
PAIRS_PER_ROW = 16
WORDS_PER_ROW = 32
ROW_SHIFT = WORDS_PER_ROW.bit_length() - 1  # word index -> row index

# Packed register file rows. The outdegree ring occupies rows
# NREG..NREG+window.
R_STATE, R_PTR, R_X, R_PHASE, R_D, R_BC, R_BREM, R_BIDX, R_BSUM, R_CPY, \
    R_COPIED, R_REFD, R_EXTRA, R_IVREM, R_RESREM, R_OUTN, R_CPK = range(17)
NREG = 17


def row_gather(table, rows):
    """table[rows] for a 2D table, formulated as a FLAT element gather.

    A plain `table[rows]` emits an embedding-style row-lookup gather
    (slice_sizes [1, W]); on the axon TPU relay, executing any such
    program permanently drops the process into a synchronized dispatch
    mode (~29 ms per launch, measured tools/probe-series 2026-08-17) —
    likely the SparseCore offload path. The flat element-gather form
    lowers to the TensorCore path and keeps async dispatch."""
    w = table.shape[1]
    flat = table.reshape(-1)
    cols = jnp.arange(w, dtype=jnp.int32)
    return flat[rows[..., None] * w + cols]


class DecoderTables(NamedTuple):
    """Decode LUT (reference layout:
    src/ans/models/model4decoder.rs:18-68, re-packed TPU-first into 8-byte
    rows — gather cost scales with bytes fetched) and the row-packed
    stream: lut row = [freq | cumul<<16, folded symbol | folds<<16]; the
    31-bit symbol prefix is recomputed on the VPU
    (prefix = (sym - folding_offset*folds) << (folds*radix)).
    stream_rows[r, p] packs words WORDS_PER_ROW*r+2p (low half) and +1
    (high half)."""

    lut: jax.Array          # uint32 [slots, 2]: fc, sym|folds<<16
    stream_rows: jax.Array  # uint32 [ceil(stream_len/32), 16]


# Static codec parameters: 9 x (offset, log_m, mask, radix, fold_off),
# then [9] the slot count (region stride) and [10] the model's maximum
# fold count.
CodecParams = tuple


def build_decoder_tables(model: ANSModel, stream) -> tuple[DecoderTables, CodecParams]:
    """Expands the encoder model + u16 stream into the flat decode buffer
    (host-side) and the static parameter tuple."""
    lut, stream_rows, params = build_decoder_tables_np(model, stream)
    return (DecoderTables(lut=jnp.asarray(lut),
                          stream_rows=jnp.asarray(stream_rows)),
            tuple(params))


def build_decoder_tables_np(model: ANSModel, stream):
    """Host-side table build: returns (lut u32 [slots, 2],
    stream_rows u32 [rows, 16], params list). Callers that also need
    device copies keep BOTH — reading a device array back to the host
    is never done (see row_gather for the axon dispatch hazard; on any
    TPU it is a needless sync)."""
    fc_parts, sf_parts = [], []
    params = []
    base = 0
    max_folds = 0
    for c in model.components:
        frame = 1 << c.log_m if len(c.freqs) else 0
        params.append((base, int(c.log_m),
                       (1 << c.log_m) - 1 if len(c.freqs) else 0,
                       int(c.radix), int(c.folding_offset)))
        if frame == 0:
            continue
        freqs = c.freqs.astype(np.uint32)
        cumul = np.zeros(len(freqs), dtype=np.uint64)
        np.cumsum(freqs[:-1], out=cumul[1:])
        nz = np.nonzero(freqs)[0]
        syms = np.repeat(nz, freqs[nz])  # one entry per used slot
        used = len(syms)
        assert used <= frame
        thr = c.folding_threshold
        off = c.folding_offset
        folds = np.where(syms < thr, 0, (syms - thr) // off + 1).astype(np.uint64)
        prefix = (syms.astype(np.uint64) - off * folds) << (folds * c.radix)
        if used:
            if int(prefix.max()) >> 31:
                raise ValueError(
                    "symbol prefix exceeds 31 bits; graph too large for the TPU path")
            assert int(syms.max()) < 1 << 16  # folded domain is u16
            max_folds = max(max_folds, int(folds.max()))
        pad = frame - used
        fc_parts.append(np.concatenate(
            [freqs[syms] | (cumul[syms].astype(np.uint32) << 16),
             np.zeros(pad, np.uint32)]))
        sf_parts.append(np.concatenate(
            [syms.astype(np.uint32) | (folds.astype(np.uint32) << 16),
             np.zeros(pad, np.uint32)]))
        base += frame
    slots = max(base, 1)
    z = [np.zeros(1, np.uint32)]
    fc = np.concatenate(fc_parts or z)
    sf = np.concatenate(sf_parts or z)
    fc.resize(slots)
    sf.resize(slots)
    stream_w = np.ascontiguousarray(stream, dtype=np.uint16).astype(np.uint32)
    target = max(-(-len(stream_w) // WORDS_PER_ROW) * WORDS_PER_ROW,
                 WORDS_PER_ROW)
    if target > len(stream_w):
        stream_w = np.concatenate(
            [stream_w, np.zeros(target - len(stream_w), np.uint32)])
    pairs = stream_w[0::2] | (stream_w[1::2] << 16)
    stream_rows = pairs.reshape(-1, PAIRS_PER_ROW)
    lut = np.stack([fc, sf], axis=1)
    params.append(slots)
    params.append(max_folds)
    return lut, stream_rows, params


def _per_comp_const(comp, params: CodecParams, field: int):
    """comp-indexed constant via a 9-way select chain (no table gather)."""
    out = jnp.full(comp.shape, np.uint32(params[0][field]), jnp.uint32)
    for c in range(1, 9):
        out = jnp.where(comp == c, np.uint32(params[c][field]), out)
    return out


def fetch_window(tables: DecoderTables, ptr, rows_back: int,
                 base_rows=None):
    """Per-token stream window: the `rows_back` rows at and below the
    pointer, as register-resident pairs. Returns (win
    [PAIRS_PER_ROW*rows_back, L] u32 pair rows, pbase [L] first pair
    index). One fast per-lane ROW gather per row — never an element
    gather into the stream.

    64-bit streams: `ptr` may be LANE-RELATIVE, with `base_rows` [L] i32
    holding each lane's stream-row base (so absolute word =
    base_rows*WORDS_PER_ROW + ptr). All pointer/pair arithmetic stays in
    the relative i32 domain; only the physical row gather adds the base.
    Row indices are i32, so streams up to 2^31 rows (2^36 u16 words,
    128 GiB) are addressable — the reference's usize pointer analog
    (src/ans/decoder.rs:41-53)."""
    rp = jnp.maximum(ptr.astype(jnp.int32) - 1, 0) >> ROW_SHIFT
    parts = []
    for k in range(rows_back - 1, -1, -1):
        rel = jnp.maximum(rp - k, 0)
        row = rel if base_rows is None else base_rows + rel
        parts.append(row_gather(tables.stream_rows, row))  # [L, PAIRS]
    win = jnp.concatenate(parts, axis=1).T  # low->high
    # pbase may go negative near the stream start; the clamped duplicate
    # low rows are then never addressed (valid streams never read below 0)
    pbase = (rp - (rows_back - 1)) * PAIRS_PER_ROW
    return win, pbase


def _refill_pair(state, ptr, win, pbase, active):
    """Masked 16-bit renormalization refill from the full pair window
    (reference: src/ans/decoder.rs:89-93) via a take_along_axis gather —
    only used for high-fold models (raw-codec tests) whose window exceeds
    the select-chain budget."""
    P = win.shape[0]
    need = active & (state < LOWER_BOUND)
    new_ptr = ptr - need.astype(ptr.dtype)
    pidx = jnp.clip((new_ptr >> 1) - pbase, 0, P - 1)
    pair = jnp.take_along_axis(win, pidx[None, :], axis=0)[0]
    word = jnp.where((new_ptr & 1) == 1, pair >> np.uint32(16),
                     pair & jnp.uint32(0xFFFF))
    state = jnp.where(need, (state << np.uint32(B)) | word, state)
    return state, jnp.where(need, new_ptr, ptr)


def _refill_local(state, ptr, loc, pair_lo, active):
    """Masked 16-bit refill from the token-local consecutive pairs `loc`
    (extracted once per token): a token's refills walk consecutive words
    [ptr-1-2*max_folds, ptr-1], so each refill only needs a tiny
    len(loc)-way select instead of a window-wide chain."""
    need = active & (state < LOWER_BOUND)
    new_ptr = ptr - need.astype(ptr.dtype)
    if len(loc) == 1:
        pair = loc[0]
    else:
        j = jnp.clip((new_ptr >> 1) - pair_lo, 0, len(loc) - 1)
        pair = jax.lax.select_n(j, *loc)
    word = jnp.where((new_ptr & 1) == 1, pair >> np.uint32(16),
                     pair & jnp.uint32(0xFFFF))
    state = jnp.where(need, (state << np.uint32(B)) | word, state)
    return state, jnp.where(need, new_ptr, ptr)


def _rows_back(max_folds: int) -> int:
    """Stream rows a token can straddle: worst-case word consumption is
    1 + 2*max_folds, and in the worst alignment only
    WORDS_PER_ROW*(rows_back-1) words below the pointer are covered."""
    return 1 + -(-(1 + 2 * max_folds) // WORDS_PER_ROW)


def _chunk_steps(max_folds: int) -> int:
    """Tokens decodable from a register-resident `_rows_back`-row window
    before a refetch is needed: the window fetched at pointer p covers at
    least WORDS_PER_ROW*(rows_back-1) words below p-1 in the worst
    alignment, and each token consumes at most 1 + 2*max_folds words."""
    return max(1, (WORDS_PER_ROW * (_rows_back(max_folds) - 1))
               // (1 + 2 * max_folds))


def _cap_quantum(max_folds: int) -> int:
    """decode_blocks requires cap to be a multiple of this (the chunked
    loop advances _chunk_steps tokens per refetch; nibble words pack
    UNROLL tokens)."""
    k = _chunk_steps(max_folds)
    return k * UNROLL // np.gcd(k, UNROLL)


def round_cap(params: CodecParams, cap: int) -> int:
    """Rounds a token capacity up to decode_blocks' cap quantum."""
    q = _cap_quantum(params[10])
    return -(-max(cap, 1) // q) * q


def ans_decode_step(params: CodecParams, tables: DecoderTables,
                    state, ptr, comp, active, win, pbase):
    """One rANS decode step per lane: LUT gathers, state update,
    pair-window refills, quasi-unfold (reference: src/ans/decoder.rs:
    58-87); unfold statically unrolled to the model's maximum fold count.
    All arguments are vectors over the lane dimension; `active` masks
    finished lanes. Returns (value, state, ptr), unchanged on inactive
    lanes."""
    comp = comp.astype(jnp.uint32)
    offset = _per_comp_const(comp, params, 0)
    log_m = _per_comp_const(comp, params, 1)
    mask = _per_comp_const(comp, params, 2)
    radix = _per_comp_const(comp, params, 3)
    radix_mask = (jnp.uint32(1) << radix) - jnp.uint32(1)
    max_folds = params[10]
    lut = tables.lut
    P = win.shape[0]

    slot = state & mask
    if "nolut" in os.environ.get("WGT_DECODE_PROBE", ""):
        # cost-attribution ablation: no LUT gather (decodes garbage)
        row = jnp.broadcast_to(jnp.array([1, 0], jnp.uint32),
                               (slot.shape[0], 2))
    else:
        # ONE 8-byte row DMA per lane per token (flat-gather form; see
        # row_gather)
        row = row_gather(lut, (offset + slot).astype(jnp.int32))
    fc = row[:, 0]
    freq = fc & jnp.uint32(0xFFFF)
    cumul = fc >> np.uint32(16)
    sym = row[:, 1] & jnp.uint32(0xFFFF)
    folds = row[:, 1] >> np.uint32(16)
    # 31-bit symbol prefix recomputed on the VPU (folds*radix can reach 31
    # only when the shifted base is 0; clamp keeps the shift defined)
    fold_off = _per_comp_const(comp, params, 4)
    prefix = (sym - fold_off * folds) << jnp.minimum(
        folds * radix, jnp.uint32(31))

    # A token's refills read the consecutive words
    # [ptr-1-2*max_folds, ptr-1]: extract those max_folds+1 pairs from the
    # window ONCE, then each refill selects among them (tiny chains instead
    # of window-wide ones). High-fold models fall back to per-refill
    # window gathers.
    if P <= 32:
        pair_lo = jnp.maximum(
            ptr.astype(jnp.int32) - (1 + 2 * max_folds), 0) >> 1
        loc = []
        for j in range(max_folds + 1):
            idx = jnp.clip(pair_lo - pbase + j, 0, P - 1)
            loc.append(jax.lax.select_n(idx, *[win[k] for k in range(P)]))

        def refill(s, p, a):
            return _refill_local(s, p, loc, pair_lo, a)
    else:
        def refill(s, p, a):
            return _refill_pair(s, p, win, pbase, a)

    new_state = (state >> log_m) * freq + slot - cumul
    new_state, new_ptr = refill(new_state, ptr, active)

    # Pull `folds` radix-bit chunks back out of the state, refilling between
    # pulls (reference: decoder.rs:71-86). Statically unrolled and masked.
    fold = jnp.zeros_like(state)
    folds_left = jnp.where(active, folds, 0)
    for _ in range(max_folds):
        a = folds_left > 0
        new_state, new_ptr = refill(new_state, new_ptr, a)
        fold = jnp.where(a, (fold << radix) | (new_state & radix_mask), fold)
        new_state = jnp.where(a, new_state >> radix, new_state)
        new_state, new_ptr = refill(new_state, new_ptr, a)
        folds_left = folds_left - a.astype(folds_left.dtype)

    value = prefix | fold
    state = jnp.where(active, new_state, state)
    ptr = jnp.where(active, new_ptr, ptr)
    return value, state, ptr


@functools.partial(jax.jit, static_argnames=("params", "num_tokens"))
def decode_token_plan(params: CodecParams, tables: DecoderTables,
                      state, ptr, comps, num_tokens: int):
    """Decodes a STATIC per-lane component plan: lane l decodes
    comps[l, t] for t in 0..num_tokens. The raw-codec counterpart of the
    native decode_raw (reference: ANSDecoder usage in
    tests/compressor_tests.rs). Returns (values [L, T], state, ptr)."""
    L = state.shape[0]
    values = jnp.zeros((num_tokens, L), dtype=jnp.uint32)
    active = jnp.ones((L,), dtype=bool)
    regs = jnp.stack(
        [jax.lax.bitcast_convert_type(state.astype(jnp.uint32), jnp.int32),
         ptr.astype(jnp.int32)], axis=0)

    def body(t, carry):
        regs, values = carry
        state = jax.lax.bitcast_convert_type(regs[0], jnp.uint32)
        win, pbase = fetch_window(tables, regs[1], _rows_back(params[10]))
        v, state, ptr = ans_decode_step(
            params, tables, state, regs[1], comps[:, t], active, win, pbase)
        values = values.at[t, :].set(v)
        regs = jnp.stack(
            [jax.lax.bitcast_convert_type(state, jnp.int32), ptr], axis=0)
        return regs, values

    regs, values = jax.lax.fori_loop(0, num_tokens, body, (regs, values))
    return (values.T,
            jax.lax.bitcast_convert_type(regs[0], jnp.uint32), regs[1])


@functools.partial(
    jax.jit, static_argnames=("params", "window", "min_interval", "cap",
                              "emit_aux")
)
def decode_blocks(params: CodecParams, tables: DecoderTables,
                  states, ptrs, starts, ends, ring_seed,
                  window: int, min_interval: int, cap: int,
                  base_rows=None, emit_aux: bool = False):
    """Grammar-FSM token decode of independent node ranges (blocks).

    Lane l decodes every (component, value) token of nodes
    starts[l]..ends[l]-1, entering the stream at that node's phase. The
    component sequence is data-dependent (the BvGraph grammar; executable
    spec: native/src/bvgraph.hpp read_successors); each lane tracks it with
    a small register FSM (a single packed [regs, L] carry), and all lanes
    advance UNROLL tokens per lockstep loop iteration.

    ring_seed [L, window+1] must hold the outdegrees of the `window` nodes
    preceding each block at slots node_id % (window+1) (use seed_rings);
    entries for nodes < starts[l]-window are never read.

    cap must be a multiple of round_cap's quantum. Returns (out
    [cap + cap//8, L] u32, counts [L], ok bool[L]): row s < cap holds the
    token values of lockstep step s (lane l's tokens are rows
    0..counts[l]-1), rows cap + s//8 hold the component ids packed 4 bits
    per token, 8 tokens per word (token s at nibble s % 8). Lanes whose
    token count exceeds `cap` report ok=False (re-run with a bigger cap).

    Stream access is CHUNKED: each lane keeps `rows_back` stream rows
    register-resident (inside the one packed carry) and refetches them
    only every `_chunk_steps(max_folds)` tokens — the dominant per-token
    cost on TPU is row-gather DMAs, and worst-case word consumption
    bounds how long a fetched window stays valid.

    64-bit streams: pass `ptrs` LANE-RELATIVE plus `base_rows` [L] i32
    per-lane stream-row bases (absolute word = base_rows*WORDS_PER_ROW +
    ptr); see fetch_window. With base_rows=None pointers are absolute
    (streams < 2^31 words).

    emit_aux=True is the device-reconstruction mode: the output grows to
    [3*cap + cap//8, L] (rows cap..2cap = aux1, 2cap..3cap = aux2), and
    each node is followed by ONE summary pseudo-step (nibble 0x9, not
    counted in `counts`): value = ncop (copied elements), aux1 = niv
    (interval elements), aux2 = tail_len. Per-token aux carries
    pre-resolved reconstruction fields (absolute residual successors,
    absolute interval left extremes, run-local element bases) so the
    device reconstructor needs no per-token cumsum re-derivation — see
    ops/reconstruct_device.py. cap must then cover tokens + nodes per
    lane."""
    rows_back = _rows_back(params[10])
    K = _chunk_steps(params[10])
    assert cap % _cap_quantum(params[10]) == 0, (
        f"cap {cap} not a multiple of the decode quantum; use round_cap")
    assert K * (1 + 2 * params[10]) <= WORDS_PER_ROW * (rows_back - 1), (
        f"model max_folds {params[10]} exceeds the stream window")
    L = states.shape[0]
    R = window + 1
    WPAIRS = PAIRS_PER_ROW * rows_back
    R_PBASE = NREG + R          # window base pair index
    WIN0 = NREG + R + 1         # resident stream window rows
    R_BROW = WIN0 + WPAIRS      # per-lane stream-row base (64-bit streams)
    # aux-mode registers: running residual value, interval element count,
    # interval left/end tracker, first-interval flag, tail length
    R_PREVRES, R_IVSUM, R_IVL, R_FIV, R_TAIL = (
        R_BROW + 1, R_BROW + 2, R_BROW + 3, R_BROW + 4, R_BROW + 5)
    i32 = jnp.int32

    regs = jnp.zeros((R_BROW + 1 + (5 if emit_aux else 0), L), i32)
    regs = regs.at[R_STATE].set(
        jax.lax.bitcast_convert_type(states.astype(jnp.uint32), i32))
    regs = regs.at[R_PTR].set(ptrs.astype(i32))
    if base_rows is not None:
        regs = regs.at[R_BROW].set(base_rows.astype(i32))
    regs = regs.at[R_X].set(starts.astype(i32))
    regs = regs.at[R_PHASE].set(
        jnp.where(starts < ends, P_OUT, P_DONE).astype(i32))
    regs = regs.at[NREG:NREG + R].set(ring_seed.astype(i32).T)
    ends = ends.astype(i32)
    VROWS = 3 * cap if emit_aux else cap
    out = jnp.zeros((VROWS + cap // UNROLL, L), jnp.uint32)
    # untouched packed-component rows must read as 0xF nibbles
    out = out.at[VROWS:, :].set(jnp.uint32(0xFFFFFFFF))

    ring_rows = jnp.arange(R)[:, None]  # [R, 1] for one-hot ring ops

    def cond(carry):
        step, regs, out = carry
        return (step < cap) & jnp.any(regs[R_PHASE] != P_DONE)

    def one_step(regs, cpk):
        """One FSM token step on the packed register file; returns
        (new regs, value u32, aux1 u32, aux2 u32, nibble: phase, 0x9 on
        summary steps, or 0xF on finished lanes)."""
        p = regs[R_PHASE]
        ptr0 = regs[R_PTR]
        active = p != P_DONE
        is_sum = active & (p == P_SUM)
        dec_active = active & ~is_sum
        res_rem_pre = regs[R_RESREM]
        blocks_sum_pre = regs[R_BSUM]
        copied_pre = regs[R_COPIED]
        cpy_pre = regs[R_CPY]
        state = jax.lax.bitcast_convert_type(regs[R_STATE], jnp.uint32)
        win = jax.lax.bitcast_convert_type(regs[WIN0:WIN0 + WPAIRS],
                                           jnp.uint32)
        pbase = regs[R_PBASE]
        v, state, ptr = ans_decode_step(
            params, tables, state, ptr0, jnp.minimum(p, P_RES), dec_active,
            win, pbase)
        vu = jnp.where(dec_active, v, 0)
        nib = jnp.where(dec_active, jnp.minimum(p, P_RES).astype(jnp.uint32),
                        jnp.where(is_sum, jnp.uint32(NIB_SUM),
                                  jnp.uint32(0xF)))
        v = jax.lax.bitcast_convert_type(v, i32)

        x = regs[R_X]
        d, bc = regs[R_D], regs[R_BC]
        blocks_rem, blk_idx, blocks_sum = regs[R_BREM], regs[R_BIDX], regs[R_BSUM]
        copy_flag = regs[R_CPY] != 0
        copied, ref_outdeg = regs[R_COPIED], regs[R_REFD]
        extra, iv_rem, res_rem = regs[R_EXTRA], regs[R_IVREM], regs[R_RESREM]
        ring = regs[NREG:NREG + R]

        is_out = active & (p == P_OUT)
        d = jnp.where(is_out, v, d)
        ring = jnp.where(
            is_out[None, :] & (ring_rows == (x % R)[None, :]), v[None, :], ring)

        is_ref = active & (p == P_REF)
        ref_sel = jnp.sum(
            jnp.where(ring_rows == ((x - v) % R)[None, :], ring, 0), axis=0)
        ref_outdeg = jnp.where(is_ref, ref_sel, ref_outdeg)

        is_bc = active & (p == P_BC)
        bc = jnp.where(is_bc, v, bc)
        blocks_rem = jnp.where(is_bc, v, blocks_rem)
        blk_idx = jnp.where(is_bc, 0, blk_idx)
        blocks_sum = jnp.where(is_bc, 0, blocks_sum)
        copy_flag = jnp.where(is_bc, True, copy_flag)
        # `copied` is stale from the previous node on every fresh-node path.
        copied = jnp.where(is_bc | is_ref | is_out, 0, copied)
        # bc == 0: the whole reference list is tail-copied
        # (native/src/bvgraph.hpp:79-81).
        copied = jnp.where(is_bc & (v == 0), ref_outdeg, copied)

        is_blk = active & (p == P_BLK)
        b = v + (blk_idx > 0).astype(i32)
        blocks_sum = jnp.where(is_blk, blocks_sum + b, blocks_sum)
        copied = jnp.where(is_blk & copy_flag, copied + b, copied)
        copy_flag = jnp.where(is_blk, ~copy_flag, copy_flag)
        blk_idx = jnp.where(is_blk, blk_idx + 1, blk_idx)
        blocks_rem = jnp.where(is_blk, blocks_rem - 1, blocks_rem)
        blocks_done = is_blk & (blocks_rem == 0)
        copied = jnp.where(
            blocks_done & (bc % 2 == 0), copied + ref_outdeg - blocks_sum,
            copied)

        is_ic = active & (p == P_IC)
        iv_rem = jnp.where(is_ic, v, iv_rem)

        is_il = active & (p == P_IL)
        extra = jnp.where(is_il, extra - (v + min_interval), extra)
        iv_rem = jnp.where(is_il, iv_rem - 1, iv_rem)

        is_fr = active & (p == P_FR)
        is_res = active & (p == P_RES)
        res_rem = jnp.where(is_fr | is_res, res_rem - 1, res_rem)

        if emit_aux:
            # Per-token reconstruction fields (see docstring). All i32;
            # node ids < 2^31 and degrees < 2^30 keep them in range.
            is_is = active & (p == P_IS)
            prevres0 = regs[R_PREVRES]
            ivsum0 = jnp.where(is_out, 0, regs[R_IVSUM])
            ivl0 = regs[R_IVL]
            fiv0 = regs[R_FIV]
            n2i = (v >> 1) ^ -(v & 1)          # nat2int
            resval = jnp.where(is_fr, x + n2i, prevres0 + v + 1)
            prevres = jnp.where(is_fr | is_res, resval, prevres0)
            left = jnp.where(fiv0 != 0, x + n2i, ivl0 + 1 + v)
            ilen = v + min_interval
            ivl = jnp.where(is_is, left,
                            jnp.where(is_il, ivl0 + ilen, ivl0))
            fiv = jnp.where(is_ic, 1, jnp.where(is_is, 0, fiv0))
            ivsum = jnp.where(is_il, ivsum0 + ilen, ivsum0)
            tail = jnp.where(is_out, 0, regs[R_TAIL])
            tail = jnp.where(is_bc & (v == 0), ref_outdeg, tail)
            tail = jnp.where(
                blocks_done,
                jnp.where(bc % 2 == 0, ref_outdeg - blocks_sum, 0), tail)
            aux1 = jnp.where(is_blk, blocks_sum_pre, 0)
            aux2 = jnp.where(is_blk, (copied_pre << 1) | cpy_pre, 0)
            aux1 = jnp.where(is_is | is_il, jnp.where(is_is, left, ivl0),
                             aux1)
            aux2 = jnp.where(is_is | is_il, copied + ivsum0, aux2)
            aux1 = jnp.where(is_fr | is_res, resval, aux1)
            aux2 = jnp.where(is_fr | is_res, d - res_rem_pre, aux2)
            aux1 = jnp.where(is_sum, ivsum0, aux1)
            aux2 = jnp.where(is_sum, tail, aux2)
            vu = jnp.where(is_sum,
                           jax.lax.bitcast_convert_type(copied, jnp.uint32),
                           vu)
        else:
            aux1 = aux2 = None

        # --- next-phase selection ---
        P_DONE_NODE = -1  # sentinel: node finished

        enter_tail = (
            (is_out & (v > 0) & (window == 0))
            | (is_ref & (v == 0))
            | (is_bc & (v == 0))
            | blocks_done
        )
        extra = jnp.where(enter_tail, d - copied, extra)

        def tail_phase(extra_v):
            if min_interval != 0:
                return jnp.where(extra_v > 0, P_IC, P_DONE_NODE)
            return jnp.where(extra_v > 0, P_FR, P_DONE_NODE)

        nxt = jnp.full((L,), -2, i32)  # -2: keep current phase
        nxt = jnp.where(is_out & (v == 0), P_DONE_NODE, nxt)
        if window > 0:
            nxt = jnp.where(is_out & (v > 0), P_REF, nxt)
        else:
            nxt = jnp.where(is_out & (v > 0), tail_phase(d - copied), nxt)
        nxt = jnp.where(is_ref & (v > 0), P_BC, nxt)
        nxt = jnp.where(is_ref & (v == 0), tail_phase(extra), nxt)
        nxt = jnp.where(is_bc & (v > 0), P_BLK, nxt)
        nxt = jnp.where(is_bc & (v == 0), tail_phase(extra), nxt)
        nxt = jnp.where(blocks_done, tail_phase(extra), nxt)
        # ic > 0 -> interval pairs; ic == 0 -> the residual tail (extra > 0
        # is guaranteed at P_IC entry).
        nxt = jnp.where(is_ic, jnp.where(v > 0, P_IS, P_FR), nxt)
        nxt = jnp.where(active & (p == P_IS), P_IL, nxt)
        nxt = jnp.where(
            is_il,
            jnp.where(iv_rem > 0, P_IS,
                      jnp.where(extra > 0, P_FR, P_DONE_NODE)),
            nxt,
        )
        res_rem = jnp.where(nxt == P_FR, extra, res_rem)
        nxt = jnp.where(is_fr | is_res,
                        jnp.where(res_rem > 0, P_RES, P_DONE_NODE), nxt)

        node_done = nxt == P_DONE_NODE
        x = jnp.where(node_done, x + 1, x)
        if emit_aux:
            # node end -> one summary pseudo-step, then the next node
            nxt = jnp.where(node_done, P_SUM, nxt)
            nxt = jnp.where(is_sum, jnp.where(x >= ends, P_DONE, P_OUT),
                            nxt)
        else:
            nxt = jnp.where(node_done,
                            jnp.where(x >= ends, P_DONE, P_OUT), nxt)
        phase = jnp.where(nxt == -2, p, nxt)

        parts = [
            jnp.stack([
                jax.lax.bitcast_convert_type(state, i32), ptr, x, phase, d,
                bc, blocks_rem, blk_idx, blocks_sum, copy_flag.astype(i32),
                copied, ref_outdeg, extra, iv_rem, res_rem,
                regs[R_OUTN] + dec_active.astype(i32), cpk,
            ], axis=0),
            ring,
            regs[NREG + R:R_BROW + 1],  # pbase + window + brow pass through
        ]
        if emit_aux:
            parts.append(jnp.stack([prevres, ivsum, ivl, fiv, tail],
                                   axis=0))
        new_regs = jnp.concatenate(parts, axis=0)
        return new_regs, vu, aux1, aux2, nib

    def inner(_, carry):
        step, regs, out = carry
        sub = step % UNROLL
        cpk_prev = jax.lax.bitcast_convert_type(regs[R_CPK], jnp.uint32)
        # fresh words start all-0xF so unexecuted tail nibbles read invalid
        cpk_prev = jnp.where(sub == 0, jnp.uint32(0xFFFFFFFF), cpk_prev)
        regs, vu, aux1, aux2, nib = one_step(
            regs, jnp.zeros((L,), i32))  # cpk reg rewritten below
        shift = (4 * sub).astype(jnp.uint32)
        cpk = ((cpk_prev & ~(jnp.uint32(0xF) << shift))
               | ((nib & jnp.uint32(0xF)) << shift))
        regs = regs.at[R_CPK].set(jax.lax.bitcast_convert_type(cpk, i32))
        if "noout" not in os.environ.get("WGT_DECODE_PROBE", ""):
            out = out.at[step, :].set(vu)
            if emit_aux:
                out = out.at[cap + step, :].set(
                    jax.lax.bitcast_convert_type(aux1, jnp.uint32))
                out = out.at[2 * cap + step, :].set(
                    jax.lax.bitcast_convert_type(aux2, jnp.uint32))
            out = out.at[VROWS + step // UNROLL, :].set(cpk)
        return step + 1, regs, out

    def body(carry):
        step, regs, out = carry
        if "norefetch" not in os.environ.get("WGT_DECODE_PROBE", ""):
            # refetch the resident stream window (rows_back row DMAs per
            # lane, amortized over the K tokens of this chunk)
            win_new, pbase_new = fetch_window(
                tables, regs[R_PTR], rows_back,
                regs[R_BROW] if base_rows is not None else None)
            regs = regs.at[R_PBASE].set(pbase_new)
            regs = regs.at[WIN0:WIN0 + WPAIRS].set(
                jax.lax.bitcast_convert_type(win_new, i32))
        return jax.lax.fori_loop(0, K, inner, (step, regs, out))

    step, regs, out = jax.lax.while_loop(
        cond, body, (jnp.zeros((), i32), regs, out))
    ok = regs[R_PHASE] == P_DONE
    return out, regs[R_OUTN], ok


def unpack_block_tokens(vals: np.ndarray, cpk: np.ndarray,
                        counts: np.ndarray):
    """Host-side unpack of decode_blocks output (value rows [rows, L] and
    packed-nibble rows [ceil(rows/8), L]) into forward-node-order
    (values u32, comps u8) flat arrays. Rows whose component nibble is 0xF
    (finished-lane or past-the-end rows) are dropped; each lane contributes
    exactly counts[l] tokens in order."""
    rows = vals.shape[0]
    steps = np.arange(rows)
    nib = (cpk[steps // UNROLL, :] >> ((steps % UNROLL) * 4)[:, None]) & 0xF
    valid = nib <= 8                     # [rows, L]
    # column-major flatten keeps each lane's rows contiguous and in order
    vmask = valid.T.ravel()
    flat_v = vals.T.ravel()[vmask]
    flat_c = nib.T.ravel()[vmask].astype(np.uint8)
    lane_counts = valid.sum(axis=0)
    assert np.array_equal(lane_counts, counts), "token accounting mismatch"
    return flat_v, flat_c


def fetch_block_tokens(out, counts, cap: int):
    """Fetches decode_blocks output to the host, trimming untouched rows
    on the device first (row count rounded to 64 for compile-shape reuse)."""
    counts_np = np.asarray(counts)
    rows = min(cap, -(-max(int(counts_np.max()), 1) // 64) * 64)
    vals = np.asarray(out[:rows])
    cpk = np.asarray(out[cap: cap + -(-rows // UNROLL)])
    return unpack_block_tokens(vals, cpk, counts_np)


@functools.partial(jax.jit, static_argnames=("params", "window"))
def seed_rings(params: CodecParams, tables: DecoderTables,
               states, ptrs, starts, window: int, base_rows=None):
    """Builds the outdegree ring seeds for decode_blocks: for each lane,
    decodes the single Outdegree token of each of the `window` nodes
    preceding the block start (independent entries via the phase table,
    exactly what random access does — reference:
    src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58).

    states/ptrs: [L, window] phases of nodes starts[l]-window .. starts[l]-1
    (clamped to node 0; lanes ignore entries before node 0). For 64-bit
    streams, ptrs are lane-relative to base_rows [L] (see fetch_window).
    Returns ring [L, window+1] with outdegrees at slots node % (window+1)."""
    L = states.shape[0]
    R = window + 1
    ring = jnp.zeros((L, R), jnp.int32)
    if window == 0:
        return ring
    ring_cols = jnp.arange(R)[None, :]
    comp = jnp.zeros((L,), jnp.int32)  # OUTDEGREE
    for j in range(window):
        node = starts.astype(jnp.int32) - window + j
        valid = node >= 0
        ptr_j = ptrs[:, j].astype(jnp.int32)
        win, pbase = fetch_window(tables, ptr_j, _rows_back(params[10]),
                                  base_rows)
        v, _, _ = ans_decode_step(
            params, tables, states[:, j].astype(jnp.uint32),
            ptr_j, comp, valid, win, pbase)
        ring = jnp.where(
            valid[:, None] & (ring_cols == (node % R)[:, None]),
            jax.lax.bitcast_convert_type(v, jnp.int32)[:, None], ring)
    return ring

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

TPU-first data layout choices (gathers are the scarce resource — and on
TPU, gathers from DIFFERENT buffers inside one loop body defeat loop
fusion and cost ~100x more than gathers from one buffer):
- the three decoder LUT columns (freq|cumul, symbol prefix, fold count)
  AND the u16 stream all live in ONE flat u32 buffer; every gather in the
  hot loop hits that single buffer at a static region offset;
- per-component codec parameters (offset/log_m/mask/radix) are STATIC
  Python constants baked into the program as 9-way select chains — no
  parameter-table gathers at all;
- the sliding outdegree ring is updated/read with one-hot arithmetic on a
  [L, window+1] register block instead of scatter/gather;
- token output is step-major ([cap, L]): one contiguous row write per
  lockstep iteration.

Everything is jit-compatible (static shapes, lax control flow) and runs
unchanged under shard_map over a device mesh (webgraph_ans_tpu.parallel).

Numeric domain: token values must fit in uint32, which holds for graphs
with < 2^31 nodes (covers every LAW graph in BASELINE.md); the table
builder checks this.
"""

from __future__ import annotations

import functools
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


class DecoderTables(NamedTuple):
    """One flat u32 decode buffer (reference LUT layout:
    src/ans/models/model4decoder.rs:18-68, re-packed TPU-first):
    [fc (slots) | sym prefix (slots) | fold count (slots) | stream words].
    Region bases are static ints in CodecParams so every hot-loop gather
    addresses this single buffer."""

    buf: jax.Array  # uint32 [3 * slots + stream_len]


# Static codec parameters: 9 x (offset, log_m, mask, radix), then the slot
# count (region stride) as element [9]. _per_comp_const only reads [0..8].
CodecParams = tuple


def build_decoder_tables(model: ANSModel, stream) -> tuple[DecoderTables, CodecParams]:
    """Expands the encoder model + u16 stream into the flat decode buffer
    (host-side) and the static parameter tuple."""
    fc_parts, sym_parts, fold_parts = [], [], []
    params = []
    base = 0
    for c in model.components:
        frame = 1 << c.log_m if len(c.freqs) else 0
        params.append((base, int(c.log_m),
                       (1 << c.log_m) - 1 if len(c.freqs) else 0,
                       int(c.radix)))
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
        if used and int(prefix.max()) >> 32:
            raise ValueError("symbol prefix exceeds 32 bits; graph too large for the TPU path")
        pad = frame - used
        fc_parts.append(np.concatenate(
            [freqs[syms] | (cumul[syms].astype(np.uint32) << 16),
             np.zeros(pad, np.uint32)]))
        sym_parts.append(np.concatenate(
            [prefix.astype(np.uint32), np.zeros(pad, np.uint32)]))
        fold_parts.append(np.concatenate(
            [folds.astype(np.uint32), np.zeros(pad, np.uint32)]))
        base += frame
    slots = max(base, 1)
    z = [np.zeros(1, np.uint32)]
    fc = np.concatenate(fc_parts or z)
    sym = np.concatenate(sym_parts or z)
    fold = np.concatenate(fold_parts or z)
    fc.resize(slots); sym.resize(slots); fold.resize(slots)
    stream_w = np.ascontiguousarray(stream, dtype=np.uint16).astype(np.uint32)
    if len(stream_w) == 0:
        stream_w = np.zeros(1, np.uint32)
    buf = np.concatenate([fc, sym, fold, stream_w])
    params.append(slots)
    return DecoderTables(buf=jnp.asarray(buf)), tuple(params)


def _per_comp_const(comp, params: CodecParams, field: int):
    """comp-indexed constant via a 9-way select chain (no table gather)."""
    out = jnp.full(comp.shape, np.uint32(params[0][field]), jnp.uint32)
    for c in range(1, 9):
        out = jnp.where(comp == c, np.uint32(params[c][field]), out)
    return out


def _refill(state, ptr, buf, stream_base: int, active):
    """Masked 16-bit renormalization refill, reading the stream region of
    the flat buffer backwards (reference: src/ans/decoder.rs:89-93)."""
    need = active & (state < LOWER_BOUND)
    new_ptr = ptr - need.astype(ptr.dtype)
    word = buf[stream_base + jnp.maximum(new_ptr, 0)]
    state = jnp.where(need, (state << np.uint32(B)) | word, state)
    return state, jnp.where(need, new_ptr, ptr)


def ans_decode_step(params: CodecParams, tables: DecoderTables,
                    state, ptr, comp, active):
    """One rANS decode step per lane: LUT gathers, state update, refill,
    quasi-unfold (reference: src/ans/decoder.rs:58-87) — every gather into
    the one flat buffer. All arguments are vectors over the lane dimension;
    `active` masks finished lanes. Returns (value, state, ptr), unchanged
    on inactive lanes."""
    comp = comp.astype(jnp.uint32)
    offset = _per_comp_const(comp, params, 0)
    log_m = _per_comp_const(comp, params, 1)
    mask = _per_comp_const(comp, params, 2)
    radix = _per_comp_const(comp, params, 3)
    radix_mask = (jnp.uint32(1) << radix) - jnp.uint32(1)
    slots = params[9]
    buf = tables.buf
    stream_base = 3 * slots

    slot = state & mask
    idx = offset + slot
    fc = buf[idx]
    freq = fc & jnp.uint32(0xFFFF)
    cumul = fc >> np.uint32(16)
    prefix = buf[np.uint32(slots) + idx]
    folds = buf[np.uint32(2 * slots) + idx]

    new_state = (state >> log_m) * freq + slot - cumul
    new_state, new_ptr = _refill(new_state, ptr, buf, stream_base, active)

    # Pull `folds` radix-bit chunks back out of the state, refilling between
    # pulls (reference: decoder.rs:71-86). Lockstep over the max live fold
    # count; typical counts are 0-3.
    def cond(carry):
        return jnp.any(carry[0] > 0)

    def body(carry):
        folds_left, st, pt, fold = carry
        a = folds_left > 0
        st, pt = _refill(st, pt, buf, stream_base, a)
        fold = jnp.where(a, (fold << radix) | (st & radix_mask), fold)
        st = jnp.where(a, st >> radix, st)
        st, pt = _refill(st, pt, buf, stream_base, a)
        return folds_left - a.astype(folds_left.dtype), st, pt, fold

    folds = jnp.where(active, folds, 0)
    fold0 = jnp.zeros_like(state)
    _, new_state, new_ptr, fold = jax.lax.while_loop(
        cond, body, (folds, new_state, new_ptr, fold0)
    )

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
    values = jnp.zeros((L, num_tokens), dtype=jnp.uint32)
    active = jnp.ones((L,), dtype=bool)

    def body(t, carry):
        values, state, ptr = carry
        v, state, ptr = ans_decode_step(
            params, tables, state, ptr, comps[:, t], active)
        return values.at[:, t].set(v), state, ptr

    values, state, ptr = jax.lax.fori_loop(0, num_tokens, body, (values, state, ptr))
    return values, state, ptr


class _FSM(NamedTuple):
    state: jax.Array      # u32 [L] rANS state
    ptr: jax.Array        # i32 [L] stream pointer
    x: jax.Array          # i32 [L] current node id
    phase: jax.Array      # i32 [L]
    d: jax.Array          # i32 [L] outdegree of current node
    bc: jax.Array         # i32 [L] block count
    blocks_rem: jax.Array
    blk_idx: jax.Array
    blocks_sum: jax.Array
    copy_flag: jax.Array  # bool [L]
    copied: jax.Array
    ref_outdeg: jax.Array
    extra: jax.Array
    iv_rem: jax.Array
    res_rem: jax.Array
    ring: jax.Array       # i32 [L, R] outdegree ring buffer
    out_vals: jax.Array   # u32 [CAP, L] (step-major: row s = tokens of step s)
    out_comps: jax.Array  # i8 [CAP, L]
    out_n: jax.Array      # i32 [L]
    step_i: jax.Array     # i32 scalar: lockstep iteration index


@functools.partial(
    jax.jit, static_argnames=("params", "window", "min_interval", "cap")
)
def decode_blocks(params: CodecParams, tables: DecoderTables,
                  states, ptrs, starts, ends, ring_seed,
                  window: int, min_interval: int, cap: int):
    """Grammar-FSM token decode of independent node ranges (blocks).

    Lane l decodes every (component, value) token of nodes
    starts[l]..ends[l]-1, entering the stream at that node's phase. The
    component sequence is data-dependent (the BvGraph grammar; executable
    spec: native/src/bvgraph.hpp read_successors); each lane tracks it with
    a small register FSM, and all lanes advance one token per lockstep
    iteration.

    ring_seed [L, window+1] must hold the outdegrees of the `window` nodes
    preceding each block at slots node_id % (window+1) (use seed_rings);
    entries for nodes < starts[l]-window are never read.

    Returns (values [cap, L] step-major, comps [cap, L], counts [L],
    ok: bool[L]). Lane l's tokens are values[0:counts[l], l]. Lanes whose
    token count exceeds `cap` report ok=False (re-run with a bigger cap)."""
    L = states.shape[0]
    R = window + 1
    i32 = jnp.int32

    fsm = _FSM(
        state=states.astype(jnp.uint32),
        ptr=ptrs.astype(i32),
        x=starts.astype(i32),
        phase=jnp.where(starts < ends, P_OUT, P_DONE).astype(i32),
        d=jnp.zeros((L,), i32),
        bc=jnp.zeros((L,), i32),
        blocks_rem=jnp.zeros((L,), i32),
        blk_idx=jnp.zeros((L,), i32),
        blocks_sum=jnp.zeros((L,), i32),
        copy_flag=jnp.zeros((L,), bool),
        copied=jnp.zeros((L,), i32),
        ref_outdeg=jnp.zeros((L,), i32),
        extra=jnp.zeros((L,), i32),
        iv_rem=jnp.zeros((L,), i32),
        res_rem=jnp.zeros((L,), i32),
        ring=ring_seed.astype(i32),
        out_vals=jnp.zeros((cap, L), jnp.uint32),
        out_comps=jnp.zeros((cap, L), jnp.int8),
        out_n=jnp.zeros((L,), i32),
        step_i=jnp.zeros((), i32),
    )
    ends = ends.astype(i32)
    ring_cols = jnp.arange(R)[None, :]  # [1, R] for one-hot ring ops

    def cond(f):
        return (f.step_i < cap) & jnp.any(f.phase != P_DONE)

    def step(f):
        active = f.phase != P_DONE
        v, state, ptr = ans_decode_step(
            params, tables, f.state, f.ptr,
            jnp.minimum(f.phase, P_RES), active
        )
        v = v.astype(i32)  # all token values < 2^31 for supported graphs

        # Record the token. An active lane emits exactly one token per
        # lockstep iteration, so lane l's tokens live at rows 0..count(l)-1
        # of the step-major output: a contiguous row write
        # (dynamic-update-slice on dim 0), far cheaper on TPU than a
        # per-lane scatter or a strided column write.
        out_vals = f.out_vals.at[f.step_i, :].set(
            jnp.where(active, v.astype(jnp.uint32), 0))
        out_comps = f.out_comps.at[f.step_i, :].set(
            jnp.where(active, f.phase, 0).astype(jnp.int8))
        out_n = f.out_n + active.astype(i32)

        p = f.phase
        # --- per-phase register updates ---
        is_out = active & (p == P_OUT)
        d = jnp.where(is_out, v, f.d)
        # one-hot ring write (scatter-free): slot x % R gets v on outdegree
        ring = jnp.where(
            is_out[:, None] & (ring_cols == (f.x % R)[:, None]),
            v[:, None], f.ring)

        is_ref = active & (p == P_REF)
        # one-hot ring read at (x - v) % R
        ref_sel = jnp.sum(
            jnp.where(ring_cols == ((f.x - v) % R)[:, None], ring, 0), axis=1)
        ref_outdeg = jnp.where(is_ref, ref_sel, f.ref_outdeg)

        is_bc = active & (p == P_BC)
        bc = jnp.where(is_bc, v, f.bc)
        blocks_rem = jnp.where(is_bc, v, f.blocks_rem)
        blk_idx = jnp.where(is_bc, 0, f.blk_idx)
        blocks_sum = jnp.where(is_bc, 0, f.blocks_sum)
        copy_flag = jnp.where(is_bc, True, f.copy_flag)
        # `copied` is stale from the previous node on every fresh-node path
        # (no-reference or ref == 0), not just at P_BC.
        copied = jnp.where(is_bc | is_ref | is_out, 0, f.copied)
        # bc == 0 means an even (empty) block list: the whole reference list
        # is tail-copied (native/src/bvgraph.hpp:79-81).
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
            blocks_done & (bc % 2 == 0), copied + ref_outdeg - blocks_sum, copied)

        is_ic = active & (p == P_IC)
        iv_rem = jnp.where(is_ic, v, f.iv_rem)

        is_il = active & (p == P_IL)
        length = v + min_interval
        extra = jnp.where(is_il, f.extra - length, f.extra)
        iv_rem = jnp.where(is_il, iv_rem - 1, iv_rem)

        is_fr = active & (p == P_FR)
        is_res = active & (p == P_RES)
        res_rem = jnp.where(is_fr | is_res, f.res_rem - 1, f.res_rem)

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
        # interval count decoded: ic > 0 -> interval pairs; ic == 0 -> the
        # residual tail (extra > 0 is guaranteed at P_IC entry).
        nxt = jnp.where(is_ic, jnp.where(v > 0, P_IS, P_FR), nxt)
        nxt = jnp.where(active & (p == P_IS), P_IL, nxt)
        nxt = jnp.where(
            is_il,
            jnp.where(iv_rem > 0, P_IS, jnp.where(extra > 0, P_FR, P_DONE_NODE)),
            nxt,
        )
        res_rem = jnp.where(nxt == P_FR, extra, res_rem)
        nxt = jnp.where(is_fr | is_res,
                        jnp.where(res_rem > 0, P_RES, P_DONE_NODE), nxt)

        node_done = nxt == P_DONE_NODE
        x = jnp.where(node_done, f.x + 1, f.x)
        nxt = jnp.where(node_done, jnp.where(x >= ends, P_DONE, P_OUT), nxt)
        phase = jnp.where(nxt == -2, p, nxt)

        return _FSM(state, ptr, x, phase, d, bc, blocks_rem, blk_idx,
                    blocks_sum, copy_flag, copied, ref_outdeg, extra, iv_rem,
                    res_rem, ring, out_vals, out_comps, out_n, f.step_i + 1)

    fsm = jax.lax.while_loop(cond, step, fsm)
    ok = fsm.phase == P_DONE
    return fsm.out_vals, fsm.out_comps, fsm.out_n, ok


@functools.partial(jax.jit, static_argnames=("params", "window"))
def seed_rings(params: CodecParams, tables: DecoderTables,
               states, ptrs, starts, window: int):
    """Builds the outdegree ring seeds for decode_blocks: for each lane,
    decodes the single Outdegree token of each of the `window` nodes
    preceding the block start (independent entries via the phase table,
    exactly what random access does — reference:
    src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58).

    states/ptrs: [L, window] phases of nodes starts[l]-window .. starts[l]-1
    (clamped to node 0; lanes ignore entries before node 0).
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
        v, _, _ = ans_decode_step(
            params, tables, states[:, j].astype(jnp.uint32),
            ptrs[:, j].astype(jnp.int32), comp, valid)
        ring = jnp.where(
            valid[:, None] & (ring_cols == (node % R)[:, None]),
            v.astype(jnp.int32)[:, None], ring)
    return ring

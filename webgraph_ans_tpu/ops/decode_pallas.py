"""Pallas/Mosaic TPU decode kernel: the whole grammar-FSM token decode
of decode_blocks (see ops/decode_jax.py) as ONE on-chip kernel with
VMEM-resident tables and per-lane stream segments.

Why this exists: the XLA while-loop kernel pays ~60us per lockstep
token step (per-op overhead + HBM row gathers). This kernel runs the
same FSM at ~1us/step by keeping EVERYTHING on-chip:

- per-lane stream SEGMENTS, not a sliding window: a decode lane's
  stream span [phase(end), phase(start)) is known before decode (the
  same phase table that seeds the lanes), so the wrapper pre-gathers
  each lane's whole segment into a [SMAXP_pairs, G] VMEM slab — the
  kernel never touches HBM for stream words, and 64-bit stream
  addressing falls out for free (segments are host-side i64; in-kernel
  pointers are segment-relative i32). Reference analog: the usize
  stream pointer of src/ans/decoder.rs:41-53.
- registers stay in the natural [A, 128] tiling (A = G/128 lane
  tiles); Mosaic crashes on in-loop [A,128]->[G,1] relayouts
  (tools/exp_pallas_bisect*.py), so all dynamic stream/LUT accesses
  are built from the two supported gather forms via
  ops/pallas_prims.py (where-trees + 8-sublane gathers + the
  role-reversal lane gather).
- 1D grid over 8-token step blocks; FSM registers persist across grid
  steps in VMEM scratch; token values stream out through an
  [8, A, 128] output block per grid step and component nibbles pack
  8-per-u32 exactly like the XLA kernel (same output contract).

The FSM semantics are a 1:1 port of decode_jax.decode_blocks
(executable spec: native/src/bvgraph.hpp read_successors; rANS step:
reference src/ans/decoder.rs:58-100) — the two kernels are
interchangeable and tested token-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .decode_jax import (B, LOWER_BOUND, NIB_SUM, NREG, P_BC, P_BLK, P_DONE,
                         P_FR, P_IC, P_IL, P_IS, P_OUT, P_REF, P_RES, P_SUM,
                         UNROLL, CodecParams, DecoderTables)
from .pallas_prims import gather8, lut_gather, select_tree, tree_select_rows8

# Scratch register rows (segment-relative pointer domain; no window
# registers — the stream slab replaces them).
(S_STATE, S_PTR, S_LEFT, S_PHASE, S_D, S_BC, S_BREM, S_BIDX, S_BSUM,
 S_CPY, S_COPIED, S_REFD, S_EXTRA, S_IVREM, S_RESREM, S_OUTN,
 S_XMOD) = range(17)
NSREG = 17
# aux-mode registers, appended AFTER the outdegree ring (rows
# NSREG+R .. NSREG+R+6): absolute node id, running residual value,
# interval element count, interval left/end tracker, first-interval
# flag, tail length (see decode_jax.decode_blocks emit_aux).
NAUX = 6
_AUX_KEYS = ("x", "prevres", "ivsum", "ivl", "fiv", "tail")


def _pl():
    from jax.experimental import pallas as pl          # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu   # noqa: PLC0415
    return pl, pltpu


def build_pallas_lut(params: CodecParams, lut_np: np.ndarray):
    """Repacks the decode LUT [slots, 2] into the kernel's two-bank
    [H, 256] i32 layout: flat slot s -> row s>>7, lane s&127; bank 0 =
    freq|cumul<<16, bank 1 = sym|folds<<16. H is padded to a multiple
    of 8 sublanes. Returns (lut [H, 256] i32, nrows).

    Takes the HOST copy of the decode LUT (graph_decode keeps one):
    fetching the device copy back would poison axon dispatch (see
    decode_jax.row_gather)."""
    lut = np.asarray(lut_np)                           # [S, 2] u32
    slots = lut.shape[0]
    nrows = -(-slots // 128)
    h = -(-nrows // 8) * 8
    packed = np.zeros((h, 256), np.uint32)
    flat0 = np.zeros(h * 128, np.uint32)
    flat1 = np.zeros(h * 128, np.uint32)
    flat0[:slots] = lut[:, 0]
    flat1[:slots] = lut[:, 1]
    packed[:, 0:128] = flat0.reshape(h, 128)
    packed[:, 128:256] = flat1.reshape(h, 128)
    return jnp.asarray(packed.view(np.int32)), nrows


def plan_segments(entry_ptr: np.ndarray, end_ptr: np.ndarray,
                  max_folds: int):
    """Per-lane stream segments: lane l touches words
    [end_ptr[l], entry_ptr[l]) (phases descend in node order), plus up
    to 1+2*max_folds words of clamped UNDER-reads from the loc
    extraction. Returns (seg_base_pair i64 [L], smaxp) with smaxp
    rounded so the group count is a power of two (cheap where-trees).
    """
    entry_ptr = np.asarray(entry_ptr, np.int64)
    end_ptr = np.asarray(end_ptr, np.int64)
    lo_pair = np.maximum(end_ptr - (1 + 2 * max_folds), 0) >> 1
    hi_pair = np.maximum(entry_ptr - 1, 0) >> 1
    need = int(np.maximum(hi_pair - lo_pair + 1, 1).max())
    smaxp = 8
    while smaxp < need:
        smaxp *= 2
    return lo_pair, smaxp


@functools.partial(jax.jit, static_argnames=("smaxp", "gpad"))
def build_slab(stream_rows, seg_base_pair, smaxp: int, gpad: int):
    """Gathers each lane's stream segment into the kernel slab
    [nch, smaxp, gpad] i32 (nch = chunk count, lanes split contiguously
    into nch groups of gpad): slab[c, j, l] = packed pair
    seg_base_pair[c*gpad + l] + j (clamped to the stream).
    seg_base_pair [nch * gpad] is i64-safe."""
    pairs = stream_rows.reshape(-1)
    npairs = pairs.shape[0]
    nch = seg_base_pair.shape[0] // gpad
    base = seg_base_pair.reshape(nch, 1, gpad)
    j = jnp.arange(smaxp, dtype=seg_base_pair.dtype)[None, :, None]
    idx = jnp.clip(base + j, 0, npairs - 1)
    slab = pairs[idx]
    return jax.lax.bitcast_convert_type(slab, jnp.int32)


def _per_comp_u32(comp_eq, params: CodecParams, field: int, shape):
    """comp-indexed u32 constant via a 9-way where chain; comp_eq[c]
    are precomputed [A,128] masks."""
    out = jnp.full(shape, np.uint32(params[0][field]), jnp.uint32)
    for c in range(1, 9):
        out = jnp.where(comp_eq[c], np.uint32(params[c][field]), out)
    return out


def _ans_step(params: CodecParams, lut, nrows: int, slab_ref,
              state, ptr, comp, active, gpad: int):
    """One rANS decode step on [A,128] registers (port of
    decode_jax.ans_decode_step; reference src/ans/decoder.rs:58-87).
    state u32, ptr i32 segment-relative words. Returns
    (value u32, state, ptr)."""
    A = state.shape[0]
    mf = params[10]
    smaxp = slab_ref.shape[1]
    ngrp = smaxp // 8
    comp_eq = {c: comp == c for c in range(1, 9)}
    shape = state.shape
    offset = _per_comp_u32(comp_eq, params, 0, shape)
    log_m = _per_comp_u32(comp_eq, params, 1, shape)
    mask = _per_comp_u32(comp_eq, params, 2, shape)
    radix = _per_comp_u32(comp_eq, params, 3, shape)
    fold_off = _per_comp_u32(comp_eq, params, 4, shape)
    radix_mask = (jnp.uint32(1) << radix) - jnp.uint32(1)

    slot = state & mask
    idx = (offset + slot).astype(jnp.int32)

    # A token's refills read the consecutive words
    # [ptr-1-2*mf, ptr-1]: extract those mf+1 pairs once per token
    # (from the ngroups-deep slab via where-trees + sublane gathers),
    # then each refill selects among them.
    pair_lo = jnp.maximum(ptr - (1 + 2 * mf), 0) >> 1
    nspan = 1 + (7 + mf) // 8          # 8-pair groups a loc span covers

    fcs, sfs = [], []
    locs_t = [[] for _ in range(mf + 1)]
    for a in range(A):
        row = lut_gather(lut, idx[a:a + 1, :], nrows)   # [1, 256]
        fcs.append(row[:, 0:128])
        sfs.append(row[:, 128:256])
        plo = pair_lo[a:a + 1, :]
        g0 = jnp.minimum(plo >> 3, ngrp - 1)
        tile = slab_ref[0, :, a * 128:(a + 1) * 128]
        grps = [tree_select_rows8(tile, jnp.minimum(g0 + k, ngrp - 1),
                                  ngrp) for k in range(nspan)]
        base7 = plo & 7
        for j in range(mf + 1):
            # pair plo+j sits in group g0 + (base7+j)//8 at sublane
            # (base7+j)&7; group index is per-lane dynamic only through
            # the straddle bit(s)
            cands = [gather8(grps[k], base7 + j) for k in range(nspan)]
            lj = (cands[0] if nspan == 1
                  else select_tree(cands, (base7 + j) >> 3))
            locs_t[j].append(lj)
    fc = jax.lax.bitcast_convert_type(
        jnp.concatenate(fcs, axis=0), jnp.uint32)
    sf = jax.lax.bitcast_convert_type(
        jnp.concatenate(sfs, axis=0), jnp.uint32)
    locs = [jax.lax.bitcast_convert_type(
        jnp.concatenate(locs_t[j], axis=0), jnp.uint32)
        for j in range(mf + 1)]

    freq = fc & jnp.uint32(0xFFFF)
    cumul = fc >> np.uint32(16)
    sym = sf & jnp.uint32(0xFFFF)
    folds = sf >> np.uint32(16)
    # unsigned min is not lowered by Mosaic; the shift fits i32
    sh = jnp.minimum((folds * radix).astype(jnp.int32), 31)
    prefix = (sym - fold_off * folds) << sh.astype(jnp.uint32)

    def refill(s, p, a):
        need = a & (s < LOWER_BOUND)
        new_p = p - need.astype(p.dtype)
        if len(locs) == 1:
            pair = locs[0]
        else:
            jsel = jnp.clip((new_p >> 1) - pair_lo, 0, len(locs) - 1)
            pair = select_tree(locs, jsel)
        word = jnp.where((new_p & 1) == 1, pair >> np.uint32(16),
                         pair & jnp.uint32(0xFFFF))
        s = jnp.where(need, (s << np.uint32(B)) | word, s)
        return s, jnp.where(need, new_p, p)

    new_state = (state >> log_m) * freq + slot - cumul
    new_state, new_ptr = refill(new_state, ptr, active)

    fold = jnp.zeros_like(state)
    folds_left = jnp.where(active, folds, 0)
    for _ in range(mf):
        a = folds_left > 0
        new_state, new_ptr = refill(new_state, new_ptr, a)
        fold = jnp.where(a, (fold << radix) | (new_state & radix_mask),
                         fold)
        new_state = jnp.where(a, new_state >> radix, new_state)
        new_state, new_ptr = refill(new_state, new_ptr, a)
        folds_left = folds_left - a.astype(folds_left.dtype)

    value = prefix | fold
    state = jnp.where(active, new_state, state)
    ptr = jnp.where(active, new_ptr, ptr)
    return value, state, ptr


def _fsm_step(params: CodecParams, lut, nrows: int, slab_ref, regs,
              window: int, min_interval: int, gpad: int,
              emit_aux: bool = False):
    """One grammar-FSM token step on the register tuple (1:1 port of
    decode_jax.decode_blocks one_step, including emit_aux mode). regs is
    a dict of [A,128] i32 arrays (state is u32). Returns
    (regs, value u32, aux1 u32|None, aux2 u32|None, nibble u32)."""
    i32 = jnp.int32
    R = window + 1
    p = regs["phase"]
    active = p != P_DONE
    is_sum = active & (p == P_SUM) if emit_aux else jnp.zeros(
        p.shape, bool)
    dec_active = active & ~is_sum if emit_aux else active
    res_rem_pre = regs["resrem"]
    blocks_sum_pre = regs["bsum"]
    copied_pre = regs["copied"]
    cpy_pre = regs["cpy"]
    comp = jnp.minimum(p, P_RES)
    v_u, state, ptr = _ans_step(
        params, lut, nrows, slab_ref, regs["state"], regs["ptr"], comp,
        dec_active, gpad)
    vu = jnp.where(dec_active, v_u, jnp.uint32(0))
    nib = jnp.where(dec_active, jnp.minimum(p, P_RES).astype(jnp.uint32),
                    jnp.where(is_sum, jnp.uint32(NIB_SUM),
                              jnp.uint32(0xF)))
    v = jax.lax.bitcast_convert_type(v_u, i32)

    xmod = regs["xmod"]
    d, bc = regs["d"], regs["bc"]
    blocks_rem, blk_idx, blocks_sum = regs["brem"], regs["bidx"], regs["bsum"]
    copy_flag = regs["cpy"]          # i32 0/1: bool where trips Mosaic
    copied, ref_outdeg = regs["copied"], regs["refd"]
    extra, iv_rem, res_rem = regs["extra"], regs["ivrem"], regs["resrem"]
    ring = regs["ring"]                                  # list of R rows

    is_out = active & (p == P_OUT)
    d = jnp.where(is_out, v, d)
    ring = [jnp.where(is_out & (xmod == k), v, ring[k]) for k in range(R)]

    is_ref = active & (p == P_REF)
    # ref slot = (x - v) mod R with 0 < v <= window < R on real streams
    rsel = xmod - v
    rsel = jnp.where(rsel < 0, rsel + R, rsel)
    rsel = jnp.clip(rsel, 0, R - 1)
    ref_sel = select_tree(ring, rsel) if R > 1 else ring[0]
    ref_outdeg = jnp.where(is_ref, ref_sel, ref_outdeg)

    is_bc = active & (p == P_BC)
    bc = jnp.where(is_bc, v, bc)
    blocks_rem = jnp.where(is_bc, v, blocks_rem)
    blk_idx = jnp.where(is_bc, 0, blk_idx)
    blocks_sum = jnp.where(is_bc, 0, blocks_sum)
    copy_flag = copy_flag | is_bc.astype(i32)
    copied = jnp.where(is_bc | is_ref | is_out, 0, copied)
    copied = jnp.where(is_bc & (v == 0), ref_outdeg, copied)

    is_blk = active & (p == P_BLK)
    b = v + (blk_idx > 0).astype(i32)
    blocks_sum = jnp.where(is_blk, blocks_sum + b, blocks_sum)
    copied = jnp.where(is_blk & (copy_flag != 0), copied + b, copied)
    copy_flag = jnp.where(is_blk, 1 - copy_flag, copy_flag)
    blk_idx = jnp.where(is_blk, blk_idx + 1, blk_idx)
    blocks_rem = jnp.where(is_blk, blocks_rem - 1, blocks_rem)
    blocks_done = is_blk & (blocks_rem == 0)
    copied = jnp.where(blocks_done & ((bc & 1) == 0),
                       copied + ref_outdeg - blocks_sum, copied)

    is_ic = active & (p == P_IC)
    iv_rem = jnp.where(is_ic, v, iv_rem)

    is_il = active & (p == P_IL)
    extra = jnp.where(is_il, extra - (v + min_interval), extra)
    iv_rem = jnp.where(is_il, iv_rem - 1, iv_rem)

    is_fr = active & (p == P_FR)
    is_res = active & (p == P_RES)
    res_rem = jnp.where(is_fr | is_res, res_rem - 1, res_rem)

    if emit_aux:
        # per-token reconstruction fields (decode_jax.decode_blocks
        # emit_aux docstring); all i32
        is_is = active & (p == P_IS)
        x = regs["x"]
        prevres0 = regs["prevres"]
        ivsum0 = jnp.where(is_out, 0, regs["ivsum"])
        ivl0 = regs["ivl"]
        fiv0 = regs["fiv"]
        n2i = (v >> 1) ^ -(v & 1)          # nat2int
        resval = jnp.where(is_fr, x + n2i, prevres0 + v + 1)
        prevres = jnp.where(is_fr | is_res, resval, prevres0)
        left_iv = jnp.where(fiv0 != 0, x + n2i, ivl0 + 1 + v)
        ilen = v + min_interval
        ivl = jnp.where(is_is, left_iv,
                        jnp.where(is_il, ivl0 + ilen, ivl0))
        fiv = jnp.where(is_ic, 1, jnp.where(is_is, 0, fiv0))
        ivsum = jnp.where(is_il, ivsum0 + ilen, ivsum0)
        tail = jnp.where(is_out, 0, regs["tail"])
        tail = jnp.where(is_bc & (v == 0), ref_outdeg, tail)
        tail = jnp.where(
            blocks_done,
            jnp.where(bc % 2 == 0, ref_outdeg - blocks_sum, 0), tail)
        aux1 = jnp.where(is_blk, blocks_sum_pre, 0)
        aux2 = jnp.where(is_blk, (copied_pre << 1) | cpy_pre, 0)
        aux1 = jnp.where(is_is | is_il,
                         jnp.where(is_is, left_iv, ivl0), aux1)
        aux2 = jnp.where(is_is | is_il, copied + ivsum0, aux2)
        aux1 = jnp.where(is_fr | is_res, resval, aux1)
        aux2 = jnp.where(is_fr | is_res, d - res_rem_pre, aux2)
        aux1 = jnp.where(is_sum, ivsum0, aux1)
        aux2 = jnp.where(is_sum, tail, aux2)
        a1u = jax.lax.bitcast_convert_type(aux1, jnp.uint32)
        a2u = jax.lax.bitcast_convert_type(aux2, jnp.uint32)
        vu = jnp.where(is_sum,
                       jax.lax.bitcast_convert_type(copied, jnp.uint32),
                       vu)
    else:
        a1u = a2u = None

    P_DONE_NODE = -1
    enter_tail = ((is_out & (v > 0) & (window == 0))
                  | (is_ref & (v == 0))
                  | (is_bc & (v == 0))
                  | blocks_done)
    extra = jnp.where(enter_tail, d - copied, extra)

    def tail_phase(extra_v):
        if min_interval != 0:
            return jnp.where(extra_v > 0, P_IC, P_DONE_NODE)
        return jnp.where(extra_v > 0, P_FR, P_DONE_NODE)

    L_shape = p.shape
    nxt = jnp.full(L_shape, -2, i32)
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
    nxt = jnp.where(is_ic, jnp.where(v > 0, P_IS, P_FR), nxt)
    nxt = jnp.where(active & (p == P_IS), P_IL, nxt)
    nxt = jnp.where(
        is_il,
        jnp.where(iv_rem > 0, P_IS,
                  jnp.where(extra > 0, P_FR, P_DONE_NODE)),
        nxt)
    res_rem = jnp.where(nxt == P_FR, extra, res_rem)
    nxt = jnp.where(is_fr | is_res,
                    jnp.where(res_rem > 0, P_RES, P_DONE_NODE), nxt)

    node_done = nxt == P_DONE_NODE
    left = jnp.where(node_done, regs["left"] - 1, regs["left"])
    xmod = jnp.where(node_done, xmod + 1, xmod)
    xmod = jnp.where(xmod >= R, 0, xmod)
    if emit_aux:
        # node end -> one summary pseudo-step, then the next node
        nxt = jnp.where(node_done, P_SUM, nxt)
        nxt = jnp.where(is_sum, jnp.where(left <= 0, P_DONE, P_OUT), nxt)
    else:
        nxt = jnp.where(node_done,
                        jnp.where(left <= 0, P_DONE, P_OUT), nxt)
    phase = jnp.where(nxt == -2, p, nxt)

    out = dict(state=state, ptr=ptr, left=left, phase=phase, d=d, bc=bc,
               brem=blocks_rem, bidx=blk_idx, bsum=blocks_sum,
               cpy=copy_flag, copied=copied, refd=ref_outdeg,
               extra=extra, ivrem=iv_rem, resrem=res_rem,
               outn=regs["outn"] + dec_active.astype(i32), xmod=xmod,
               ring=ring)
    if emit_aux:
        out.update(x=jnp.where(node_done, regs["x"] + 1, regs["x"]),
                   prevres=prevres, ivsum=ivsum, ivl=ivl, fiv=fiv,
                   tail=tail)
    return out, vu, a1u, a2u, nib


_REG_KEYS = ("state", "ptr", "left", "phase", "d", "bc", "brem", "bidx",
             "bsum", "cpy", "copied", "refd", "extra", "ivrem", "resrem",
             "outn", "xmod")


def _regs_from_tuple(t, R, emit_aux: bool = False):
    regs = dict(zip(_REG_KEYS, t[:NSREG]))
    regs["state"] = jax.lax.bitcast_convert_type(regs["state"], jnp.uint32)
    regs["ring"] = list(t[NSREG:NSREG + R])
    if emit_aux:
        regs.update(zip(_AUX_KEYS, t[NSREG + R:NSREG + R + NAUX]))
    return regs


def _regs_to_tuple(regs, emit_aux: bool = False):
    i32state = jax.lax.bitcast_convert_type(regs["state"], jnp.int32)
    t = ((i32state,) + tuple(regs[k] for k in _REG_KEYS[1:])
         + tuple(regs["ring"]))
    if emit_aux:
        t = t + tuple(regs[k] for k in _AUX_KEYS)
    return t


@functools.partial(
    jax.jit,
    static_argnames=("params", "window", "min_interval", "cap",
                     "interpret", "emit_aux"))
def decode_blocks_pallas(params: CodecParams, lut, slab, init_regs,
                         window: int, min_interval: int, cap: int,
                         interpret: bool = False, emit_aux: bool = False):
    """Grammar-FSM token decode as one Pallas kernel. Same contract as
    decode_jax.decode_blocks: returns (out [cap + cap//8, nch*G] u32,
    counts [nch*G] i32, ok [nch*G] bool) where G = init_regs.shape[3]
    * 128; row s < cap holds token values of lockstep step s, rows
    cap + s//8 the component nibbles (0xF on finished lanes).

    CHUNKED streams: the kernel grid is (nch, cap//UNROLL); chunk c
    decodes lanes [c*G, (c+1)*G) with its own [smaxp, G] stream slab
    streamed HBM->VMEM per chunk by the Pallas pipeline. Total stream
    size is therefore bounded by HBM, not VMEM — only ONE chunk's slab
    is VMEM-resident at a time (the VMEM ceiling VERDICT r02 flagged).

    init_regs [nch, NSREG + window + 1 (+6 aux rows), A, 128] i32 comes
    from make_init_regs_device (pad_to_lanes = nch*G); slab
    [nch, smaxp, G] from build_slab; lut from build_pallas_lut. cap must
    be a multiple of 8.

    emit_aux=True: reconstruction mode (see decode_jax.decode_blocks) —
    out grows to [3*cap + cap//8, nch*G] with aux rows at cap..3cap, and
    init_regs must carry the aux register rows
    (make_init_regs_device(emit_aux=True))."""
    pl, pltpu = _pl()
    assert cap % UNROLL == 0
    nch, NR, A, _ = init_regs.shape
    R = window + 1
    assert NR == NSREG + R + (NAUX if emit_aux else 0), \
        "init_regs rows do not match emit_aux mode"
    G = A * 128
    smaxp = slab.shape[1]
    n_val_outs = 3 if emit_aux else 1

    def kernel(lut_ref, slab_ref, init_ref, *out_refs):
        vrefs = out_refs[:n_val_outs]
        nibs_ref, fin_ref, regs_sc = out_refs[n_val_outs:]
        pid = pl.program_id(1)

        @pl.when(pid == 0)
        def _init():
            regs_sc[:] = init_ref[0]

        lutv = lut_ref[:]

        def substep(sub, t):
            regs = _regs_from_tuple(t, R, emit_aux)
            regs, vu, a1u, a2u, nib = _fsm_step(
                params, lutv, nrows_of(params), slab_ref, regs, window,
                min_interval, G, emit_aux)
            cpk = t[-1]
            shift = (jnp.uint32(4) * sub.astype(jnp.uint32))
            cpk = ((cpk & ~(jnp.uint32(0xF) << shift))
                   | ((nib & jnp.uint32(0xF)) << shift))
            vrefs[0][0, pl.ds(sub, 1), :, :] = vu[None, :, :]
            if emit_aux:
                vrefs[1][0, pl.ds(sub, 1), :, :] = a1u[None, :, :]
                vrefs[2][0, pl.ds(sub, 1), :, :] = a2u[None, :, :]
            return _regs_to_tuple(regs, emit_aux) + (cpk,)

        t0 = tuple(regs_sc[i, :, :] for i in range(NR))
        t0 = t0 + (jnp.full((A, 128), 0xFFFFFFFF, jnp.uint32),)
        t = jax.lax.fori_loop(0, UNROLL, substep, t0)
        for i in range(NR):
            regs_sc[i, :, :] = t[i]
        nibs_ref[:] = jax.lax.bitcast_convert_type(
            t[-1], jnp.int32)[None, None, :, :]
        fin_ref[0, 0, :, :] = t[S_OUTN_IDX]
        fin_ref[0, 1, :, :] = t[S_PHASE_IDX]

    S_OUTN_IDX = S_OUTN
    S_PHASE_IDX = S_PHASE

    val_spec = pl.BlockSpec((1, UNROLL, A, 128), lambda c, i: (c, i, 0, 0),
                            memory_space=pltpu.VMEM)
    val_shape = jax.ShapeDtypeStruct((nch, cap, A, 128), jnp.uint32)
    res = pl.pallas_call(
        kernel,
        grid=(nch, cap // UNROLL),
        in_specs=[
            pl.BlockSpec(lut.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, smaxp, G), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NR, A, 128), lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[val_spec] * n_val_outs + [
            pl.BlockSpec((1, 1, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, A, 128), lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[val_shape] * n_val_outs + [
            jax.ShapeDtypeStruct((nch, cap // UNROLL, A, 128), jnp.int32),
            jax.ShapeDtypeStruct((nch, 2, A, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NR, A, 128), jnp.int32)],
        interpret=interpret,
    )(lut, slab, init_regs)
    vrows, nibs, fin = res[:n_val_outs], res[n_val_outs], res[n_val_outs + 1]

    # chunk-major lanes -> one flat lane axis (lane c*G + a*128 + j)
    out = jnp.concatenate(
        [jnp.transpose(vr, (1, 0, 2, 3)).reshape(cap, nch * G)
         for vr in vrows]
        + [jax.lax.bitcast_convert_type(
            jnp.transpose(nibs, (1, 0, 2, 3)), jnp.uint32).reshape(
            cap // UNROLL, nch * G)], axis=0)
    counts = fin[:, 0].reshape(nch * G)
    ok = fin[:, 1].reshape(nch * G) == P_DONE
    return out, counts, ok


def nrows_of(params: CodecParams) -> int:
    """LUT row count for the packed [H, 256] table."""
    return -(-max(params[9], 1) // 128)


def make_init_regs_device(states, rel_ptrs, starts, ends, ring,
                          window: int, pad_to_lanes: int | None = None,
                          num_chunks: int = 1, emit_aux: bool = False):
    """Device-side make_init_regs: same layout, built with jnp ops so
    the decode plan never reads device data back to the host (on the
    axon relay ANY device->host fetch permanently degrades dispatch to
    ~27 ms/call; on real TPU serving, host syncs in the plan path are
    simply wasted latency). `ring` may be a device array (seed_rings
    output); states/rel_ptrs/starts/ends may be host or device.
    pad_to_lanes (a multiple of 128 * num_chunks) pads with finished
    lanes beyond the default 128-multiple. Returns
    [num_chunks, NSREG + window + 1, lanes_per_chunk // 128, 128] —
    chunk c covers lanes [c * lanes_per_chunk, (c+1) * lanes_per_chunk)
    of the flat lane order."""
    states = jnp.asarray(states)
    rel_ptrs = jnp.asarray(rel_ptrs, jnp.int32)
    # node ids fit i32 (TpuGraphDecoder guards num_nodes < 2^31)
    starts = jnp.asarray(np.asarray(starts).astype(np.int64)
                         .astype(np.int32))
    ends = jnp.asarray(np.asarray(ends).astype(np.int64).astype(np.int32))
    ring = jnp.asarray(ring, jnp.int32)
    L = states.shape[0]
    R = window + 1
    quantum = 128 * num_chunks
    gpad = -(-max(L, 1) // quantum) * quantum
    if pad_to_lanes is not None:
        if pad_to_lanes % quantum or pad_to_lanes < gpad:
            raise ValueError(
                f"pad_to_lanes must be a multiple of {quantum} >= {gpad}")
        gpad = pad_to_lanes
    A = gpad // (128 * num_chunks)
    NR = NSREG + R + (NAUX if emit_aux else 0)
    regs = jnp.zeros((NR, gpad), jnp.int32)

    def put(row, vals):
        return regs.at[row, :L].set(vals)

    regs = put(S_STATE, jax.lax.bitcast_convert_type(
        states.astype(jnp.uint32), jnp.int32))
    regs = put(S_PTR, rel_ptrs)
    regs = put(S_LEFT, (ends - starts).astype(jnp.int32))
    regs = regs.at[S_PHASE, :].set(P_DONE)
    regs = put(S_PHASE, jnp.where(starts < ends, P_OUT,
                                  P_DONE).astype(jnp.int32))
    regs = put(S_XMOD, (starts % R).astype(jnp.int32))
    regs = regs.at[NSREG:NSREG + R, :L].set(ring.T)
    if emit_aux:
        regs = put(NSREG + R, starts.astype(jnp.int32))  # absolute node
    return jnp.transpose(
        regs.reshape(NR, num_chunks, A, 128), (1, 0, 2, 3))


def make_init_regs(states, rel_ptrs, starts, ends, ring, window: int,
                   num_chunks: int = 1):
    """Initial register file [num_chunks, NSREG + window + 1, A, 128]
    i32 for decode_blocks_pallas (host-side numpy). Lane l = (c, a, j)
    at c*A*128 + a*128 + j; lanes are padded to a multiple of
    128*num_chunks with finished lanes. rel_ptrs are SEGMENT-relative
    word pointers (see plan_segments). ring is the seed from
    decode_jax.seed_rings, [L, window+1]."""
    states = np.asarray(states, np.uint32)
    rel_ptrs = np.asarray(rel_ptrs, np.int32)
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    ring = np.asarray(ring, np.int32)
    L = len(states)
    R = window + 1
    quantum = 128 * num_chunks
    gpad = -(-max(L, 1) // quantum) * quantum
    A = gpad // quantum
    NR = NSREG + R
    regs = np.zeros((NR, gpad), np.int32)

    def put(row, vals):
        regs[row, :L] = vals

    put(S_STATE, states.view(np.int32))
    put(S_PTR, rel_ptrs)
    put(S_LEFT, (ends - starts).astype(np.int32))
    put(S_PHASE, np.where(starts < ends, P_OUT, P_DONE).astype(np.int32))
    put(S_XMOD, (starts % R).astype(np.int32))
    regs[S_PHASE, L:] = P_DONE
    for k in range(R):
        put(NSREG + k, ring[:, k])
    return np.ascontiguousarray(
        regs.reshape(NR, num_chunks, A, 128).transpose(1, 0, 2, 3))

"""Merged-emit Pallas kernel: BvGraph decode + successor reconstruction
fused into ONE on-chip FSM.

Where the token kernel (ops/decode_pallas.py) emits (component, value)
tokens for a separate reconstruction program, this kernel performs the
reconstruction IN-KERNEL and emits FINAL successor lists: its step
machine runs the rANS grammar FSM (one token per step, stalling on
back-pressure) into three bounded register QUEUES (copy runs, interval
runs, residual values), while an emission side 3-way-merges the queue
heads by value — copy values are read back from a T-row VMEM ring of
the lane's OWN already-emitted rows (within one lane, every ancestor of
a node is fully emitted before the node starts, so reference chains of
ANY depth resolve sequentially with no cross-step passes). One final
sorted successor element leaves per step.

Nodes the stream cannot resolve in-kernel emit GROUPED with placeholder
rows instead and are finished by a small post-pass
(ops/emit_post.fixup_dirty_compact, via emit_post.postprocess):
- cross-lane parent (the node's reference target precedes the lane),
- ring overflow (copy source older than T output rows),
- queue overflow (more runs than queue capacity; the decoder sends the
  node's meta EARLY with a dirty flag instead of deadlocking).

Output contract (see ops/emit_post.py): per lane column, row codes
0=element 1=first(clean) 2=hole 3=refinfo(dirty first) 4=placeholder
5=empty-node 0xF=done, packed 8/word in the nib channel; `val` holds
the successor (or j / ref), `xch` the node id on marker rows.

Reference capability: webgraph BvGraph successor reconstruction
(executable spec native/src/bvgraph.hpp read_successors) + the rANS
decoder (reference src/ans/decoder.rs:58-100), fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .decode_jax import (P_BC, P_BLK, P_DONE, P_FR, P_IC, P_IL, P_IS, P_OUT,
                         P_REF, P_RES, UNROLL, CodecParams)
from .decode_pallas import NSREG  # noqa: F401  (kept for parity checks)
from .decode_pallas import _ans_step, nrows_of
from .pallas_prims import gather8, select_tree, tree_select_rows8

I32 = jnp.int32

# row codes (match ops/emit_post.py)
C_EL, C_FIRST, C_HOLE, C_REFINFO, C_PLACE, C_EMPTY = range(6)
C_DONE = 0xF

# queue capacities (register rows; over-capacity nodes go dirty via the
# early-meta rule, so these bound VMEM, not correctness)
QC, QI, QR, QN = 16, 16, 12, 4

# decode-side register rows
(D_STATE, D_PTR, D_LEFT, D_PHASE, D_D, D_BC, D_BREM, D_BIDX, D_BSUM,
 D_CPY, D_COPIED, D_REFD, D_EXTRA, D_IVREM, D_RESREM, D_XMOD, D_X,
 D_PREVRES, D_IVL, D_FIV, D_REF, D_METASENT,
 # emission-side rows
 E_ACTIVE, E_X, E_XMOD, E_D, E_REF, E_DIRTY, E_EMITTED, E_FIRST,
 E_PBASE, E_CCJ, E_CCLEFT, E_CSRC, E_CIVAL, E_CILEFT, E_DONEROW,
 E_LSTART, E_RSTART, E_MARKROW, E_MDIRTY,
 # queue counters
 N_QC, N_QI, N_QR, N_QN) = range(45)
NFIX = 45


def _layout(window: int):
    """Register-row layout: fixed rows, then the decode outdegree ring
    (R), emission base ring (R), emission dirty ring (R), then the
    queues (2 rows per entry)."""
    R = window + 1
    degring = NFIX
    basering = degring + R
    dirtyring = basering + R
    qc0 = dirtyring + R
    qi0 = qc0 + 2 * QC
    qr0 = qi0 + 2 * QI
    qn0 = qr0 + 2 * QR
    nreg = qn0 + 3 * QN
    return degring, basering, dirtyring, qc0, qi0, qr0, qn0, nreg


def _pl():
    from jax.experimental import pallas as pl          # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu   # noqa: PLC0415
    return pl, pltpu


def _qpush(t, q0, Q, cnt, do, a, b, c=None, width=2):
    """One-hot enqueue of (a, b[, c]) at position cnt where `do`;
    returns (t, new cnt). Entries are `width` consecutive rows."""
    t = list(t)
    for k in range(Q):
        sel = do & (cnt == k)
        t[q0 + width * k] = jnp.where(sel, a, t[q0 + width * k])
        t[q0 + width * k + 1] = jnp.where(sel, b, t[q0 + width * k + 1])
        if width > 2:
            t[q0 + width * k + 2] = jnp.where(sel, c,
                                              t[q0 + width * k + 2])
    return t, cnt + do.astype(I32)


def _qshift(t, q0, Q, cnt, do, width=2):
    """Dequeue the front entry where `do` (shift down); returns
    (t, new cnt)."""
    t = list(t)
    for k in range(Q - 1):
        for f in range(width):
            t[q0 + width * k + f] = jnp.where(
                do, t[q0 + width * (k + 1) + f], t[q0 + width * k + f])
    return t, cnt - do.astype(I32)


def _ring_sel(rows, idx):
    """R-way register-ring read by per-lane slot idx."""
    return select_tree(list(rows), idx) if len(rows) > 1 else rows[0]


def _ring_read(ring_sc, rowidx, T: int, A: int):
    """Per-lane dynamic read of the [T, A, 128] output ring at row
    rowidx [A, 128] (callers pre-mask validity)."""
    ngrp = T // 8
    parts = []
    for a in range(A):
        tile = ring_sc[:, a, :]
        ri = rowidx[a:a + 1, :] & (T - 1)
        grp = tree_select_rows8(tile, ri >> 3, ngrp)
        parts.append(gather8(grp, ri))
    return jnp.concatenate(parts, axis=0)


def _step(params: CodecParams, lut, slab_ref, ring_sc, t, window: int,
          min_interval: int, T: int, row_now, gpad: int,
          mark_deg: bool = False):
    """One merged-emit step. `t` is the register tuple; returns
    (t, out_val u32, out_x u32, code u32). mark_deg=True writes the
    popped node's OUTDEGREE into the xch channel on marker rows instead
    of its node id (steady-state mode: marker rows are layout-cached, so
    the id is known and the channel carries the per-rep decoded degree
    instead — see emit_post.post_steady)."""
    i32 = jnp.int32
    R = window + 1
    degring, basering, dirtyring, qc0, qi0, qr0, qn0, nreg = _layout(window)
    t = list(t)
    A = t[0].shape[0]
    shape = t[0].shape

    def g(i):
        return t[i]

    p = g(D_PHASE)
    active = p != P_DONE
    qc_n, qi_n, qr_n, qn_n = g(N_QC), g(N_QI), g(N_QR), g(N_QN)
    # done at step START: rows_used counts every row the lane touched,
    # including the one where its last element is emitted
    was_done = ~active & (g(E_ACTIVE) == 0) & (qn_n == 0)

    # ---------------- decode stall / early-meta ----------------
    meta_unsent = g(D_METASENT) == 0
    qfull_c = ((p == P_BC) | (p == P_BLK)) & (qc_n > QC - 2)
    qfull_i = (p == P_IL) & (qi_n > QI - 1)
    qfull_r = ((p == P_FR) | (p == P_RES)) & (qr_n > QR - 1)
    meta_phase = ((p == P_OUT) | (p == P_BC) | (p == P_BLK)
                  | (p == P_IL) | (p == P_FR))
    qfull_n = meta_phase & meta_unsent & (qn_n > QN - 1)
    stall = active & (qfull_c | qfull_i | qfull_r | qfull_n)
    # early dirty meta ONLY on true self-deadlock: the run queues are
    # full, the node's meta is unsent, and emission is idle waiting for
    # it (a congested queue with emission mid-node always drains; going
    # dirty there would smear dirt over perfectly resolvable nodes)
    early = active & meta_unsent & (qfull_c | qfull_i) \
        & (g(E_ACTIVE) == 0) & (qn_n == 0)
    # early dirty meta: (d, (ref<<10) | (1<<9) | tag)
    tagd = g(D_X) & 0xFF
    t, qn_n = _qpush(t, qn0, QN, qn_n, early,
                     g(D_D), (g(D_REF) << 10) | (1 << 9) | tagd,
                     jnp.zeros_like(tagd), width=3)
    metasent = jnp.where(early, 1, g(D_METASENT))

    dec_active = active & ~stall
    # ---------------- ANS decode + FSM ----------------
    comp = jnp.minimum(p, P_RES)
    v_u, state, ptr = _ans_step(params, lut, nrows_of(params), slab_ref,
                                jax.lax.bitcast_convert_type(
                                    g(D_STATE), jnp.uint32),
                                g(D_PTR), comp, dec_active, gpad)
    v = jax.lax.bitcast_convert_type(
        jnp.where(dec_active, v_u, jnp.uint32(0)), i32)

    x = g(D_X)
    d, bc = g(D_D), g(D_BC)
    brem, bidx, bsum = g(D_BREM), g(D_BIDX), g(D_BSUM)
    cpy, copied, refd = g(D_CPY), g(D_COPIED), g(D_REFD)
    extra, ivrem, resrem = g(D_EXTRA), g(D_IVREM), g(D_RESREM)
    xmod = g(D_XMOD)
    bsum_pre, copied_pre = bsum, copied

    is_out = dec_active & (p == P_OUT)
    d = jnp.where(is_out, v, d)
    degrows = [jnp.where(is_out & (xmod == k), v, g(degring + k))
               for k in range(R)]

    is_ref = dec_active & (p == P_REF)
    rsel = xmod - v
    rsel = jnp.where(rsel < 0, rsel + R, rsel)
    rsel = jnp.clip(rsel, 0, R - 1)
    refd = jnp.where(is_ref, _ring_sel(degrows, rsel), refd)
    refreg = jnp.where(is_out, 0, jnp.where(is_ref, v, g(D_REF)))

    is_bc = dec_active & (p == P_BC)
    bc = jnp.where(is_bc, v, bc)
    brem = jnp.where(is_bc, v, brem)
    bidx = jnp.where(is_bc, 0, bidx)
    bsum = jnp.where(is_bc, 0, bsum)
    cpy = cpy | is_bc.astype(i32)
    copied = jnp.where(is_bc | is_ref | is_out, 0, copied)
    copied = jnp.where(is_bc & (v == 0), refd, copied)

    is_blk = dec_active & (p == P_BLK)
    b = v + (bidx > 0).astype(i32)
    bsum = jnp.where(is_blk, bsum + b, bsum)
    blk_copy = is_blk & (cpy != 0)
    copied = jnp.where(blk_copy, copied + b, copied)
    cpy = jnp.where(is_blk, 1 - cpy, cpy)
    bidx = jnp.where(is_blk, bidx + 1, bidx)
    brem = jnp.where(is_blk, brem - 1, brem)
    blocks_done = is_blk & (brem == 0)
    tail_len = jnp.where(blocks_done & ((bc & 1) == 0), refd - bsum, 0)
    copied = jnp.where(blocks_done, copied + tail_len, copied)

    # copy-run enqueues: whole-list (bc==0), copy block, block tail
    enq_whole = is_bc & (v == 0) & (refd > 0)
    enq_blk = blk_copy & (b > 0)
    ca = jnp.where(enq_whole, 0, bsum_pre)
    cl = jnp.where(enq_whole, refd, b)
    t, qc_n = _qpush(t, qc0, QC, qc_n, enq_whole | enq_blk,
                     ca, cl | (tagd << 20))
    enq_tail = blocks_done & (tail_len > 0)
    t, qc_n = _qpush(t, qc0, QC, qc_n, enq_tail,
                     bsum, tail_len | (tagd << 20))

    is_ic = dec_active & (p == P_IC)
    ivrem = jnp.where(is_ic, v, ivrem)

    is_is = dec_active & (p == P_IS)
    n2i = (v >> 1) ^ -(v & 1)
    fiv0, ivl0 = g(D_FIV), g(D_IVL)
    left_iv = jnp.where(fiv0 != 0, x + n2i, ivl0 + 1 + v)
    ivl = jnp.where(is_is, left_iv, ivl0)
    fiv = jnp.where(is_ic, 1, jnp.where(is_is, 0, fiv0))

    is_il = dec_active & (p == P_IL)
    ilen = v + min_interval
    extra = jnp.where(is_il, extra - ilen, extra)
    ivrem = jnp.where(is_il, ivrem - 1, ivrem)
    ivl = jnp.where(is_il, ivl + ilen, ivl)
    t, qi_n = _qpush(t, qi0, QI, qi_n, is_il & (ilen > 0),
                     ivl - ilen, ilen | (tagd << 20))

    is_fr = dec_active & (p == P_FR)
    is_res = dec_active & (p == P_RES)
    resval = jnp.where(is_fr, x + n2i, g(D_PREVRES) + v + 1)
    prevres = jnp.where(is_fr | is_res, resval, g(D_PREVRES))
    resrem = jnp.where(is_fr | is_res, resrem - 1, resrem)
    t, qr_n = _qpush(t, qr0, QR, qr_n, is_fr | is_res, resval, tagd)

    # ---------------- next phase ----------------
    DN = -1
    enter_tail = ((is_out & (v > 0) & (window == 0))
                  | (is_ref & (v == 0)) | (is_bc & (v == 0)) | blocks_done)
    extra = jnp.where(enter_tail, d - copied, extra)

    def tail_phase(ev):
        if min_interval != 0:
            return jnp.where(ev > 0, P_IC, DN)
        return jnp.where(ev > 0, P_FR, DN)

    nxt = jnp.full(shape, -2, i32)
    nxt = jnp.where(is_out & (v == 0), DN, nxt)
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
    nxt = jnp.where(is_is, P_IL, nxt)
    nxt = jnp.where(is_il, jnp.where(ivrem > 0, P_IS,
                                     jnp.where(extra > 0, P_FR, DN)), nxt)
    resrem = jnp.where(nxt == P_FR, extra, resrem)
    nxt = jnp.where(is_fr | is_res,
                    jnp.where(resrem > 0, P_RES, DN), nxt)

    node_done = nxt == DN
    # meta: first residual, or node end without residuals
    push_meta = (is_fr | node_done) & (metasent == 0)
    t, qn_n = _qpush(t, qn0, QN, qn_n, push_meta,
                     d, (refreg << 10) | tagd, copied, width=3)
    metasent = jnp.where(push_meta, 1, metasent)
    metasent = jnp.where(node_done, 0, metasent)

    left = jnp.where(node_done, g(D_LEFT) - 1, g(D_LEFT))
    x = jnp.where(node_done, x + 1, x)
    xmod = jnp.where(node_done, xmod + 1, xmod)
    xmod = jnp.where(xmod >= R, 0, xmod)
    nxt = jnp.where(node_done, jnp.where(left <= 0, P_DONE, P_OUT), nxt)
    phase = jnp.where(nxt == -2, p, nxt)

    t[D_STATE] = jax.lax.bitcast_convert_type(state, i32)
    t[D_PTR] = ptr
    t[D_LEFT] = left
    t[D_PHASE] = phase
    t[D_D], t[D_BC], t[D_BREM], t[D_BIDX], t[D_BSUM] = d, bc, brem, bidx, bsum
    t[D_CPY], t[D_COPIED], t[D_REFD] = cpy, copied, refd
    t[D_EXTRA], t[D_IVREM], t[D_RESREM] = extra, ivrem, resrem
    t[D_XMOD], t[D_X] = xmod, x
    t[D_PREVRES], t[D_IVL], t[D_FIV] = prevres, ivl, fiv
    t[D_REF], t[D_METASENT] = refreg, metasent
    for k in range(R):
        t[degring + k] = degrows[k]

    # =================== emission substep ===================
    em_active = g(E_ACTIVE) != 0
    ex, exmod = g(E_X), g(E_XMOD)
    tagx = ex & 0xFF

    # ---- pop next node meta ----
    can_pop = ~em_active & (qn_n > 0)
    md = g(qn0)
    mp = g(qn0 + 1)
    mncop = g(qn0 + 2)
    mref = mp >> 10
    mdirty0 = (mp >> 9) & 1
    parent = ex - mref
    hasref = mref > 0
    psel = exmod - (mref % R if window > 0 else 0)
    psel = jnp.where(psel < 0, psel + R, psel)
    psel = jnp.clip(psel, 0, R - 1)
    baserows = [g(basering + k) for k in range(R)]
    dirtrows = [g(dirtyring + k) for k in range(R)]
    pbase = _ring_sel(baserows, psel)
    ptaint = _ring_sel(dirtrows, psel)
    crossl = hasref & (parent < g(E_LSTART))
    qc_front_tag = g(qc0 + 1) >> 20
    qc_match_pop = (qc_n > 0) & (qc_front_tag == tagx)
    firstsrc = pbase + g(qc0)
    # ring-overflow bound: the c-th copy is read at most
    # (non-copy elements) rows after its source entered the ring, so
    # only d - ncop (not d) extends the reach past the window distance
    tover = hasref & qc_match_pop & \
        ((row_now + md - mncop - firstsrc) > (T - UNROLL))
    dirty = (mdirty0 != 0) | (hasref & ((ptaint != 0) | crossl)) | tover
    # refinfo code carries the dirty cause for diagnostics:
    # 3 = queue overflow (early meta), 7 = cross-lane, 8 = taint, 9 = ring
    dcause = jnp.where(mdirty0 != 0, C_REFINFO,
                       jnp.where(hasref & crossl, 7,
                                 jnp.where(hasref & (ptaint != 0), 8, 9)))
    empty = md == 0
    t, qn_n = _qshift(t, qn0, QN, qn_n, can_pop, width=3)

    popped_clean = can_pop & ~empty & ~dirty
    popped_dirty = can_pop & ~empty & dirty
    popped_empty = can_pop & empty
    newbase = row_now + dirty.astype(i32)
    for k in range(R):
        selk = can_pop & (exmod == k)
        t[basering + k] = jnp.where(selk, newbase, t[basering + k])
        t[dirtyring + k] = jnp.where(selk, dirty.astype(i32),
                                     t[dirtyring + k])
    em_active2 = (can_pop & ~empty) | em_active
    e_d = jnp.where(can_pop, md, g(E_D))
    e_ref = jnp.where(can_pop, mref, g(E_REF))
    e_dirty = jnp.where(can_pop, dirty.astype(i32), g(E_DIRTY))
    e_emitted = jnp.where(can_pop, 0, g(E_EMITTED))
    e_first = jnp.where(can_pop, 1, g(E_FIRST))
    e_pbase = jnp.where(can_pop, pbase, g(E_PBASE))
    cc_left = jnp.where(can_pop, 0, g(E_CCLEFT))
    ci_left = jnp.where(can_pop, 0, g(E_CILEFT))
    # empty pop: node consumed entirely this step
    ex2 = jnp.where(popped_empty, ex + 1, ex)
    exmod2 = jnp.where(popped_empty, exmod + 1, exmod)
    exmod2 = jnp.where(exmod2 >= R, 0, exmod2)

    # ---- run activation (not on the refinfo/empty step) ----
    emit_now = em_active2 & ~popped_dirty & ~popped_empty
    tagx2 = jnp.where(can_pop, ex & 0xFF, tagx)
    qc_match = (qc_n > 0) & ((g(qc0 + 1) >> 20) == tagx2)
    act_c = emit_now & (cc_left == 0) & qc_match
    cc_j = jnp.where(act_c, g(qc0), g(E_CCJ))
    cc_left = jnp.where(act_c, g(qc0 + 1) & 0xFFFFF, cc_left)
    cc_src = jnp.where(act_c, e_pbase + g(qc0), g(E_CSRC))
    t, qc_n = _qshift(t, qc0, QC, qc_n, act_c)
    qi_match = (qi_n > 0) & ((g(qi0 + 1) >> 20) == tagx2)
    act_i = emit_now & (ci_left == 0) & qi_match
    ci_val = jnp.where(act_i, g(qi0), g(E_CIVAL))
    ci_left = jnp.where(act_i, g(qi0 + 1) & 0xFFFFF, ci_left)
    t, qi_n = _qshift(t, qi0, QI, qi_n, act_i)

    # ---- group-done signals (decode position checks) ----
    dx, dphase = t[D_X], t[D_PHASE]
    dec_past = dx > ex2
    dec_past_blk = dec_past | ((dx == ex2) & (dphase >= P_IC))
    dec_past_iv = dec_past | ((dx == ex2) & (dphase >= P_FR))
    qc_match2 = (qc_n > 0) & ((g(qc0 + 1) >> 20) == tagx2)
    qi_match2 = (qi_n > 0) & ((g(qi0 + 1) >> 20) == tagx2)
    cop_av = cc_left > 0
    cop_done = ~cop_av & ~qc_match2 & dec_past_blk
    iv_av = ci_left > 0
    iv_done = ~iv_av & ~qi_match2 & dec_past_iv
    qr_match = (qr_n > 0) & (g(qr0 + 1) == tagx2)
    res_av = qr_match
    res_done = ~res_av & dec_past

    # ---- heads & merge ----
    hc = _ring_read(ring_sc, cc_src, T, A)
    hi = ci_val
    hr = g(qr0)
    BIG = jnp.int32(0x7FFFFFFF)
    hc_k = jnp.where(emit_now & cop_av & (e_dirty == 0), hc, BIG)
    hi_k = jnp.where(emit_now & iv_av, hi, BIG)
    hr_k = jnp.where(emit_now & res_av, hr, BIG)
    gate = emit_now & (cop_av | cop_done) & (iv_av | iv_done) \
        & (res_av | res_done) & (e_dirty == 0)
    emit_c = gate & cop_av & (hc_k <= hi_k) & (hc_k <= hr_k)
    emit_i = gate & iv_av & ~emit_c & (hi_k <= hr_k)
    emit_r = gate & res_av & ~emit_c & ~emit_i
    # dirty grouped order: copies (placeholders), intervals, residuals
    dgate = emit_now & (e_dirty != 0)
    demit_c = dgate & cop_av
    demit_i = dgate & ~cop_av & cop_done & iv_av
    demit_r = dgate & ~cop_av & cop_done & ~iv_av & iv_done & res_av
    emit_c, emit_i, emit_r = (emit_c | demit_c, emit_i | demit_i,
                              emit_r | demit_r)
    emitted = emit_c | emit_i | emit_r

    out_v = jnp.where(emit_c, jnp.where(e_dirty != 0, cc_j, hc),
                      jnp.where(emit_i, hi, hr))
    cc_j = jnp.where(emit_c, cc_j + 1, cc_j)
    cc_src = jnp.where(emit_c, cc_src + 1, cc_src)
    cc_left = jnp.where(emit_c, cc_left - 1, cc_left)
    ci_val = jnp.where(emit_i, ci_val + 1, ci_val)
    ci_left = jnp.where(emit_i, ci_left - 1, ci_left)
    t, qr_n = _qshift(t, qr0, QR, qr_n, emit_r)

    e_emitted = e_emitted + emitted.astype(i32)
    node_fin = em_active2 & (e_emitted >= e_d) & emitted
    ex3 = jnp.where(node_fin, ex2 + 1, ex2)
    exmod3 = jnp.where(node_fin, exmod2 + 1, exmod2)
    exmod3 = jnp.where(exmod3 >= R, 0, exmod3)
    em_active3 = em_active2 & ~node_fin

    # ---- output row ----
    lane_done = (t[D_PHASE] == P_DONE) & ~em_active3 & (qn_n == 0)
    halo = ex < g(E_RSTART)     # halo nodes: emitted (ring-visible,
    code = jnp.full(shape, C_HOLE, i32)  # ancestors of real nodes) but
    code = jnp.where(emitted, jnp.where(  # never marked for the post
        emit_c & (e_dirty != 0), C_PLACE,
        jnp.where((e_first != 0) & (e_dirty == 0) & ~halo,
                  C_FIRST, C_EL)), code)
    code = jnp.where(popped_dirty & ~halo, dcause, code)
    code = jnp.where((popped_dirty | popped_empty) & halo, C_HOLE, code)
    code = jnp.where(popped_empty & ~halo, C_EMPTY, code)
    code = jnp.where(lane_done & ~emitted & ~can_pop, C_DONE, code)
    out_v = jnp.where(popped_dirty, e_ref, out_v)
    # node id at pop time (or, in mark_deg mode, the popped node's
    # outdegree); read only on marker rows
    out_x = md if mark_deg else ex
    e_first = jnp.where(emitted, 0, e_first)

    t[E_ACTIVE] = em_active3.astype(i32)
    t[E_X], t[E_XMOD] = ex3, exmod3
    t[E_D], t[E_REF], t[E_DIRTY] = e_d, e_ref, e_dirty
    t[E_EMITTED], t[E_FIRST], t[E_PBASE] = e_emitted, e_first, e_pbase
    t[E_CCJ], t[E_CCLEFT], t[E_CSRC] = cc_j, cc_left, cc_src
    t[E_CIVAL], t[E_CILEFT] = ci_val, ci_left
    t[E_DONEROW] = jnp.where(was_done, t[E_DONEROW], row_now + 1)
    # last non-halo marker (single-node/random-access extraction)
    mark_now = can_pop & ~halo
    t[E_MARKROW] = jnp.where(mark_now, row_now, t[E_MARKROW])
    t[E_MDIRTY] = jnp.where(mark_now,
                            dirty.astype(i32) | (empty.astype(i32) << 1),
                            t[E_MDIRTY])
    t[N_QC], t[N_QI], t[N_QR], t[N_QN] = qc_n, qi_n, qr_n, qn_n

    vu = jax.lax.bitcast_convert_type(out_v, jnp.uint32)
    xu = jax.lax.bitcast_convert_type(out_x, jnp.uint32)
    return t, vu, xu, code.astype(jnp.uint32), emitted


@functools.partial(
    jax.jit,
    static_argnames=("params", "window", "min_interval", "cap", "T",
                     "interpret", "mark_deg"))
def decode_emit_pallas(params: CodecParams, lut, slab, init_regs,
                       window: int, min_interval: int, cap: int,
                       T: int = 512, interpret: bool = False,
                       mark_deg: bool = False):
    """Merged-emit decode: returns (val [cap, nch*G] u32,
    xch [cap, nch*G] u32, nib [cap//8, nch*G] u32, rows_used [nch*G] i32,
    ok [nch*G] bool). Lane layout and chunking match
    decode_blocks_pallas. init_regs from make_emit_init_regs."""
    pl, pltpu = _pl()
    assert cap % UNROLL == 0 and T % 8 == 0
    nch, NR, A, _ = init_regs.shape
    R = window + 1
    assert NR == _layout(window)[-1], "init_regs rows mismatch"
    G = A * 128
    smaxp = slab.shape[1]

    def kernel(lut_ref, slab_ref, init_ref, val_ref, xch_ref, nib_ref,
               fin_ref, regs_sc, ring_sc):
        pid = pl.program_id(1)

        @pl.when(pid == 0)
        def _init():
            regs_sc[:] = init_ref[0]

        lutv = lut_ref[:]

        def substep(sub, carry):
            t = carry[:-1]
            cpk = carry[-1]
            row_now = pid * UNROLL + sub
            t2, vu, xu, code, emitted = _step(
                params, lutv, slab_ref, ring_sc, t, window, min_interval,
                T, row_now, G, mark_deg=mark_deg)
            shift = jnp.uint32(4) * sub.astype(jnp.uint32)
            cpk = ((cpk & ~(jnp.uint32(0xF) << shift))
                   | ((code & jnp.uint32(0xF)) << shift))
            val_ref[0, pl.ds(sub, 1), :, :] = vu[None, :, :]
            xch_ref[0, pl.ds(sub, 1), :, :] = xu[None, :, :]
            # output ring: row == global step, uniform across lanes
            ring_sc[pl.ds(row_now & (T - 1), 1), :, :] = \
                jax.lax.bitcast_convert_type(vu, jnp.int32)[None, :, :]
            return tuple(t2) + (cpk,)

        t0 = tuple(regs_sc[i, :, :] for i in range(NR))
        t0 = t0 + (jnp.full((A, 128), 0xFFFFFFFF, jnp.uint32),)
        t = jax.lax.fori_loop(0, UNROLL, substep, t0)
        for i in range(NR):
            regs_sc[i, :, :] = t[i]
        nib_ref[:] = jax.lax.bitcast_convert_type(
            t[-1], jnp.int32)[None, None, :, :]
        fin_ref[0, 0, :, :] = t[E_DONEROW]
        done = ((t[D_PHASE] == P_DONE) & (t[E_ACTIVE] == 0)
                & (t[N_QN] == 0)).astype(jnp.int32)
        fin_ref[0, 1, :, :] = done
        # rows 2-3: last non-halo marker (random-access extraction);
        # rows 4-7: diagnostics
        fin_ref[0, 2, :, :] = t[E_MARKROW]
        fin_ref[0, 3, :, :] = t[E_MDIRTY]
        fin_ref[0, 4, :, :] = t[D_X]
        fin_ref[0, 5, :, :] = t[E_X]
        fin_ref[0, 6, :, :] = t[E_ACTIVE] * 1000000 + t[E_EMITTED]
        fin_ref[0, 7, :, :] = (t[N_QN] * 1000 + t[N_QC] * 100
                               + t[N_QI] * 10 + t[N_QR])

    res = pl.pallas_call(
        kernel,
        grid=(nch, cap // UNROLL),
        in_specs=[
            pl.BlockSpec(lut.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, smaxp, G), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, init_regs.shape[1], A, 128),
                         lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, UNROLL, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UNROLL, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, A, 128), lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nch, cap, A, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nch, cap, A, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nch, cap // UNROLL, A, 128), jnp.int32),
            jax.ShapeDtypeStruct((nch, 8, A, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((init_regs.shape[1], A, 128), jnp.int32),
            pltpu.VMEM((T, A, 128), jnp.int32),
        ],
        interpret=interpret,
    )(lut, slab, init_regs)
    val, xch, nib, fin = res
    val = jnp.transpose(val, (1, 0, 2, 3)).reshape(cap, nch * G)
    xch = jnp.transpose(xch, (1, 0, 2, 3)).reshape(cap, nch * G)
    nib = jax.lax.bitcast_convert_type(
        jnp.transpose(nib, (1, 0, 2, 3)), jnp.uint32).reshape(
        cap // UNROLL, nch * G)
    rows_used = fin[:, 0].reshape(nch * G)
    ok = fin[:, 1].reshape(nch * G) != 0
    diag = fin[:, 2:].reshape(nch, 6, G).transpose(1, 0, 2).reshape(6, -1)
    return val, xch, nib, rows_used, ok, diag


def emit_init_regs_core(states, rel_ptrs, starts, ends, ring,
                        window: int, gpad: int, num_chunks: int = 1,
                        real_starts=None):
    """Pure-jnp core of make_emit_init_regs: all array inputs may be
    traced (device) values of length L <= gpad; starts/ends must be
    i32, states u32-compatible. Lanes [L, gpad) pad as finished."""
    R = window + 1
    nreg = _layout(window)[-1]
    L = states.shape[0]
    A = gpad // (128 * num_chunks)
    regs = jnp.zeros((nreg, gpad), jnp.int32)

    def put(row, vals):
        return regs.at[row, :L].set(vals)

    regs = put(D_STATE, jax.lax.bitcast_convert_type(
        states.astype(jnp.uint32), jnp.int32))
    regs = put(D_PTR, rel_ptrs)
    regs = put(D_LEFT, (ends - starts).astype(jnp.int32))
    regs = regs.at[D_PHASE, :].set(P_DONE)
    regs = put(D_PHASE, jnp.where(starts < ends, P_OUT,
                                  P_DONE).astype(jnp.int32))
    regs = put(D_XMOD, (starts % R).astype(jnp.int32))
    regs = put(D_X, starts)
    regs = put(E_X, starts)
    regs = put(E_XMOD, (starts % R).astype(jnp.int32))
    regs = put(E_LSTART, starts)
    regs = put(E_RSTART, real_starts if real_starts is not None
               else starts)
    degring = _layout(window)[0]
    regs = regs.at[degring:degring + R, :L].set(ring.T)
    return jnp.transpose(
        regs.reshape(nreg, num_chunks, A, 128), (1, 0, 2, 3))


def make_emit_init_regs(states, rel_ptrs, starts, ends, ring,
                        window: int, pad_to_lanes: int | None = None,
                        num_chunks: int = 1, real_starts=None):
    """Initial register file for decode_emit_pallas, device-built (no
    host fetches). Same lane layout as make_init_regs_device."""
    states = jnp.asarray(states)
    rel_ptrs = jnp.asarray(rel_ptrs, jnp.int32)
    starts = jnp.asarray(np.asarray(starts).astype(np.int64)
                         .astype(np.int32))
    if real_starts is not None:
        real_starts = jnp.asarray(
            np.asarray(real_starts).astype(np.int64).astype(np.int32))
    ends = jnp.asarray(np.asarray(ends).astype(np.int64).astype(np.int32))
    ring = jnp.asarray(ring, jnp.int32)
    L = states.shape[0]
    quantum = 128 * num_chunks
    gpad = -(-max(L, 1) // quantum) * quantum
    if pad_to_lanes is not None:
        if pad_to_lanes % quantum or pad_to_lanes < gpad:
            raise ValueError(
                f"pad_to_lanes must be a multiple of {quantum} >= {gpad}")
        gpad = pad_to_lanes
    return emit_init_regs_core(states, rel_ptrs, starts, ends, ring,
                               window, gpad, num_chunks, real_starts)

"""Post-pass for the merged-emit decode kernel: channels -> device adjacency.

The merged-emit kernel (ops/emit_pallas.py) performs the BvGraph
successor reconstruction IN-KERNEL: its FSM merges copy runs (read back
from a ring of the lane's own already-emitted rows), interval runs, and
residuals by value, emitting one FINAL sorted successor per step. The
reference capability being replaced is webgraph's BvGraph recursion +
this repo's former sort-based device reconstruction (reference:
src/bvgraph/mod.rs component grammar; executable spec
native/src/bvgraph.hpp read_successors).

Kernel output contract (S = step cap, G = lanes; lane l's rows run down
column l; all u32):

- val  [S, G]: the emitted successor value; j (parent list position) on
  placeholder rows; ref on refinfo rows; undefined elsewhere.
- xch  [S, G]: the node id x on MARKER rows (codes 1/3/5), undefined
  elsewhere.
- nib  [S//8, G]: 4-bit row codes packed 8 per word (row s -> word s//8,
  nibble s%8):
    0 = element row (val = successor)
    1 = element row, FIRST of a clean node (val = successor, xch = x)
    2 = hole (stall) row
    3 = refinfo row: FIRST row of a DIRTY node (val = ref, xch = x);
        the node's rows follow in grouped order (placeholders for
        copies, then real interval/residual values), possibly with
        interspersed holes
    4 = placeholder element row of a dirty node (val = j: the element
        copies the parent's j-th successor)
    5 = empty-node row (outdegree 0; xch = x; counts as a hole)
    0xF = done/padding

Dirty nodes (cross-lane parent, copy source older than the kernel's
T-row ring, or run-queue overflow) emit GROUPED instead of merged; this
post-pass resolves their placeholders by gathering from the (already
final) parent slices and sorts each dirty slice, writing it back
CONTIGUOUSLY from its start row. Dirty chains (a dirty node whose
parent is dirty) resolve over `rounds` passes in chain-depth order.

The result is a column-major padded device adjacency:
    succs2d [S, G] u32, starts_flat [n] i32, degs [n] i32
where node x's successors are succs2d.flat[starts_flat[x] + k*G] for
k in [0, degs[x]) — one strided slice per node (flat index domain is
column-major: row*G + lane). `to_dense_csr` converts to the classic
contiguous (offsets, succs) at the cost of one element-scale gather.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .reconstruct_device import _cumsum, _cumsum_tok, _quant

I32 = jnp.int32
UNROLL = 8

# row codes
C_EL, C_FIRST, C_HOLE, C_REFINFO, C_PLACE, C_EMPTY = range(6)
C_DONE = 0xF


def unpack_nib(nib, S: int):
    """[S//8, G] packed words -> [S, G] i32 codes."""
    shifts = jnp.arange(UNROLL, dtype=jnp.uint32) * 4
    return ((nib[:, None, :] >> shifts[None, :, None]) & 0xF).reshape(
        S, -1).astype(I32)


@functools.partial(jax.jit, static_argnames=("n",))
def extract_node_tables(val, xch, nib, lane_of, n: int):
    """Pass 1: per-node tables from the channels.

    lane_of [n] i32: the lane holding each node (static per plan).
    Returns dict of n-arrays: start_el (row of the first element),
    deg, kind (0 clean / 1 dirty / 2 empty), ref, span (rows until the
    next marker; slice gather budget for dirty nodes), plus ok flags.
    One P-scale scatter + one P-scale cumsum; everything else n-scale.
    """
    S, G = val.shape
    codes = unpack_nib(nib, S)
    is_elem = (codes == C_EL) | (codes == C_FIRST) | (codes == C_PLACE)
    is_refinfo = ((codes == C_REFINFO) | (codes == 7) | (codes == 8)
                  | (codes == 9))   # refinfo variants carry dirty cause
    is_marker = (codes == C_FIRST) | is_refinfo | (codes == C_EMPTY)

    rows = jax.lax.broadcasted_iota(I32, (S, G), 0)
    # exclusive element rank in column (token) order
    rank = _cumsum_tok(is_elem.astype(I32)) - is_elem.astype(I32)

    kind = jnp.where(codes == C_FIRST, 0, jnp.where(is_refinfo, 1, 2))
    cause = jnp.where(is_refinfo, codes, 0)
    idx = jnp.where(is_marker,
                    jax.lax.bitcast_convert_type(xch, I32), n)
    packed = (rows << 6) | (cause << 2) | kind
    mrow_p = jnp.zeros(n + 1, I32).at[idx.reshape(-1)].set(
        packed.reshape(-1), mode="drop")
    mrow, mkind = mrow_p[:n] >> 6, mrow_p[:n] & 3
    mcause = (mrow_p[:n] >> 2) & 0xF

    # n-scale gathers back into the 2D arrays at the marker rows
    flat = mrow * G + lane_of
    rank_at = rank.reshape(-1)[flat]
    ref_raw = jax.lax.bitcast_convert_type(val, I32).reshape(-1)[flat]
    ref = jnp.where(mkind == 1, ref_raw, 0)

    # element counts: d[x] = rank at next marker (same lane) - rank at x;
    # per-lane totals close the last node of each lane
    lane_tot = rank[-1, :] + is_elem[-1, :].astype(I32)   # inclusive total
    next_same_lane = jnp.concatenate(
        [lane_of[1:] == lane_of[:-1], jnp.zeros(1, bool)])
    nxt_rank = jnp.concatenate([rank_at[1:], jnp.zeros(1, I32)])
    deg = jnp.where(next_same_lane, nxt_rank, lane_tot[lane_of]) - rank_at
    deg = jnp.where(mkind == 2, 0, deg)

    start_el = mrow + (mkind == 1).astype(I32)
    nxt_mrow = jnp.concatenate([mrow[1:], jnp.zeros(1, I32)])
    span = jnp.where(next_same_lane, nxt_mrow, S) - start_el
    ok = jnp.all(deg >= 0) & jnp.all(span >= deg)
    return dict(start_el=start_el, deg=deg, kind=mkind, ref=ref,
                cause=mcause, span=span, rank_at=rank_at, codes=codes,
                mrow=mrow, ok=ok)


def _cummax(x, BK=1 << 13):
    """Blocked cumulative max along a 1D array: jax.lax.cummax lowers to
    a reduce_window whose cost explodes past ~100k elements (measured
    116 ms at 393k on v5e); two-level blocking bounds it like _cumsum."""
    N = x.shape[0]
    if N <= BK:
        return jax.lax.cummax(x)
    if N % BK:
        pad = BK - N % BK
        xp = jnp.concatenate([x, jnp.full(pad, x[-1] * 0 - (1 << 30),
                                          x.dtype)])
        return _cummax(xp, BK=BK)[:N]
    x2 = x.reshape(N // BK, BK)
    loc = jax.lax.cummax(x2, axis=1)
    carry_in = jax.lax.cummax(loc[:, -1])
    carry = jnp.concatenate(
        [jnp.full(1, -(1 << 30), x.dtype), carry_in[:-1]])
    return jnp.maximum(loc, carry[:, None]).reshape(N)


def _expand_spans(base_n, len_n, mask_n, Dcap: int):
    """Ragged expansion: for masked nodes, emit (node, k) pairs for
    k in [0, len_n) packed densely into [Dcap] (order = node order).
    Returns (node_ids [Dcap], k [Dcap], valid [Dcap], dbase [n])."""
    n = base_n.shape[0]
    ln = jnp.where(mask_n, len_n, 0)
    dbase = _cumsum(ln) - ln                    # exclusive
    total = dbase[-1] + ln[-1]
    # node id per slot: scatter-max node ids at span starts + cummax
    g = jnp.arange(Dcap, dtype=I32)
    starts = jnp.where(mask_n & (ln > 0), dbase, Dcap)
    ids = jnp.arange(n, dtype=I32)
    arr = jnp.zeros(Dcap + 1, I32).at[starts].max(ids, mode="drop")
    node = _cummax(arr[:Dcap])
    k = g - dbase[node]
    valid = (g < total) & (k >= 0) & (k < ln[node])
    return node, k, valid, dbase


@functools.partial(jax.jit, static_argnames=("roffs", "Dall"))
def fixup_dirty_compact(val, nib, start_el, deg, span, lane_of, order,
                        cpos_n, pdirty, parent, roffs: tuple, Dall: int):
    """Compact-block fixup: gather ALL dirty spans once into a compact
    buffer laid out in (chain-depth, node) order, run the per-round
    resolve+sort on static compact SLICES (parents of round r>1 read the
    already-sorted compact slices of earlier rounds), and write back to
    F with one scatter. Two Dall-scale big-array gathers + one scatter
    total, instead of per-round passes over the padded output. Row codes
    are gathered straight from the packed nib words (Dall-scale), so no
    P-scale code unpack is needed here.

    order [ndirty_pad]: dirty node ids sorted by (chain depth, node);
    cpos_n [n]: each dirty node's compact base (-1 for clean);
    roffs: static (round start, padded length) pairs in compact coords.
    All three come from the meta cache (n-scale, derived once)."""
    S, G = val.shape
    F = jax.lax.bitcast_convert_type(val, I32).reshape(-1)   # [S*G]
    nibf = jax.lax.bitcast_convert_type(nib, I32).reshape(-1)
    startsF = start_el * G + lane_of
    pstartF = startsF[parent]
    BIG = jnp.int32(0x7FFFFFFF)
    nd = order.shape[0]

    # slot -> dirty-ordinal via scatter-max of ordinals at compact bases
    ln = jnp.where(order >= 0, span[jnp.maximum(order, 0)], 0)
    obase = _cumsum(ln) - ln
    slots = jnp.arange(Dall, dtype=I32)
    st = jnp.where(ln > 0, obase, Dall)
    arr = jnp.zeros(Dall + 1, I32).at[st].max(
        jnp.arange(nd, dtype=I32), mode="drop")
    ordl = _cummax(arr[:Dall])
    node = order[ordl]
    k = slots - obase[ordl]
    valid = (node >= 0) & (k >= 0) & (k < ln[ordl])
    node = jnp.maximum(node, 0)

    row = start_el[node] + k
    rowf = jnp.where(valid, row * G + lane_of[node], 0)
    wordf = jnp.where(valid, (row >> 3) * G + lane_of[node], 0)
    Cv = jnp.where(valid, F[rowf], 0)
    Cc = jnp.where(valid,
                   (nibf[wordf] >> ((row & 7) * 4)) & 0xF, C_HOLE)
    cbase = obase[ordl]                       # compact slice base per slot

    for (lo, lpad, tlen) in roffs:
        sl_v = jax.lax.dynamic_slice(Cv, (lo,), (lpad,))
        sl_c = jax.lax.dynamic_slice(Cc, (lo,), (lpad,))
        sl_node = jax.lax.dynamic_slice(node, (lo,), (lpad,))
        sl_valid = jax.lax.dynamic_slice(valid, (lo,), (lpad,))
        is_el = ((sl_c == C_EL) | (sl_c == C_FIRST) | (sl_c == C_PLACE))
        is_pl = sl_valid & (sl_c == C_PLACE)
        par = parent[sl_node]
        pd = pdirty[par]
        srcF = jnp.clip(pstartF[sl_node] + sl_v * G, 0, S * G - 1)
        srcC = jnp.clip(cpos_n[par] + sl_v, 0, Dall - 1)
        vF = F[jnp.where(is_pl & ~pd, srcF, 0)]
        vC = Cv[jnp.where(is_pl & pd, srcC, 0)]
        v = jnp.where(is_pl, jnp.where(pd, vC, vF), sl_v)
        in_round = jnp.arange(lpad, dtype=I32) < tlen
        key = jnp.where(sl_valid & is_el & in_round, v, BIG)
        # slots past the true length (lpad is quantized) belong to later
        # rounds: push them PAST every real group or they shift regions
        sortn = jnp.where(in_round, sl_node, BIG)
        sord, sv = jax.lax.sort((sortn, key), num_keys=2)
        # within-slice rank against each group's compact base
        gb = cpos_n[jnp.clip(sord, 0, cpos_n.shape[0] - 1)] - lo
        rank = jnp.arange(lpad, dtype=I32) - gb
        put = (sv != BIG) & (sord >= 0) & (rank >= 0) &             (rank < deg[jnp.maximum(sord, 0)])
        dst = jnp.where(put, gb + rank + lo, Dall)
        Cv = Cv.at[dst].set(sv, mode="drop")
    # final write-back: compact value at (node, rank) -> F row
    rank_f = slots - cbase
    okf = valid & (rank_f < deg[node])
    destF = jnp.where(okf, startsF[node] + rank_f * G, S * G)
    F = F.at[destF].set(Cv, mode="drop")
    return F.reshape(S, G)


@functools.partial(jax.jit, static_argnames=("n", "roffs", "Dall"))
def _post_fused(val, xch, nib, lane_of, order, cpos_n, pdirty, parent,
                n: int, roffs: tuple, Dall: int):
    """extract + fixup as ONE device program (first-call / verification
    path; the steady state uses post_steady)."""
    tabs = extract_node_tables(val, xch, nib, lane_of, n)
    G = val.shape[1]
    if roffs:
        succs2d = fixup_dirty_compact(
            val, nib, tabs["start_el"], tabs["deg"], tabs["span"],
            lane_of, order, cpos_n, pdirty, parent, roffs, Dall)
    else:
        succs2d = jax.lax.bitcast_convert_type(val, I32)
    starts_flat = tabs["start_el"] * G + lane_of
    return succs2d, starts_flat, tabs["deg"], tabs


def build_fixup_cache(mc, val_np_provider):
    """Precomputes the PER-SLOT index/layout arrays of the compact fixup
    (meta-cache honesty rule: every one of these is layout — slot->node
    maps, row positions, code classes, placeholder source indices, sort
    group shapes, destinations — derived once from the verified first
    decode; per-rep VALUES are never cached). Stored in mc under
    "fx_*" device keys + "fx_offs" static round offsets.

    val_np_provider(rowf [Dall] i64, wordsel) -> (values, codes) numpy:
    gathers the first decode's val channel + nib codes at flat rows."""
    n = len(mc["parent"])
    order = mc["order_np"]
    span = mc["span_np"]
    start_el = mc["start_el_np"]
    deg = mc["deg_np"]
    lane_of = mc["lane_of_np"]
    parent = mc["parent"]
    pdirty = mc["pdirty_np"]
    cpos = mc["cpos_np"]
    Dall = mc["Dall"]
    G = mc["G"]
    BIG = np.int32(0x7FFFFFFF)

    # slot -> (node, k) expansion in (chain depth, node) order
    ln = span[order].astype(np.int64)
    obase = np.concatenate([[0], np.cumsum(ln)])[:-1]
    tot = int(ln.sum())
    node = np.full(Dall, -1, np.int64)
    k = np.zeros(Dall, np.int64)
    cb_r = np.repeat(obase, ln)
    node[:tot] = np.repeat(order, ln)
    k[:tot] = np.arange(tot) - cb_r
    valid = node >= 0
    nodec = np.maximum(node, 0)
    row = start_el[nodec] + k
    rowf = np.where(valid, row * G + lane_of[nodec], 0)
    vals0, codes = val_np_provider(rowf)
    codes = np.where(valid, codes, C_HOLE)
    is_el = ((codes == C_EL) | (codes == C_FIRST) | (codes == C_PLACE))
    is_pl = valid & (codes == C_PLACE)
    par = parent[nodec]
    pd = pdirty[par] & is_pl
    startsF = start_el.astype(np.int64) * G + lane_of
    # placeholder j values are layout (position into the parent's list)
    j = np.where(is_pl, vals0.astype(np.int64), 0)
    srcF = np.where(is_pl & ~pd,
                    np.clip(startsF[par] + j * G, 0,
                            mc["SG"] - 1), 0)
    srcC = np.where(pd, np.clip(cpos[par] + j, 0, Dall - 1), 0)
    cbase = np.zeros(Dall, np.int64)
    cbase[:tot] = cb_r

    # per-round sort-shape layout: sorted group ids, ranks, destinations
    sortn_rounds, dst_rounds, offs = [], [], []
    off = 0
    for (lo, lpad, tlen) in mc["roffs"]:
        sl = slice(lo, lo + lpad)
        in_round = np.arange(lpad) < tlen
        elmask = valid[sl] & is_el[sl] & in_round
        sortn = np.where(in_round, nodec[sl], BIG).astype(np.int64)
        # the sort key is BIG wherever elmask is false, so the sorted
        # group order (and the per-group element counts) is layout
        key0 = np.where(elmask, 0, BIG)
        o = np.lexsort((key0, sortn))
        sord = sortn[o]
        skey0 = key0[o]
        gb = np.where(sord != BIG, cpos[np.clip(sord, 0, n - 1)] - lo, 0)
        rank = np.arange(lpad) - gb
        put = (skey0 != BIG) & (sord != BIG) & (rank >= 0) & \
            (rank < deg[np.clip(sord, 0, n - 1)])
        dst = np.where(put, gb + rank + lo, Dall)
        sortn_rounds.append(sortn)
        dst_rounds.append(dst)
        offs.append((off, lpad, lo))
        off += lpad
    rank_f = np.arange(Dall) - cbase
    okf = valid & (rank_f < deg[nodec])
    destF = np.where(okf, startsF[nodec] + rank_f * G, mc["SG"])

    import jax.numpy as jnp
    mc["fx_offs"] = tuple(offs)
    mc["fx_rowf"] = jnp.asarray(np.where(valid, rowf, 0).astype(np.int32))
    mc["fx_valid"] = jnp.asarray(valid)
    mc["fx_ispl"] = jnp.asarray(is_pl)
    mc["fx_pd"] = jnp.asarray(pd)
    mc["fx_elmask"] = jnp.asarray(is_el & valid)
    mc["fx_srcF"] = jnp.asarray(srcF.astype(np.int32))
    mc["fx_srcC"] = jnp.asarray(srcC.astype(np.int32))
    mc["fx_sortn"] = jnp.asarray(
        np.concatenate(sortn_rounds).astype(np.int32)
        if sortn_rounds else np.zeros(1, np.int32))
    mc["fx_dst"] = jnp.asarray(
        np.concatenate(dst_rounds).astype(np.int32)
        if dst_rounds else np.zeros(1, np.int32))
    mc["fx_destF"] = jnp.asarray(destF.astype(np.int32))


def _fixup_steady(val, rowf, valid, ispl, pd, elmask, srcF, srcC, sortn,
                  dst, destF, fx_offs: tuple, Dall: int):
    """Compact fixup with every index/mask cached (see build_fixup_cache):
    per rep it is 2 Dall-gathers + per-round (1 gather + 1 two-key sort
    + 1 scatter) + 1 final scatter — all shapes static, no index math."""
    S, G = val.shape
    F = jax.lax.bitcast_convert_type(val, I32).reshape(-1)
    BIG = jnp.int32(0x7FFFFFFF)
    Cv0 = jnp.where(valid, F[rowf], 0)
    vF = F[srcF]                      # parent-clean placeholder resolves
    Cv = jnp.where(ispl & ~pd, vF, Cv0)
    for (off, lpad, lo) in fx_offs:
        sl = slice(lo, lo + lpad)
        so = slice(off, off + lpad)
        sl_v = jax.lax.dynamic_slice(Cv, (lo,), (lpad,))
        vC = Cv[srcC[sl]]             # parent-dirty resolves (chains)
        v = jnp.where(ispl[sl] & pd[sl], vC, sl_v)
        key = jnp.where(elmask[sl], v, BIG)
        _, sv = jax.lax.sort((sortn[so], key), num_keys=2)
        Cv = Cv.at[dst[so]].set(sv, mode="drop")
    F = F.at[destF].set(Cv, mode="drop")
    return F.reshape(S, G)


@functools.partial(jax.jit, static_argnames=("fx_offs", "Dall"))
def post_steady(val, xch, lane_of, mrow, kind, starts_flat,
                fx_rowf, fx_valid, fx_ispl, fx_pd, fx_elmask, fx_srcF,
                fx_srcC, fx_sortn, fx_dst, fx_destF,
                fx_offs: tuple, Dall: int):
    """Steady-state post-pass: the marker LAYOUT (marker rows, spans,
    kinds, start positions, dirty-slot structure) is cached from the
    verified first decode — the channels of a deterministic kernel on a
    fixed artifact never move — so pass 1 collapses from P-scale (code
    unpack + element-rank cumsum + marker scatter, ~45 ms device at cnr
    scale) to ONE n-scale gather: the kernel runs in mark_deg mode,
    writing each node's per-rep DECODED outdegree into the xch channel
    on its marker row, and deg is read back at the cached rows. Values
    (succs2d) come entirely from this rep's val channel (+ the
    cached-index fixup for dirty nodes)."""
    G = val.shape[1]
    flatx = jax.lax.bitcast_convert_type(xch, I32).reshape(-1)
    deg = flatx[mrow * G + lane_of]
    deg = jnp.where(kind == 2, 0, deg)
    if fx_offs:
        succs2d = _fixup_steady(val, fx_rowf, fx_valid, fx_ispl, fx_pd,
                                fx_elmask, fx_srcF, fx_srcC, fx_sortn,
                                fx_dst, fx_destF, fx_offs, Dall)
    else:
        succs2d = jax.lax.bitcast_convert_type(val, I32)
    return succs2d, starts_flat, deg


def postprocess(val, xch, nib, lane_of_np, lane_starts_np, n: int,
                meta_cache: dict | None = None):
    """Full post-pass: channels -> (succs2d i32, starts_flat, degs,
    tabs). meta_cache (mutated) caches Dcaps/rounds so the steady state
    issues a fixed program with no data-dependent shapes."""
    mc0 = meta_cache if meta_cache is not None else {}
    if "order_d" in mc0:
        return _post_fused(val, xch, nib, mc0["lane_of_d"],
                           mc0["order_d"], mc0["cpos_d"], mc0["pdirty_d"],
                           mc0["parent_d"], n, mc0["roffs"], mc0["Dall"])
    lane_of = jnp.asarray(lane_of_np)
    tabs = extract_node_tables(val, xch, nib, lane_of, n)
    mc = meta_cache if meta_cache is not None else {}
    if "ddep" not in mc:
        kind = np.asarray(tabs["kind"])
        ref = np.asarray(tabs["ref"])
        span = np.asarray(tabs["span"])
        parent = np.maximum(np.arange(n) - ref, 0)
        dirty = kind == 1
        hasref = ref > 0
        # dirty-chain depth (n-scale, host, one-time per artifact):
        # clean = 0; dirty = 1 + depth of the (possibly dirty) parent;
        # ref == 0 dirty nodes (queue overflow) have no parent: depth 1
        ddep = np.where(dirty, 1, 0).astype(np.int32)
        for _ in range(4096):
            upd = dirty & hasref & (ddep <= ddep[parent])
            if not upd.any():
                break
            ddep = np.where(upd, ddep[parent] + 1, ddep)
        else:
            raise RuntimeError("dirty chains deeper than 4096")
        if int(ddep.max()) > 192:
            # each chain level is one fixup round (a static slice of the
            # compiled program); past ~192 the program size and round
            # overheads beat the sort path. safe_break_interval <= 128
            # at compress time bounds in-lane taint chains below this.
            raise RuntimeError(
                f"dirty chains {int(ddep.max())} rounds deep "
                "(fixup supports <= 192)")
        mc["ddep"] = ddep
        mc["parent"] = parent.astype(np.int32)
        mc["rounds"] = int(ddep.max())
        # compact-fixup layout: dirty nodes in (chain depth, node) order
        didx = np.nonzero(dirty)[0]
        dd_sort = np.argsort(ddep[didx] * (n + 1.0) + didx, kind="stable")
        order = didx[dd_sort].astype(np.int32)
        spans_o = span[order].astype(np.int64)
        obase = np.concatenate([[0], np.cumsum(spans_o)])
        cpos = np.full(n, 0, np.int32)
        cpos[order] = obase[:-1].astype(np.int32)
        roffs = []
        lo = 0
        hi_need = 1
        for r in range(1, mc["rounds"] + 1):
            tlen = int(spans_o[ddep[order[: len(order)]] == r].sum())
            lpad = _quant(tlen + 1)
            roffs.append((lo, lpad, tlen))
            hi_need = max(hi_need, lo + lpad)
            lo += tlen
        # Dall must cover every PADDED slice: lax.dynamic_slice clamps
        # out-of-range starts (which would silently shift the slice)
        mc["Dall"] = _quant(max(lo, hi_need) + 1)
        mc["roffs"] = tuple(roffs)
        mc["order_np"] = order
        mc["cpos_np"] = cpos
        mc["pdirty_np"] = dirty
    mc["lane_of_d"] = lane_of
    mc["parent_d"] = jnp.asarray(mc["parent"])
    npad = max(len(mc["order_np"]), 1)
    order_p = np.full(npad, -1, np.int32)
    order_p[:len(mc["order_np"])] = mc["order_np"]
    mc["order_d"] = jnp.asarray(order_p)
    mc["cpos_d"] = jnp.asarray(mc["cpos_np"])
    mc["pdirty_d"] = jnp.asarray(mc["pdirty_np"])
    # marker LAYOUT for the steady state (post_steady): rows/spans/kinds
    # of a deterministic kernel on a fixed artifact are layout data
    # (meta-cache honesty rule, docs/ARCHITECTURE.md) — values and
    # degrees are still re-decoded every rep
    S, G = val.shape
    mc["mrow_d"] = jnp.asarray(np.asarray(tabs["mrow"]))
    mc["kind_d"] = jnp.asarray(np.asarray(tabs["kind"]))
    mc["starts_flat_d"] = jnp.asarray(
        np.asarray(tabs["start_el"]) * G + np.asarray(lane_of_np,
                                                      np.int32))
    if mc["roffs"] and "fx_offs" not in mc:
        mc["span_np"] = np.asarray(tabs["span"]).astype(np.int64)
        mc["start_el_np"] = np.asarray(tabs["start_el"]).astype(np.int64)
        mc["deg_np"] = np.asarray(tabs["deg"]).astype(np.int64)
        mc["lane_of_np"] = np.asarray(lane_of_np).astype(np.int64)
        mc["G"], mc["SG"] = G, S * G

        def provider(rowf):
            rowf_d = jnp.asarray(rowf.astype(np.int64).astype(np.int32))
            flatv = jax.lax.bitcast_convert_type(val, I32).reshape(-1)
            vals = np.asarray(flatv[rowf_d])
            row = (rowf // G).astype(np.int64)
            lane = (rowf % G).astype(np.int64)
            nibf = jax.lax.bitcast_convert_type(nib, I32).reshape(-1)
            wordf = jnp.asarray(((row >> 3) * G + lane).astype(np.int32))
            sh = jnp.asarray(((row & 7) * 4).astype(np.int32))
            codes = np.asarray((nibf[wordf] >> sh) & 0xF)
            return vals, codes

        build_fixup_cache(mc, provider)
    elif "fx_offs" not in mc:
        mc["fx_offs"] = ()
        z = jnp.zeros(1, jnp.int32)
        zb = jnp.zeros(1, bool)
        for key in ("fx_rowf", "fx_srcF", "fx_srcC", "fx_sortn",
                    "fx_dst", "fx_destF"):
            mc[key] = z
        for key in ("fx_valid", "fx_ispl", "fx_pd", "fx_elmask"):
            mc[key] = zb
    return _post_fused(val, xch, nib, lane_of, mc["order_d"],
                       mc["cpos_d"], mc["pdirty_d"], mc["parent_d"], n,
                       mc["roffs"], mc["Dall"])


def to_host_lists(succs2d, starts_flat, degs, n: int):
    """Host verification helper: full python list-of-arrays."""
    F = np.asarray(succs2d).reshape(-1)
    st = np.asarray(starts_flat).astype(np.int64)
    d = np.asarray(degs).astype(np.int64)
    G = np.asarray(succs2d).shape[1]
    out = []
    for x in range(n):
        out.append(F[st[x] + np.arange(d[x]) * G])
    return out


@functools.partial(jax.jit, static_argnames=("E",))
def to_dense_csr(succs2d, starts_flat, degs, E: int):
    """Classic contiguous CSR from the padded column-major adjacency:
    one element-scale gather."""
    n = degs.shape[0]
    G = succs2d.shape[1]
    offsets = jnp.concatenate([jnp.zeros(1, I32), _cumsum(degs)])
    node, k, valid, _ = _expand_spans(
        starts_flat, degs, jnp.ones(n, bool), E)
    src = jnp.clip(starts_flat[node] + k * G, 0,
                   succs2d.shape[0] * G - 1)
    succs = jnp.where(valid, succs2d.reshape(-1)[src], 0)
    return offsets, succs

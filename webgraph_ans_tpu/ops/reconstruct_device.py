"""Device-side successor-list reconstruction (full graph), scan-first.

Turns decode_blocks token output into a CSR adjacency entirely on device.
The reference capability being replaced is the successor reconstruction
machinery of webgraph's BvGraph (executable spec: native/src/bvgraph.hpp
read_successors; SURVEY.md section 2.2).

Design is driven by the measured v5e costs (tools/probe_parse.py,
tools/probe_recon_marginal.py): elementwise ops and cumsums over the
P-token buffer are a few ms, while every P-sized gather / scatter costs
~30-40 ms in-program. The expensive-op inventory is therefore bounded to:

- ONE P-scatter to find per-node start positions (sp),
- ONE combined P-scatter that simultaneously places residual values into
  the successor buffer and seeds the interval/copy run channels — the
  copy channel directly in (reference-chain depth, node) grouped order,
  so the depth-resolution rounds can slice it with no reorder pass,
- ONE Ecap scatter (interval expansion into succs),
- one 2-key segment sort of the successor buffer per copy round, with
  round work sliced by chain depth so total round work is O(copied
  elements), not O(copied x depth).

Runs carry their VALUES in the channels (packed with a validity bit) and
a "last-valid" associative scan broadcasts them to run elements — no
per-element gather back into token space at all. Everything else is
built from two scan identities that replace per-token gathers of
per-node tables:

- inject-reset local cumsum: cumsum(contrib + scatter_at_node_start(
  -prev_node_total)) yields the within-node running sum directly. This is
  exact under int32 wraparound (the global cumsum may wrap; per-node
  injections are computed from wrapped differences, which are exact mod
  2^32, and all local values fit in int31).
- delta broadcast: to broadcast per-node table values to token/element
  positions, scatter successive differences at the node region starts and
  cumsum. Works for arbitrary (non-monotone) values; n-scale scatter only.

Component ids: 0 outdegree, 1 reference, 2 block count, 3 block,
4 interval count, 5 interval start, 6 interval len, 7 first residual,
8 residual gap, 0xF invalid (see ops/decode_jax.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .decode_jax import UNROLL

I32 = jnp.int32


def _nat2int(v):
    """Inverse of int2nat: even v -> v/2, odd v -> -(v/2)-1."""
    return jnp.where(v & 1 == 1, -((v >> 1) + 1), v >> 1)


def _quant(x: int) -> int:
    """Buffer-size quantizer: smallest m<<k >= x with m in 4..7 (i.e. 1,
    1.25, 1.5, 1.75 x a power of two), minimum 16. Gather/scatter/sort
    cost scales with the padded size, so <=25% waste beats pow2's <=100%,
    while the compile-shape count stays bounded (4 shapes per octave)."""
    x = max(int(x), 16)
    k = max(x.bit_length() - 3, 0)
    return -(-x >> k) << k


def _unpack(out, cap: int):
    """decode_blocks output -> lane-major flat (v, nib) token arrays.
    The nibble rows are unpacked by broadcasting the 8 shifts over the
    packed [cap/8, G] rows and re-interleaving with a major-dims-only
    transpose — an elementwise pass instead of a P-scale row gather
    (the gather costs ~7 ns/element on v5e, tools/probe_prims2.py)."""
    vals2d = out[:cap]
    cpk = out[cap:]
    shifts = jnp.arange(UNROLL, dtype=jnp.uint32) * 4
    nib3 = (cpk[None, :, :] >> shifts[:, None, None]) & 0xF
    nib2d = jnp.transpose(nib3, (1, 0, 2)).reshape(cap, -1)
    v = vals2d.T.reshape(-1).astype(I32)
    nib = nib2d.T.reshape(-1).astype(I32)
    return v, nib


def _excl(cs):
    """exclusive cumulative from an inclusive one (prepend 0)."""
    return jnp.concatenate([jnp.zeros(1, cs.dtype), cs])


def _cumsum(x, axis=-1, BK=1 << 14):
    """Blocked cumsum along the last axis. XLA lowers large-axis cumsums
    to a reduce_window with a ~32x-size temp (a [5, 9.6M] stacked cumsum
    allocated 9.2 GB of HLO temp and OOMed the parse program at
    untightened caps); chunking into BK-sized blocks plus a cumsum of
    block totals bounds temps at ~32x BK per block row with identical
    results. Non-divisible axes are zero-padded up to the next BK
    multiple and sliced back (padding is elementwise-scale), so no input
    shape can silently fall through to the unbounded-temp lowering."""
    assert axis in (-1, x.ndim - 1)
    P = x.shape[-1]
    if P <= BK:
        return jnp.cumsum(x, axis=-1)
    if P % BK:
        pad = BK - P % BK
        xp = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        return _cumsum(xp, axis=-1, BK=BK)[..., :P]
    shp = x.shape[:-1] + (P // BK, BK)
    x3 = x.reshape(shp)
    loc = jnp.cumsum(x3, axis=-1)
    tot = jnp.cumsum(loc[..., -1], axis=-1)
    carry = jnp.concatenate(
        [jnp.zeros(tot.shape[:-1] + (1,), x.dtype), tot[..., :-1]],
        axis=-1)
    return (loc + carry[..., None]).reshape(x.shape)


def _ffill_valid(ch):
    """Forward-fill the last value with bit0 set (channels pack run values
    as (val<<1)|1; unseeded slots are 0). Last-valid combiner is
    associative, so this is one associative scan — works for ARBITRARY
    (non-monotone) run values, unlike a cummax of positions."""
    return jax.lax.associative_scan(
        lambda a, b: jnp.where(b & 1 == 1, b, a), ch)


def _bcast_runs(size: int, starts_n, vals_n, mask_n):
    """Broadcast vals_n[i] over [starts_n[i], starts_n[next masked i]) of a
    length-`size` array for masked nodes (0 before the first): n-scale
    argsort + scatter of successive deltas, then a free cumsum. Valid for
    arbitrary int32 values (delta chain telescopes)."""
    key = jnp.where(mask_n, starts_n, size)
    order = jnp.argsort(key)
    sv = vals_n[order]
    st = key[order]
    delta = sv - jnp.concatenate([jnp.zeros(1, I32), sv[:-1]])
    arr = jnp.zeros(size, I32).at[st].add(
        jnp.where(st < size, delta, 0), mode="drop")
    return _cumsum(arr)


def _bcast_runs_multi(size: int, starts_n, vals_list, mask_n):
    """_bcast_runs for several value channels sharing (starts, mask):
    one [C, size] stacked scatter + one stacked cumsum."""
    key = jnp.where(mask_n, starts_n, size)
    order = jnp.argsort(key)
    st = key[order]
    keep = st < size
    sv = jnp.stack([v[order] for v in vals_list])
    delta = sv - jnp.concatenate(
        [jnp.zeros((len(vals_list), 1), I32), sv[:, :-1]], axis=1)
    arr = jnp.zeros((len(vals_list), size), I32).at[
        :, jnp.where(keep, st, size)].add(
        jnp.where(keep[None, :], delta, 0), mode="drop")
    return _cumsum(arr, axis=-1)


def _depth_order(depth, ncop):
    """Nodes ordered by (reference-chain depth, node): pi = the order, cb =
    each node's copy-element base within that order (indexed by ORIGINAL
    node id). All n-scale."""
    n = depth.shape[0]
    _, pi = jax.lax.sort((depth, jnp.arange(n, dtype=I32)), num_keys=2)
    cb_pi = _excl(_cumsum(ncop[pi]))[:n]
    cb = jnp.zeros(n, I32).at[pi].set(cb_pi)
    return pi, cb


@functools.partial(jax.jit, static_argnames=("num_nodes", "cap",
                                             "min_interval"))
def parse_stats(out, num_nodes: int, cap: int, min_interval: int):
    """Pass 1: per-node statistics (all n-scale after one P-scatter for
    sp). Returns the flat token arrays, node tables, and a small meta
    vector [ok, total_iv, total_cop, max_depth, hist64...] for one host
    fetch."""
    n = num_nodes
    v, nib = _unpack(out, cap)
    P = v.shape[0]
    pos = jnp.arange(P, dtype=I32)

    is_out = nib == 0
    prev_nib = jnp.concatenate([jnp.full(1, 0xF, I32), nib[:-1]])
    is_blk = nib == 3
    # A node's block tokens are consecutive (grammar: bc then bc x blk),
    # and runs of different nodes are always separated by outd/ref/bc
    # tokens, so "not the node's first block" == previous token is a
    # block. First block's length is v, later blocks v+1
    # (native/src/bvgraph.hpp read_successors).
    b = v + (is_blk & (prev_nib == 3)).astype(I32)
    is_il = nib == 6
    is_fr = nib == 7

    # One stacked cumsum carries every independent per-token channel
    # (stacking is free: cumsum over [C, P] costs the same as over [P],
    # tools/probe_prims2.py); per-node sums then need ONE [C, n+1]
    # gather at the node starts instead of 2 gathers per channel.
    ch = jnp.stack([
        is_out.astype(I32),                      # 0: node counter
        is_blk.astype(I32),                      # 1: block counter
        jnp.where(is_blk, b, 0),                 # 2: block length sum
        jnp.where(is_il, v + min_interval, 0),   # 3: interval elements
        (is_fr | (nib == 8)).astype(I32),        # 4: residual count
    ])
    cs = _cumsum(ch, axis=-1)
    nd = jnp.clip(cs[0] - 1, 0, n - 1)

    # Node start positions: position of each node's outdegree token.
    # Exactly one outdegree token per node, so a plain set-scatter works
    # (measured ~3x cheaper than a min-scatter on v5e).
    sp = jnp.full((n,), P - 1, I32).at[
        jnp.where(is_out, nd, n)].set(pos, mode="drop")
    spx = jnp.concatenate([sp, jnp.full((1,), P, I32)])

    # exclusive stacked cumsum at the n+1 node boundaries; adjacent
    # differences are the per-node sums
    csb = jnp.where((spx > 0)[None, :],
                    cs[:, jnp.maximum(spx - 1, 0)], 0)
    nsums = csb[:, 1:] - csb[:, :-1]
    blocks_sum = nsums[2]
    niv_tot = nsums[3]
    nres = nsums[4]

    # Fields at fixed offsets from the node start (guarded by padding).
    vxp = jnp.concatenate([v, jnp.zeros(3, I32)])
    nibp = jnp.concatenate([nib, jnp.full(3, 0xF, I32)])
    d = vxp[sp]
    ref = jnp.where(nibp[sp + 1] == 1, vxp[sp + 1], 0)
    has_ref = ref > 0
    bc = jnp.where(has_ref & (nibp[sp + 2] == 2), vxp[sp + 2], 0)

    # Even-indexed (copy) blocks: block index within the node = block
    # counter minus the node's base, broadcast via one delta scatter +
    # one cumsum (the bc token sits at sp+2, so the inclusive block
    # count there is the node's exclusive base).
    blk_base_n = cs[1][jnp.minimum(sp + 2, P - 1)]
    base_bcast = _bcast_runs(P, sp, blk_base_n, jnp.ones(n, bool))
    blk_even = is_blk & (((cs[1] - 1 - base_bcast) & 1) == 0)
    cs_even = _excl(_cumsum(jnp.where(blk_even, b, 0)))
    ncop_blocks = cs_even[spx[1:]] - cs_even[spx[:-1]]

    parent = jnp.clip(jnp.arange(n, dtype=I32) - ref, 0, n - 1)
    d_ref = jnp.where(has_ref, d[parent], 0)
    tail_len = jnp.where(has_ref & (bc % 2 == 0), d_ref - blocks_sum, 0)
    ncop = ncop_blocks + tail_len

    ok = jnp.all(ncop + niv_tot + nres == d)
    offsets = jnp.concatenate([jnp.zeros(1, I32), _cumsum(d)])

    # Reference-chain depth: parent depth + 1, resolved as a wavefront
    # (n-scale; depth(parent) == depth(child) - 1 by construction).
    depth0 = jnp.where(has_ref, -1, 0)

    def dcond(carry):
        dep, k = carry
        return jnp.any(dep < 0) & (k < n)

    def dbody(carry):
        dep, k = carry
        pd = dep[parent]
        return jnp.where((dep < 0) & (pd == k), k + 1, dep), k + 1

    depth, _ = jax.lax.while_loop(dcond, dbody, (depth0, jnp.zeros((), I32)))

    hist = jnp.zeros(64, I32).at[jnp.clip(depth, 0, 63)].add(ncop)
    meta = jnp.concatenate([
        jnp.stack([ok.astype(I32), jnp.sum(niv_tot), jnp.sum(ncop),
                   jnp.max(depth)]), hist])
    return dict(v=v, nib=nib, sp=sp, d=d, offsets=offsets, ncop=ncop,
                niv_tot=niv_tot, parent=parent, depth=depth,
                blocks_sum=blocks_sum, tail_len=tail_len, bc=bc,
                has_ref=has_ref, meta=meta)


@functools.partial(jax.jit, static_argnames=("Epad", "Ecap", "Ccap",
                                             "min_interval"))
def place(v, nib, sp, offsets, ncop, niv_tot, tail_len, depth,
          Epad: int, Ecap: int, Ccap: int, min_interval: int):
    """Pass 2: the combined placement scatter. Residual values land at
    their final grouped slots in succs[:Epad]; interval/copy run channels
    (buf[Epad:]) record each run's VALUE, packed (val<<1)|1 so a
    last-valid scan can broadcast it to the run's elements. The copy
    channel is laid out in (depth, node) grouped element order, so depth
    rounds later slice it directly.

    All per-token running sums ride ONE stacked [C, P] cumsum; the
    per-node resets and per-node broadcasts ride ONE stacked delta
    scatter at the node starts plus a second stacked cumsum (stacking is
    free on v5e, tools/probe_prims2.py; the per-channel scatter/cumsum
    version cost ~45 ms more at cnr-2000 scale)."""
    P = v.shape[0]
    n = sp.shape[0]
    prev_nib = jnp.concatenate([jnp.full(1, 0xF, I32), nib[:-1]])
    prev_v = jnp.concatenate([jnp.zeros(1, I32), v[:-1]])
    is_out = nib == 0
    is_blk = nib == 3
    b = v + (is_blk & (prev_nib == 3)).astype(I32)
    is_fr = nib == 7
    m = is_fr | (nib == 8)
    is_il = nib == 6
    ilen = v + min_interval
    live_il = is_il & (ilen > 0)
    is_is = nib == 5
    first_iv = is_is & (prev_nib == 4)

    # ---- stage 1: stacked global cumsums ----
    ch = jnp.stack([
        is_out.astype(I32),                                   # 0 -> nd
        jnp.where(m, jnp.where(is_fr, _nat2int(v), v + 1), 0),  # 1 res
        m.astype(I32),                                        # 2 res rank
        jnp.where(is_is, jnp.where(                           # 3 lefts
            first_iv, _nat2int(v), v + 1 + prev_v + min_interval), 0),
        jnp.where(is_blk, b, 0),                              # 4 blk runs
        jnp.where(is_il, ilen, 0),                            # 5 cum_iv
        is_blk.astype(I32),                                   # 6 blk index
    ])
    cs = _cumsum(ch, axis=-1)
    nd = jnp.clip(cs[0] - 1, 0, n - 1)

    # ---- stage 2: per-node resets (channels 1,2,3,4,6) and per-node
    # broadcasts, one stacked scatter + cumsum ----
    _, cb = _depth_order(depth, ncop)
    ncb = _excl(_cumsum(ncop))[:n]
    tail_b = _excl(_cumsum(tail_len))[:n]
    RESET = (1, 2, 3, 4, 6)
    base_n = jnp.where((sp > 0)[None, :],
                       cs[jnp.array(RESET)][:, jnp.maximum(sp - 1, 0)], 0)
    bvals = jnp.concatenate([
        base_n,
        (offsets[:n] + ncop + niv_tot)[None, :],   # 5: dest_r base
        tail_b[None, :],                           # 6: tail_bb
        (cb - ncb)[None, :],                       # 7: depth-group shift
    ])                                             # [8, n]
    deltas = bvals - jnp.concatenate(
        [jnp.zeros((8, 1), I32), bvals[:, :-1]], axis=1)
    bb = _cumsum(jnp.zeros((8, P), I32).at[:, sp].add(deltas), axis=-1)

    res_val = cs[1] - bb[0] + nd
    rank = cs[2] - bb[1] - 1
    dest_r = bb[5] + rank
    lefts = cs[3] - bb[2] + nd
    lefts_prev = jnp.concatenate([jnp.zeros(1, I32), lefts[:-1]])
    cum_excl_iv = cs[5] - jnp.where(is_il, ilen, 0)
    # element t of the run at this token has value adj_val + t
    adj_val = lefts_prev - cum_excl_iv

    # ---- copy runs (even-indexed blocks with positive length; the
    # reference-tail run is n-scale and handled in copy_fields), channel
    # in (depth, node) grouped element order ----
    blk_idx = cs[6] - bb[4] - 1                    # 0-based within node
    own = is_blk & (blk_idx % 2 == 0) & (b > 0)
    cop_own = jnp.where(own, b, 0)
    cum_own = _cumsum(cop_own)                  # own elements only
    cum_excl_own = cum_own - cop_own
    # node-order element index accounts for tails of earlier nodes;
    # depth-grouped index shifts each node's elements from its
    # node-order base to its (depth, node)-order base
    q_start = cum_excl_own + bb[6] + bb[7]
    # start of this block within the REFERENCED list: local running sum
    # of block lengths before this token. Element at depth-order index q
    # of the run starting at q0 copies parent slot blk_run_start +
    # (q - q0) = Bq + q with the per-run constant Bq below.
    blk_run_start = cs[4] - bb[3] - jnp.where(is_blk, b, 0)
    Bq = blk_run_start - q_start

    # ---- the combined scatter: three disjoint token classes, three
    # disjoint index regions; channels carry (value<<1)|1 ----
    BIG = Epad + Ecap + Ccap
    idx = jnp.where(m, dest_r,
          jnp.where(live_il, Epad + cum_excl_iv,
          jnp.where(own, Epad + Ecap + q_start, BIG)))
    val = jnp.where(m, res_val,
          jnp.where(live_il, (adj_val << 1) | 1, (Bq << 1) | 1))
    buf = jnp.zeros(BIG, I32).at[idx].set(val, mode="drop")
    return buf


@functools.partial(jax.jit, static_argnames=("Epad", "Ecap"))
def expand_intervals(succs, ch_iv, offsets, ncop, niv_tot, total_iv,
                     Epad: int, Ecap: int):
    """Interval expansion: last-valid scan broadcasts each run's packed
    adj_val to its elements, one Ecap scatter into succs. Element t's
    value is adj_val + t (adj_val already folds in the run's global
    element base)."""
    n = ncop.shape[0]
    t = jnp.arange(Ecap, dtype=I32)
    adj_el = _ffill_valid(ch_iv) >> 1
    node_iv_base = _excl(_cumsum(niv_tot))[:n]
    # dest = offsets[node] + ncop[node] + (t - node_iv_base[node])
    dest_ff = _bcast_runs(Ecap, node_iv_base,
                          offsets[:n] + ncop - node_iv_base, niv_tot > 0)
    live = t < total_iv
    return succs.at[jnp.where(live, dest_ff + t, Epad)].set(
        adj_el + t, mode="drop")


def copy_fields(ch_own, offsets, ncop, tail_len, blocks_sum, parent, depth,
                total_cop, Ccap: int, Epad: int):
    """Per-copy-element (slot, src) in (depth, node) grouped order — the
    order `place` seeded the channel in. src indexes the parent's FINAL
    sorted list; slot is the element's grouped position in succs. One
    last-valid scan + n-scale delta broadcasts; NO element gathers."""
    n = ncop.shape[0]
    t = jnp.arange(Ccap, dtype=I32)
    live = t < total_cop
    Bq_el = _ffill_valid(ch_own) >> 1

    _, cb = _depth_order(depth, ncop)
    cmask = ncop > 0
    par_off = offsets[parent]
    # all four run broadcasts share (starts=cb, mask=cmask): one stacked
    # delta scatter + one stacked cumsum instead of four of each
    thr, par_el, pob_el, slot_base = _bcast_runs_multi(
        Ccap, cb, [cb + ncop - tail_len, par_off, par_off + blocks_sum,
                   offsets[:n] - cb], cmask)
    # element is in the reference-tail run iff t >= tail element start
    in_tail = t >= thr
    src = jnp.where(in_tail, pob_el + (t - thr), par_el + Bq_el + t)
    slot = jnp.where(live, slot_base + t, Epad)
    src = jnp.where(live, jnp.clip(src, 0, Epad - 1), 0)
    return slot, src


@jax.jit
def build_seg(offsets, succs):
    """Segment id (owning node) per successor slot."""
    Epad = succs.shape[0]
    n = offsets.shape[0] - 1
    bumps = jnp.zeros(Epad, I32).at[
        jnp.where(offsets[1:n + 1] < Epad, offsets[1:n + 1], Epad)
    ].add(1, mode="drop")
    return _cumsum(bumps)


@jax.jit
def sort_segments(seg, s):
    _, s2 = jax.lax.sort((seg, s), num_keys=2)
    return s2


@jax.jit
def fill_slice(succs, F, slot_sl, src_sl, cnt):
    """Resolve one depth round's copy elements: gather sources from the
    sorted array F, scatter into the grouped succs at their slots."""
    M = slot_sl.shape[0]
    vals = F[src_sl]
    idx = jnp.where(jnp.arange(M, dtype=I32) < cnt, slot_sl,
                    succs.shape[0])
    return succs.at[idx].set(vals, mode="drop")


@functools.partial(jax.jit, static_argnames=(
    "Epad", "Ecap", "Ccap", "min_interval", "hist_key"))
def assemble(v, nib, sp, offsets, ncop, niv_tot, tail_len, blocks_sum,
             parent, depth, total_iv, total_cop,
             Epad: int, Ecap: int, Ccap: int, min_interval: int,
             hist_key: tuple):
    """Pass 2 in ONE device program: placement scatter, interval
    expansion, copy fields, and every depth-resolution round statically
    unrolled (round counts come from hist_key, the per-depth copy counts
    fetched with the pass-1 meta). Fusing the whole tail matters more
    than any single stage on this platform: each jit dispatch costs
    ~30 ms through the remote-device relay (tools/probe_parse.py), which
    dwarfs the compute of most stages."""
    buf = place(v, nib, sp, offsets, ncop, niv_tot, tail_len, depth,
                Epad, Ecap, Ccap, min_interval)
    succs = buf[:Epad]
    if Ecap:
        succs = expand_intervals(
            succs, buf[Epad:Epad + Ecap], offsets, ncop, niv_tot,
            total_iv, Epad, Ecap)
    seg = build_seg(offsets, succs)
    F = sort_segments(seg, succs)
    if hist_key:
        slot_s, src_s = copy_fields(
            buf[Epad + Ecap:], offsets, ncop, tail_len, blocks_sum,
            parent, depth, total_cop, Ccap, Epad)
        # pad so static-size depth slices never clamp
        slot_p = jnp.concatenate([slot_s, jnp.full(Ccap, Epad, I32)])
        src_p = jnp.concatenate([src_s, jnp.zeros(Ccap, I32)])
        off = 0
        for cnt in hist_key:
            if cnt == 0:
                continue
            M = _quant(cnt)
            succs = fill_slice(succs, F, slot_p[off:off + M],
                               src_p[off:off + M], jnp.int32(cnt))
            F = sort_segments(seg, succs)
            off += cnt
    return offsets, F, succs


@functools.partial(jax.jit, static_argnames=(
    "num_nodes", "cap", "min_interval", "Epad", "Ecap", "Ccap",
    "hist_key"))
def parse_and_assemble(out, num_nodes: int, cap: int, min_interval: int,
                       Epad: int, Ecap: int, Ccap: int, hist_key: tuple):
    """The whole reconstruction as ONE device program (pass 1 + pass 2).
    Usable once the meta vector is known (cached from a prior call on the
    same artifact): every jit dispatch costs a ~30 ms relay round trip in
    this environment, so the steady-state path must be a single dispatch.
    Returns (offsets, F, meta) — the caller verifies meta against its
    cache after the fact."""
    st = parse_stats(out, num_nodes, cap, min_interval)
    meta = st["meta"]
    offsets, F, _ = assemble(
        st["v"], st["nib"], st["sp"], st["offsets"], st["ncop"],
        st["niv_tot"], st["tail_len"], st["blocks_sum"], st["parent"],
        st["depth"], meta[1], meta[2], Epad, Ecap, Ccap, min_interval,
        hist_key)
    return offsets, F, meta


def reconstruct_device(out, num_nodes: int, num_arcs: int, cap: int,
                      min_interval: int, meta_cache: dict | None = None):
    """Full-graph device reconstruction from decode_blocks output.

    Returns (offsets [n+1] i32 device, succs [Epad] i32 device, E) with
    the successor lists bit-exact in succs[:E]; raises on inconsistent
    token streams. Two device programs total: parse_stats (pass 1) and
    assemble (everything else, depth rounds unrolled).

    `meta_cache` (optional, mutated): the pass-1 meta vector is the only
    value the host needs before it can shape pass 2, so fetching it is
    the pipeline's one blocking sync. A caller decoding the same artifact
    repeatedly passes a dict; after the first call the cached meta shapes
    pass 2 immediately (decode -> parse -> assemble queue back-to-back on
    device) and the meta fetched afterwards — overlapping assemble's
    compute — only verifies the cache.

    Reference capability: webgraph BvGraph successor machinery
    (SURVEY.md section 2.2)."""
    n, E = num_nodes, int(num_arcs)
    cached = meta_cache.get("meta") if meta_cache is not None else None

    if cached is not None and int(cached[3]) < 63:
        # steady state: ONE dispatch for the whole reconstruction
        total_iv, total_cop, max_depth = (int(cached[1]), int(cached[2]),
                                          int(cached[3]))
        hist_key = (tuple(int(c) for c in cached[4:4 + max_depth + 1][1:])
                    if total_cop and max_depth > 0 else ())
        offsets, F, meta_d = parse_and_assemble(
            out, n, cap, min_interval, _quant(E + 1),
            _quant(total_iv) if total_iv else 0, _quant(total_cop),
            hist_key)
        if not np.array_equal(np.asarray(meta_d), cached):
            meta_cache.pop("meta", None)
            raise ValueError(
                "token stream changed under a cached reconstruction meta")
        return offsets, F, E

    st = parse_stats(out, n, cap, min_interval)
    meta = np.asarray(st["meta"])
    if not bool(meta[0]):
        raise ValueError("token stream inconsistent")
    if meta_cache is not None:
        meta_cache["meta"] = meta
    total_iv, total_cop, max_depth = int(meta[1]), int(meta[2]), int(meta[3])
    hist = meta[4:]

    Epad = _quant(E + 1)
    Ecap = _quant(total_iv) if total_iv else 0
    Ccap = _quant(total_cop)
    args = (st["v"], st["nib"], st["sp"], st["offsets"], st["ncop"],
            st["niv_tot"], st["tail_len"], st["blocks_sum"], st["parent"],
            st["depth"], jnp.int32(total_iv), jnp.int32(total_cop))
    if not (total_cop and max_depth > 0):
        offsets, F, _ = assemble(*args, Epad, Ecap, Ccap, min_interval, ())
        return offsets, F, E
    if max_depth < 63:
        hist_key = tuple(int(c) for c in hist[1:max_depth + 1])
        offsets, F, _ = assemble(*args, Epad, Ecap, Ccap, min_interval,
                                 hist_key)
        return offsets, F, E

    # depth histogram saturates at 64 buckets (hc-style chains): resolve
    # with unsliced masked rounds, one dispatch per depth. The copy
    # fields are (depth, node)-grouped but the slice bounds are unknown
    # beyond bucket 63, so rounds mask on the element's chain depth.
    offsets, F, succs = assemble(*args, Epad, Ecap, Ccap, min_interval, ())
    buf = place(st["v"], st["nib"], st["sp"], st["offsets"], st["ncop"],
                st["niv_tot"], st["tail_len"], st["depth"],
                Epad, Ecap, Ccap, min_interval)
    seg = build_seg(st["offsets"], succs)
    slot_s, src_s = jax.jit(
        copy_fields, static_argnames=("Ccap", "Epad"))(
        buf[Epad + Ecap:], st["offsets"], st["ncop"], st["tail_len"],
        st["blocks_sum"], st["parent"], st["depth"], jnp.int32(total_cop),
        Ccap=Ccap, Epad=Epad)
    _, cb = _depth_order(st["depth"], st["ncop"])
    dep_el = _bcast_runs(Ccap, cb, st["depth"], st["ncop"] > 0)
    for k in range(1, max_depth + 1):
        take = dep_el == k
        idxs = jnp.where(take, slot_s, Epad)
        succs = succs.at[idxs].set(F[src_s], mode="drop")
        F = sort_segments(seg, succs)
    return st["offsets"], F, E

"""Device-side successor-list reconstruction from aux-mode decode output.

Turns decode_blocks(emit_aux=True) output into a CSR adjacency entirely
on device. The reference capability being replaced is the successor
reconstruction machinery of webgraph's BvGraph (executable spec:
native/src/bvgraph.hpp read_successors; SURVEY.md section 2.2).

Design (round 3): the decode kernel's FSM already tracks everything the
old token-space parser re-derived with ~10 P-scale cumsum/scatter passes
(VERDICT r02: parse 113 ms + place 45 ms + copy_fields 44 ms of the
90 ns/arc end-to-end cost). In aux mode the kernel emits, per token, two
extra u32 rows with PRE-RESOLVED reconstruction fields:

- residual tokens: aux1 = the absolute successor value (the kernel keeps
  a running previous-residual register), aux2 = the node-local grouped
  element index (copies + intervals + prior residuals);
- interval start/len tokens: aux1 = the absolute left extreme, aux2 =
  the node-local grouped element start of the run;
- block tokens: aux1 = the running block-length sum (start of this block
  inside the referenced list), aux2 = (copied-so-far << 1) | is_copy;
- one summary pseudo-step per node (nibble 0x9): value = ncop,
  aux1 = niv, aux2 = tail_len.

What remains here is exactly four P-scale passes (unpack, one node-id
cumsum, one node-table scatter, one run/element scatter), two
element-scale scans, one segment sort, and the reference-chain depth
rounds:

- every run (interval or copy) scatters ONE packed value at its first
  element: (val - gstart) << 1 | 1, where val is the interval's left
  extreme or the run's absolute source base. Runs tile contiguously
  within a node's region, so a last-valid scan broadcasts the value to
  every element of the run, and element g resolves as (val - gstart) + g
  — no per-element gathers, no ordering constraints on the scatter;
- copy runs land in a (reference-chain depth, node)-grouped worklist
  [Ccap] of (slot, src) pairs, so depth-resolution rounds slice their
  elements statically (round k: gather from the already-final parents in
  the sorted array F, scatter into the grouped succs, re-sort);
- per-node values broadcast to token/element positions with the
  delta-scatter + cumsum identity (n-scale scatters only).

Component ids: 0 outdegree, 1 reference, 2 block count, 3 block,
4 interval count, 5 interval start, 6 interval len, 7 first residual,
8 residual gap, 9 node summary, 0xF invalid (see ops/decode_jax.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .decode_jax import UNROLL

I32 = jnp.int32


def _quant(x: int) -> int:
    """Buffer-size quantizer: smallest m<<k >= x with m in 4..7 (i.e. 1,
    1.25, 1.5, 1.75 x a power of two), minimum 16. Gather/scatter/sort
    cost scales with the padded size, so <=25% waste beats pow2's <=100%,
    while the compile-shape count stays bounded (4 shapes per octave)."""
    x = max(int(x), 16)
    k = max(x.bit_length() - 3, 0)
    return -(-x >> k) << k


def _excl(cs):
    """exclusive cumulative from an inclusive one (prepend 0)."""
    return jnp.concatenate([jnp.zeros(1, cs.dtype), cs])


def _cumsum(x, axis=-1, BK=1 << 14):
    """Blocked cumsum along the last axis. XLA lowers large-axis cumsums
    to a reduce_window with a ~32x-size temp; chunking into BK-sized
    blocks plus a cumsum of block totals bounds temps at ~32x BK per
    block row with identical results. Non-divisible axes are zero-padded
    up to the next BK multiple and sliced back."""
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


def _ffill_comb(a, b):
    return jnp.where(b & 1 == 1, b, a)


def _ffill_valid(ch, BK=1 << 14):
    """Forward-fill the last value with bit0 set along the last axis
    (channels pack run values as (val<<1)|1; unseeded slots are 0).
    Last-valid combiner is associative, so this is an associative scan —
    BLOCKED two-level, like _cumsum: a flat associative_scan over a
    ~60M-element axis emits a deep odd-size slicing recursion that OOMs
    the XLA compiler (observed: tpu_compile_helper SIGKILL at
    Epad = 58.7M; block scans over pow2 blocks compile fine). Works for
    arbitrary (negative, non-monotone) packed values."""
    N = ch.shape[-1]
    if N <= BK:
        return jax.lax.associative_scan(_ffill_comb, ch, axis=-1)
    if N % BK:
        pad = BK - N % BK
        chp = jnp.concatenate(
            [ch, jnp.zeros(ch.shape[:-1] + (pad,), ch.dtype)], axis=-1)
        return _ffill_valid(chp, BK=BK)[..., :N]
    x3 = ch.reshape(ch.shape[:-1] + (N // BK, BK))
    loc = jax.lax.associative_scan(_ffill_comb, x3, axis=-1)
    tails = loc[..., -1]                      # [..., NB] per-block last
    carry_inc = jax.lax.associative_scan(_ffill_comb, tails, axis=-1)
    carry = jnp.concatenate(
        [jnp.zeros(carry_inc.shape[:-1] + (1,), ch.dtype),
         carry_inc[..., :-1]], axis=-1)
    out = jnp.where(loc & 1 == 1, loc, carry[..., None])
    return out.reshape(ch.shape)


def _scatter_add_rows(C: int, size: int, idx_n, deltas):
    """[C, size] scatter-add of per-channel deltas [C, n] at shared
    column indices idx_n [n], lowered as ONE flat single-channel scatter
    (XLA lowers a batched [C, size] scatter ~20x slower than the flat
    equivalent on this platform; tools/probe_bvals.py). Out-of-range
    idx_n (>= size) drop."""
    valid = (idx_n >= 0) & (idx_n < size)
    rows = jnp.arange(C, dtype=I32)[:, None] * size
    flat_idx = jnp.where(valid[None, :], rows + idx_n[None, :],
                         C * size).reshape(-1)
    flat = jnp.zeros(C * size + 1, I32).at[flat_idx].add(
        deltas.reshape(-1), mode="drop")
    return flat[:C * size].reshape(C, size)


def _bcast_runs_multi(size: int, starts_n, vals_list, mask_n):
    """Broadcast vals[i] over [starts_n[i], starts_n[next masked i]) of a
    length-`size` array for masked nodes (0 before the first), for
    several value channels sharing (starts, mask): one n-scale argsort +
    one flat delta scatter + one stacked cumsum."""
    key = jnp.where(mask_n, starts_n, size)
    order = jnp.argsort(key)
    st = key[order]
    sv = jnp.stack([v[order] for v in vals_list])
    delta = sv - jnp.concatenate(
        [jnp.zeros((len(vals_list), 1), I32), sv[:, :-1]], axis=1)
    arr = _scatter_add_rows(len(vals_list), size, st, delta)
    return _cumsum(arr, axis=-1)


def _depth_order(depth, ncop):
    """Nodes ordered by (reference-chain depth, node): pi = the order,
    cb = each node's copy-element base within that order (indexed by
    ORIGINAL node id). All n-scale."""
    n = depth.shape[0]
    _, pi = jax.lax.sort((depth, jnp.arange(n, dtype=I32)), num_keys=2)
    cb_pi = _excl(_cumsum(ncop[pi]))[:n]
    cb = jnp.zeros(n, I32).at[pi].set(cb_pi)
    return pi, cb


def _unpack4(out, cap: int):
    """decode_blocks(emit_aux=True) output -> STEP-MAJOR 2D token arrays
    (v, a1, a2 [cap, G] i32; nib [cap, G] i32). Token order is
    column-major (lane l's tokens run down column l); every P-scale op
    downstream works directly on this layout — the lane-major flatten
    relayouts (3 x 15 MB transposes + the nibble re-interleave, ~30 ms
    at cnr scale) are gone entirely."""
    vals = out[:cap]
    a1 = out[cap:2 * cap]
    a2 = out[2 * cap:3 * cap]
    cpk = out[3 * cap:]
    # nibble of step s lives in packed row s//8 at 4-bit slot s%8:
    # repeat each packed row 8x along a new minor axis and shift
    shifts = jnp.arange(UNROLL, dtype=jnp.uint32) * 4
    nib = ((cpk[:, None, :] >> shifts[None, :, None]) & 0xF).reshape(
        cap, -1)
    b = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    return b(vals), b(a1), b(a2), nib.astype(I32)


def _cumsum_tok(x):
    """Cumulative sum in TOKEN order (column-major) over [..., cap, G]
    step-major arrays: per-column cumsum (short scan axis, no relayout)
    + an exclusive carry of column totals. Equivalent to
    flatten-transpose-cumsum without the 15 MB transposes."""
    cs = jnp.cumsum(x, axis=-2)
    tot = cs[..., -1, :]
    carry = jnp.concatenate(
        [jnp.zeros(tot.shape[:-1] + (1,), x.dtype),
         _cumsum(tot, axis=-1)[..., :-1]], axis=-1)
    return cs + carry[..., None, :]


def _tok_gather(x2d, m, cap: int):
    """x2d[m % cap, m // cap] for lane-major flat token indices m (the
    index domain sp/ssp live in), as ONE flat gather — step-major
    reshape is free."""
    G = x2d.shape[1]
    return x2d.reshape(-1)[(m % cap) * G + m // cap]


@functools.partial(jax.jit, static_argnames=("num_nodes", "cap",
                                             "depth_iters"))
def parse_stats(out, num_nodes: int, cap: int, depth_iters: int = 0):
    """Pass 1: step-major token arrays + per-node tables, n-scale after
    ONE token-order cumsum and ONE P->2n scatter (node starts + node
    summaries). Returns the token arrays, node tables, and a small meta
    vector [ok, total_iv, total_cop, max_depth, hist64...] for one host
    fetch.

    depth_iters > 0 statically unrolls the reference-chain wavefront to
    that many rounds (the cached-meta steady path passes the known
    max_depth; a dynamic while_loop costs ~5 ms/iteration of fixed
    overhead on this platform). Unresolved chains then surface as
    ok=0 in the meta vector, which the caller turns into a cache miss."""
    n = num_nodes
    v, a1, a2, nib = _unpack4(out, cap)
    G = v.shape[1]
    rows = jax.lax.broadcasted_iota(I32, (cap, G), 0)
    cols = jax.lax.broadcasted_iota(I32, (cap, G), 1)
    pos = cols * cap + rows                      # lane-major flat index
    is_out = nib == 0
    is_sum = nib == 9

    nd = jnp.clip(_cumsum_tok(is_out.astype(I32)) - 1, 0, n - 1)
    # one scatter finds both per-node anchor positions
    idx = jnp.where(is_out, nd, jnp.where(is_sum, n + nd, 2 * n))
    spp = jnp.full((2 * n + 1,), 0, I32).at[idx].set(pos, mode="drop")
    sp, ssp = spp[:n], spp[n:2 * n]

    d = _tok_gather(v, sp, cap)
    ref = jnp.where(_tok_gather(nib, sp + 1, cap) == 1,
                    _tok_gather(v, sp + 1, cap), 0)
    parent = jnp.clip(jnp.arange(n, dtype=I32) - ref, 0, n - 1)
    has_ref = ref > 0
    ncop = _tok_gather(v, ssp, cap)
    niv = _tok_gather(a1, ssp, cap)
    tail = _tok_gather(a2, ssp, cap)
    offsets = jnp.concatenate([jnp.zeros(1, I32), _cumsum(d)])
    ok = jnp.all(ncop + niv <= d) & jnp.all(tail <= ncop)

    # Reference-chain depth: parent depth + 1, resolved as a wavefront
    # (n-scale; depth(parent) == depth(child) - 1 by construction).
    depth0 = jnp.where(has_ref, -1, 0)
    if depth_iters > 0:
        depth = depth0
        for k in range(depth_iters):
            pd = depth[parent]
            depth = jnp.where((depth < 0) & (pd == k), k + 1, depth)
        ok = ok & jnp.all(depth >= 0)
        depth = jnp.maximum(depth, 0)
    else:
        def dcond(carry):
            dep, k = carry
            return jnp.any(dep < 0) & (k < n)

        def dbody(carry):
            dep, k = carry
            pd = dep[parent]
            return jnp.where((dep < 0) & (pd == k), k + 1, dep), k + 1

        depth, _ = jax.lax.while_loop(dcond, dbody,
                                      (depth0, jnp.zeros((), I32)))
    hist = jnp.zeros(64, I32).at[jnp.clip(depth, 0, 63)].add(ncop)
    meta = jnp.concatenate([
        jnp.stack([ok.astype(I32), jnp.sum(niv), jnp.sum(ncop),
                   jnp.max(depth)]), hist])
    return dict(v=v, a1=a1, a2=a2, nib=nib, sp=sp, d=d, offsets=offsets,
                ncop=ncop, niv=niv, tail=tail, parent=parent, depth=depth,
                meta=meta)


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


def _assemble_body(v, a1, a2, nib, sp, d, offsets, ncop, niv, tail,
                   parent, depth, total_cop, Epad: int, Ccap: int,
                   min_interval: int, hist_key: tuple):
    """Pass 2: the combined run/element scatter, the two last-valid
    scans, the copy worklist, and every depth-resolution round
    statically unrolled (round counts from hist_key). Token arrays are
    STEP-MAJOR 2D (see _unpack4). Returns (offsets, F sorted node-order
    CSR, succs grouped, seg). Called fused (one jit, `assemble`) for
    normal graphs, or in two programs (`assemble_split`) past the
    compile-memory scale where one program OOMs the XLA compiler."""
    cap, G = v.shape
    n = sp.shape[0]
    # previous token in column-major order: shift down one row, column
    # heads take the previous column's last row
    prev_nib = jnp.concatenate([
        jnp.concatenate([jnp.full((1, 1), 0xF, I32), nib[-1:, :-1]],
                        axis=1),
        nib[:-1, :]], axis=0)
    is_blk = nib == 3
    b = v + (is_blk & (prev_nib == 3)).astype(I32)
    is_is = nib == 5
    is_res = (nib == 7) | (nib == 8)
    is_sum = nib == 9

    _, cb = _depth_order(depth, ncop)

    # --- per-token broadcast of per-node tables: one [4, cap, G]
    # stacked delta scatter at the node-start positions + one stacked
    # token-order cumsum ---
    bvals = jnp.stack([
        offsets[:n],                              # 0: off_x
        offsets[parent],                          # 1: off_par
        offsets[jnp.minimum(parent + 1, n)],      # 2: off_par end
        cb,                                       # 3: copy-channel base
    ])
    deltas = bvals - jnp.concatenate(
        [jnp.zeros((4, 1), I32), bvals[:, :-1]], axis=1)
    # flat step-major scatter index (single-axis scatters lower better)
    spf = (sp % cap) * G + sp // cap
    bb = _cumsum_tok(_scatter_add_rows(4, cap * G, spf, deltas)
                     .reshape(4, cap, G))
    off_x, off_par, off_pend, cbx = bb[0], bb[1], bb[2], bb[3]

    # --- the combined scatter: each token contributes at most ONE
    # update; three disjoint regions (residual values into succs,
    # interval-run seeds into chA, copy-run seeds into chC) ---
    own = is_blk & ((a2 & 1) == 1) & (b > 0)       # copy blocks
    tl = is_sum & (a2 > 0)                         # reference tails
    qs_own = cbx + (a2 >> 1)
    qs_tl = cbx + v - a2
    BIG = 2 * Epad + Ccap
    idx = jnp.where(is_res, off_x + a2,
          jnp.where(is_is, Epad + off_x + a2,
          jnp.where(own, 2 * Epad + qs_own,
          jnp.where(tl, 2 * Epad + qs_tl, BIG))))
    val = jnp.where(is_res, a1,
          jnp.where(is_is, ((a1 - (off_x + a2)) << 1) | 1,
          jnp.where(own, ((off_par + a1 - qs_own) << 1) | 1,
                    ((off_pend - a2 - qs_tl) << 1) | 1)))
    buf = jnp.zeros(BIG + 1, I32).at[idx].set(val, mode="drop")

    # --- run-value broadcast: one stacked last-valid scan ---
    N = max(Epad, Ccap)
    ch = jnp.zeros((2, N), I32)
    ch = ch.at[0, :Epad].set(buf[Epad:2 * Epad])
    ch = ch.at[1, :Ccap].set(buf[2 * Epad:2 * Epad + Ccap])
    ff = _ffill_valid(ch)

    # --- element-space node tables over Epad: one stacked scatter at
    # the node element bases + one stacked cumsum ---
    evals = jnp.stack([
        jnp.arange(n, dtype=I32),                 # seg id
        offsets[:n] + ncop,                       # copy/interval boundary
        offsets[:n] + ncop + niv,                 # interval/residual bnd
    ])
    edeltas = evals - jnp.concatenate(
        [jnp.zeros((3, 1), I32), evals[:, :-1]], axis=1)
    st = jnp.minimum(offsets[:n], Epad)
    eb = _cumsum(_scatter_add_rows(3, Epad, st, edeltas), axis=-1)
    g = jnp.arange(Epad, dtype=I32)
    # padding elements (g >= E) must sort AFTER every real segment
    seg = jnp.where(g >= offsets[n], n, eb[0])
    bnd_ci, bnd_ir = eb[1], eb[2]
    is_iv_el = (g >= bnd_ci) & (g < bnd_ir)
    succs = jnp.where(is_iv_el, (ff[0, :Epad] >> 1) + g, buf[:Epad])
    return succs, seg, ff[1, :Ccap]


def _rounds_body(offsets, succs, seg, ffC, ncop, depth, total_cop,
                 Epad: int, Ccap: int, hist_key: tuple):
    """Segment sort + depth-resolution rounds over the copy worklist."""
    n = ncop.shape[0]
    F = sort_segments(seg, succs)
    if hist_key:
        _, cb = _depth_order(depth, ncop)
        # copy worklist in (depth, node) grouped element order
        q = jnp.arange(Ccap, dtype=I32)
        src = jnp.clip((ffC >> 1) + q, 0, Epad - 1)
        slotb, = _bcast_runs_multi(Ccap, cb, [offsets[:n] - cb],
                                   ncop > 0)
        live = q < total_cop
        slot = jnp.where(live, slotb + q, Epad)
        src = jnp.where(live, src, 0)
        slot_p = jnp.concatenate([slot, jnp.full(Ccap, Epad, I32)])
        src_p = jnp.concatenate([src, jnp.zeros(Ccap, I32)])
        off = 0
        for cnt in hist_key:
            if cnt == 0:
                continue
            M = _quant(cnt)
            succs = fill_slice(succs, F, slot_p[off:off + M],
                               src_p[off:off + M], jnp.int32(cnt))
            F = sort_segments(seg, succs)
            off += cnt
    return offsets, F, succs, seg


@functools.partial(jax.jit, static_argnames=(
    "Epad", "Ccap", "min_interval", "hist_key"))
def assemble(v, a1, a2, nib, sp, d, offsets, ncop, niv, tail, parent,
             depth, total_cop, Epad: int, Ccap: int, min_interval: int,
             hist_key: tuple):
    """_assemble_body + _rounds_body fused into ONE device program (each
    jit dispatch costs a ~30 ms relay round trip, so the steady-state
    path is a single dispatch)."""
    succs, seg, ffC = _assemble_body(
        v, a1, a2, nib, sp, d, offsets, ncop, niv, tail, parent, depth,
        total_cop, Epad, Ccap, min_interval, hist_key)
    return _rounds_body(offsets, succs, seg, ffC, ncop, depth, total_cop,
                        Epad, Ccap, hist_key)


_ASSEMBLE_P1 = jax.jit(_assemble_body, static_argnames=(
    "Epad", "Ccap", "min_interval", "hist_key"))
_ASSEMBLE_P2 = jax.jit(_rounds_body, static_argnames=(
    "Epad", "Ccap", "hist_key"))

# Above this many grouped elements (Epad + Ccap) the FUSED reconstruction
# program OOMs the XLA compiler (observed: tpu_compile_helper SIGKILL at
# the 58M-arc synthetic fixture, while every piece compiles alone) —
# split into two programs, paying one extra dispatch.
SPLIT_ELEMENTS = 48 << 20


def assemble_split(*args):
    """assemble as two device programs (see SPLIT_ELEMENTS)."""
    (v, a1, a2, nib, sp, d, offsets, ncop, niv, tail, parent, depth,
     total_cop, Epad, Ccap, min_interval, hist_key) = args
    succs, seg, ffC = _ASSEMBLE_P1(
        v, a1, a2, nib, sp, d, offsets, ncop, niv, tail, parent, depth,
        total_cop, Epad=Epad, Ccap=Ccap, min_interval=min_interval,
        hist_key=hist_key)
    return _ASSEMBLE_P2(offsets, succs, seg, ffC, ncop, depth, total_cop,
                        Epad=Epad, Ccap=Ccap, hist_key=hist_key)


def _assemble_auto(*args):
    Epad, Ccap = args[13], args[14]
    fn = assemble_split if Epad + Ccap > SPLIT_ELEMENTS else assemble
    return fn(*args)


@functools.partial(jax.jit, static_argnames=(
    "num_nodes", "cap", "min_interval", "Epad", "Ccap", "hist_key",
    "depth_iters"))
def parse_and_assemble(out, num_nodes: int, cap: int, min_interval: int,
                       Epad: int, Ccap: int, hist_key: tuple,
                       depth_iters: int = 0):
    """The whole reconstruction as ONE device program (pass 1 + pass 2).
    Usable once the meta vector is known (cached from a prior call on
    the same artifact): every jit dispatch costs a ~30 ms relay round
    trip in this environment, so the steady-state path must be a single
    dispatch. Returns (offsets, F, meta) — the caller verifies meta
    against its cache after the fact. depth_iters: the known max chain
    depth (statically unrolls the wavefront; see parse_stats)."""
    st = parse_stats(out, num_nodes, cap, depth_iters=depth_iters)
    meta = st["meta"]
    offsets, F, _, _ = assemble(
        st["v"], st["a1"], st["a2"], st["nib"], st["sp"], st["d"],
        st["offsets"], st["ncop"], st["niv"], st["tail"], st["parent"],
        st["depth"], meta[2], Epad, Ccap, min_interval, hist_key)
    return offsets, F, meta


def parse_and_assemble_auto(out, num_nodes: int, cap: int,
                            min_interval: int, Epad: int, Ccap: int,
                            hist_key: tuple, depth_iters: int = 0):
    """parse_and_assemble, split into 3 dispatches past SPLIT_ELEMENTS
    (still zero host syncs — programs queue back to back)."""
    if Epad + Ccap <= SPLIT_ELEMENTS:
        return parse_and_assemble(out, num_nodes, cap, min_interval,
                                  Epad, Ccap, hist_key,
                                  depth_iters=depth_iters)
    st = parse_stats(out, num_nodes, cap, depth_iters=depth_iters)
    offsets, F, _, _ = assemble_split(
        st["v"], st["a1"], st["a2"], st["nib"], st["sp"], st["d"],
        st["offsets"], st["ncop"], st["niv"], st["tail"], st["parent"],
        st["depth"], st["meta"][2], Epad, Ccap, min_interval, hist_key)
    return offsets, F, st["meta"]


def reconstruct_device(out, num_nodes: int, num_arcs: int, cap: int,
                       min_interval: int, meta_cache: dict | None = None):
    """Full-graph device reconstruction from decode_blocks(emit_aux=True)
    output.

    Returns (offsets [n+1] i32 device, succs [Epad] i32 device, E) with
    the successor lists bit-exact in succs[:E]; raises on inconsistent
    token streams. Two device programs total: parse_stats (pass 1) and
    assemble (everything else, depth rounds unrolled).

    `meta_cache` (optional, mutated): the pass-1 meta vector is the only
    value the host needs before it can shape pass 2, so fetching it is
    the pipeline's one blocking sync. A caller decoding the same
    artifact repeatedly passes a dict; after the first call the cached
    meta shapes pass 2 immediately (decode -> parse -> assemble queue
    back-to-back on device) and the meta fetched afterwards — overlapping
    assemble's compute — only verifies the cache.

    Reference capability: webgraph BvGraph successor machinery
    (SURVEY.md section 2.2)."""
    n, E = num_nodes, int(num_arcs)
    cached = meta_cache.get("meta") if meta_cache is not None else None

    if cached is not None and int(cached[3]) < 63:
        # steady state: ONE dispatch for the whole reconstruction
        total_cop, max_depth = int(cached[2]), int(cached[3])
        hist_key = (tuple(int(c) for c in cached[4:4 + max_depth + 1][1:])
                    if total_cop and max_depth > 0 else ())
        offsets, F, meta_d = parse_and_assemble_auto(
            out, n, cap, min_interval, _quant(E + 1), _quant(total_cop),
            hist_key, depth_iters=max(max_depth, 1))
        if not np.array_equal(np.asarray(meta_d), cached):
            meta_cache.pop("meta", None)
            raise ValueError(
                "token stream changed under a cached reconstruction meta")
        return offsets, F, E

    st = parse_stats(out, n, cap)
    meta = np.asarray(st["meta"])
    if not bool(meta[0]):
        raise ValueError("token stream inconsistent")
    if meta_cache is not None:
        meta_cache["meta"] = meta
    total_cop, max_depth = int(meta[2]), int(meta[3])
    hist = meta[4:]

    Epad = _quant(E + 1)
    Ccap = _quant(total_cop)
    args = (st["v"], st["a1"], st["a2"], st["nib"], st["sp"], st["d"],
            st["offsets"], st["ncop"], st["niv"], st["tail"], st["parent"],
            st["depth"], jnp.int32(total_cop))
    if not (total_cop and max_depth > 0):
        offsets, F, _, _ = _assemble_auto(*args, Epad, Ccap,
                                          min_interval, ())
        return offsets, F, E
    if max_depth < 63:
        hist_key = tuple(int(c) for c in hist[1:max_depth + 1])
        offsets, F, _, _ = _assemble_auto(*args, Epad, Ccap, min_interval,
                                          hist_key)
        return offsets, F, E

    # Depth histogram saturates at 64 buckets (hc-style unbounded
    # chains; cnr-2000 hc reaches depth 4506): resolve with masked
    # rounds over the full worklist, all rounds INSIDE one device
    # while_loop — one dispatch total instead of one per depth
    # (correctness path; depth-serial resolution is structural, and hc
    # graphs trade decode speed for size on the reference too).
    offsets, F, succs, seg = _assemble_auto(*args, Epad, Ccap,
                                            min_interval, ())
    q = jnp.arange(Ccap, dtype=I32)
    _, cb = _depth_order(st["depth"], st["ncop"])
    slotb, dep_el = _bcast_runs_multi(
        Ccap, cb, [st["offsets"][:n] - cb, st["depth"]], st["ncop"] > 0)
    live = q < total_cop
    slot_all = jnp.where(live, slotb + q, Epad)
    # rebuild the packed src channel exactly as assemble does
    srcv = _src_channel(st["v"], st["a1"], st["a2"], st["nib"], st["sp"],
                        st["offsets"], st["parent"], st["depth"],
                        st["ncop"], Ccap)
    src_all = jnp.where(live, jnp.clip(srcv + q, 0, Epad - 1), 0)
    # bounded dispatches: one device program per K rounds — a single
    # program spanning thousands of sort rounds runs for minutes and
    # trips the device execution watchdog (observed as UNAVAILABLE
    # faults on v5e for cnr-2000 hc, depth 4506)
    K = 128
    k0 = 1
    while k0 <= max_depth:
        k1 = min(k0 + K - 1, max_depth)
        succs, F = _deep_rounds(succs, F, seg, slot_all, src_all,
                                dep_el, jnp.int32(k0), jnp.int32(k1))
        k0 = k1 + 1
    return offsets, F, E


@jax.jit
def _deep_rounds(succs, F, seg, slot_all, src_all, dep_el, k_lo, k_hi):
    """Masked depth rounds [k_lo, k_hi] in one device program (dynamic
    trip count): fill depth-k copy slots from the sorted parents,
    re-sort, repeat."""
    Epad = succs.shape[0]

    def body(carry):
        k, succs, F = carry
        idxs = jnp.where(dep_el == k, slot_all, Epad)
        succs = succs.at[idxs].set(F[src_all], mode="drop")
        return k + 1, succs, sort_segments(seg, succs)

    def cond(carry):
        k, _, _ = carry
        return k <= k_hi

    _, succs, F = jax.lax.while_loop(cond, body, (k_lo, succs, F))
    return succs, F


@functools.partial(jax.jit, static_argnames=("Ccap",))
def _src_channel(v, a1, a2, nib, sp, offsets, parent, depth, ncop,
                 Ccap: int):
    """The copy-channel packed-src broadcast on its own (deep-chain
    fallback path; assemble fuses the same logic inline). Token arrays
    are step-major 2D."""
    cap, G = v.shape
    n = sp.shape[0]
    prev_nib = jnp.concatenate([
        jnp.concatenate([jnp.full((1, 1), 0xF, I32), nib[-1:, :-1]],
                        axis=1),
        nib[:-1, :]], axis=0)
    is_blk = nib == 3
    b = v + (is_blk & (prev_nib == 3)).astype(I32)
    is_sum = nib == 9
    _, cb = _depth_order(depth, ncop)
    bvals = jnp.stack([offsets[parent],
                       offsets[jnp.minimum(parent + 1, n)], cb])
    deltas = bvals - jnp.concatenate(
        [jnp.zeros((3, 1), I32), bvals[:, :-1]], axis=1)
    spf = (sp % cap) * G + sp // cap
    bb = _cumsum_tok(_scatter_add_rows(3, cap * G, spf, deltas)
                     .reshape(3, cap, G))
    off_par, off_pend, cbx = bb[0], bb[1], bb[2]
    own = is_blk & ((a2 & 1) == 1) & (b > 0)
    tl = is_sum & (a2 > 0)
    qs = jnp.where(own, cbx + (a2 >> 1), cbx + v - a2)
    val = jnp.where(own, off_par + a1 - qs, off_pend - a2 - qs)
    chC = jnp.zeros(Ccap + 1, I32).at[
        jnp.where(own | tl, qs, Ccap)].set((val << 1) | 1, mode="drop")
    return _ffill_valid(chC[:Ccap]) >> 1

"""Device-side successor-list reconstruction (full graph).

The numpy pipeline in reconstruct_jax.py parses tokens on the host, which
costs a device->host transfer of the whole token buffer plus a host pass.
This module keeps everything on device: decode_blocks output -> CSR
adjacency, as a handful of jits over static shapes (the reference
capability being replaced is the successor reconstruction machinery of
webgraph's BvGraph, executable spec: native/src/bvgraph.hpp
read_successors; SURVEY.md section 2.2).

TPU-first layout choices (same measured rules as ops/decode_jax.py):
- the token stream stays in its padded lane-major [L*cap] layout; every
  per-node quantity is a difference of running cumsums gathered at the
  n node-start positions (O(P) scans + O(n) gathers), NOT token-sized
  scatters;
- interval/copy expansion uses scatter-at-run-starts + cummax forward
  fill + one row gather per element (no log-P searchsorted chains);
- expansion buffer sizes quantize to powers of two, so the jits compile
  a handful of shapes per graph family;
- copy resolution is the same gather + two-key segment sort rounds as
  the host path, entirely on device.

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


def _pow2(x: int) -> int:
    return max(1 << (max(int(x) - 1, 1)).bit_length(), 16)


@functools.partial(jax.jit, static_argnames=("num_nodes", "cap", "Epad",
                                             "min_interval"))
def parse_tokens(out, num_nodes: int, cap: int, Epad: int,
                 min_interval: int):
    """Parses decode_blocks output into per-node fields and prefills the
    residual region of the successor buffer. Returns a dict of device
    arrays; `ok` is False if the token stream is inconsistent."""
    n = num_nodes
    L = out.shape[1]
    P = L * cap
    vals2d = out[:cap]
    cpk = out[cap:]
    steps = jnp.arange(cap)
    nib2d = (cpk[steps // UNROLL] >> ((steps % UNROLL) * 4)[:, None]) & 0xF
    v = vals2d.T.reshape(-1).astype(I32)          # [P]
    nib = nib2d.T.reshape(-1).astype(I32)         # [P]
    pos = jnp.arange(P, dtype=I32)

    is_out = nib == 0
    node_of = jnp.cumsum(is_out.astype(I32)) - 1  # [P]
    nd = jnp.clip(node_of, 0, n - 1)
    # node start positions (position of each outdegree token); invalid
    # lane-tail rows belong to the preceding node and are always masked
    sp = jnp.full((n,), P - 1, I32).at[
        jnp.where(is_out, node_of, n)].set(pos, mode="drop")
    spx = jnp.concatenate([sp, jnp.full((1,), P, I32)])

    def excl(cs):
        """exclusive cumulative: excl(cs)[p] = sum over positions < p."""
        return jnp.concatenate([jnp.zeros(1, I32), cs])

    def node_sum(mask, val):
        """Per-node sum of val over the node's masked tokens (one O(P)
        scan + two O(n) gathers — never a token-sized scatter)."""
        csx = excl(jnp.cumsum(jnp.where(mask, val, 0)))
        return csx[spx[1:]] - csx[spx[:-1]]

    # Fields at fixed offsets from the node start.
    vx = jnp.concatenate([v, jnp.zeros(3, I32)])
    nibx = jnp.concatenate([nib, jnp.full(3, 0xF, I32)])
    d = vx[sp]
    ref = jnp.where(nibx[sp + 1] == 1, vx[sp + 1], 0)
    has_ref = ref > 0
    bc = jnp.where(has_ref & (nibx[sp + 2] == 2), vx[sp + 2], 0)

    is_blk = nib == 3
    # index of each block token within its node
    cs_blk = jnp.cumsum(is_blk.astype(I32))
    blk_idx = cs_blk - 1 - excl(cs_blk)[sp][nd]
    b = v + (blk_idx > 0).astype(I32)             # valid at blk tokens
    blocks_sum = node_sum(is_blk, b)
    ncop_blocks = node_sum(is_blk & (blk_idx % 2 == 0), b)
    parent = jnp.clip(jnp.arange(n, dtype=I32) - ref, 0, n - 1)
    d_ref = jnp.where(has_ref, d[parent], 0)
    tail_len = jnp.where(has_ref & (bc % 2 == 0), d_ref - blocks_sum, 0)
    ncop = ncop_blocks + tail_len

    is_il = nib == 6
    niv_tot = node_sum(is_il, v + min_interval)
    is_fr = nib == 7
    is_res8 = nib == 8
    nres = node_sum(is_fr | is_res8, jnp.ones((P,), I32))

    ok = jnp.all(ncop + niv_tot + nres == d)

    offsets = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(d)])  # [n+1]

    # ---- residual prefill (token-side; residual tokens are contiguous
    # per node: FR then gap runs) ----
    m = is_fr | is_res8
    contrib = jnp.where(is_fr, node_of + _nat2int(v), v + 1)
    c = jnp.cumsum(jnp.where(m, contrib, 0))
    res_val = c - excl(c)[sp][nd]
    cm = jnp.cumsum(m.astype(I32))
    rank = cm - 1 - excl(cm)[sp][nd]
    dest = offsets[nd] + ncop[nd] + niv_tot[nd] + rank
    succs = jnp.zeros((Epad,), I32).at[
        jnp.where(m, dest, Epad)].set(res_val, mode="drop")

    # ---- interval lefts (at IS tokens) ----
    is_is = nib == 5
    prev_nib = jnp.concatenate([jnp.full(1, 0xF, I32), nib[:-1]])
    prev_v = jnp.concatenate([jnp.zeros(1, I32), v[:-1]])
    first_iv = is_is & (prev_nib == 4)
    bcontrib = jnp.where(first_iv, node_of + _nat2int(v),
                         v + 1 + prev_v + min_interval)
    c2 = jnp.cumsum(jnp.where(is_is, bcontrib, 0))
    lefts = c2 - excl(c2)[sp][nd]                 # valid at IS tokens

    # interval-element cumulative (for run expansion) and per-node base
    cum_iv = jnp.cumsum(jnp.where(is_il, v + min_interval, 0))
    node_iv_base = excl(cum_iv)[sp]

    # copy-element cumulative: even-indexed block runs copy; an even block
    # count also copies the reference tail (bvgraph.hpp:69-82). The tail
    # attaches to the node's LAST block token (which may also carry its
    # own copy run), or to the BC token when bc == 0 (whole-list copy).
    is_bc_tok = nib == 2
    nd_ref = has_ref[nd]
    tail_at_bc = is_bc_tok & (v == 0) & nd_ref
    last_blk = is_blk & (blk_idx == bc[nd] - 1)
    tail_here = jnp.where(tail_at_bc | (last_blk & (bc[nd] % 2 == 0)),
                          tail_len[nd], 0)
    cop_own = jnp.where(is_blk & (blk_idx % 2 == 0), b, 0)
    cop_here = cop_own + tail_here
    cum_cop = jnp.cumsum(cop_here)
    csx_cop = jnp.concatenate([jnp.zeros(1, I32), cum_cop])
    node_cop_base = csx_cop[sp[:n]]
    # start position of each block run within the REFERENCED list
    # (= running sum of block lengths before this block token)
    cs_b = jnp.cumsum(jnp.where(is_blk, b, 0))
    node_b_base = jnp.concatenate([jnp.zeros(1, I32), cs_b])[sp[:n]]
    blk_run_start = (cs_b - jnp.where(is_blk, b, 0)) - node_b_base[nd]

    # ---- reference-chain depths ----
    depth0 = jnp.where(has_ref, -1, 0)

    def dcond(carry):
        depth, k = carry
        return jnp.any(depth < 0) & (k < n)

    def dbody(carry):
        depth, k = carry
        pd = depth[parent]
        depth = jnp.where((depth < 0) & (pd == k), k + 1, depth)
        return depth, k + 1

    depth, _ = jax.lax.while_loop(dcond, dbody, (depth0, jnp.zeros((), I32)))
    max_depth = jnp.max(depth)

    # segment id per successor slot
    seg = jnp.cumsum(jnp.zeros((Epad,), I32).at[
        jnp.where(offsets[1:n + 1] < Epad, offsets[1:n + 1], Epad)
    ].add(1, mode="drop"))  # slot e -> node (0-based; slots >= E get n..)

    return dict(
        v=v, nib=nib, node_of=nd, offsets=offsets, seg=seg, succs=succs,
        d=d, ref=ref, parent=parent, ncop=ncop, niv_tot=niv_tot,
        depth=depth, max_depth=max_depth, ok=ok,
        lefts=lefts, cum_iv=cum_iv, node_iv_base=node_iv_base,
        total_iv=cum_iv[-1],
        cop_own=cop_own, cop_here=cop_here, cum_cop=cum_cop,
        node_cop_base=node_cop_base, blk_run_start=blk_run_start,
        blocks_sum=blocks_sum, total_cop=cum_cop[-1],
    )


def _ffill_token_index(starts_mask, token_pos, cap_size: int, cum_excl):
    """Scatter each run's token position at its first element index
    (cum_excl, the exclusive cumulative of run lengths), then forward-fill
    with cummax: element t -> the token position of its run."""
    arr = jnp.full((cap_size,), -1, I32).at[
        jnp.where(starts_mask, cum_excl, cap_size)
    ].set(jnp.where(starts_mask, token_pos, -1), mode="drop")
    return jax.lax.cummax(arr)


@functools.partial(jax.jit, static_argnames=("Ecap", "Epad", "min_interval"))
def expand_intervals(pr, Ecap: int, Epad: int, min_interval: int):
    """Fills the interval region of the successor buffer: one forward-fill
    over Ecap elements + row gathers at the owning IL token."""
    v, nib = pr["v"], pr["nib"]
    is_il = nib == 6
    P = v.shape[0]
    pos = jnp.arange(P, dtype=I32)
    cum_excl = pr["cum_iv"] - jnp.where(is_il, v + min_interval, 0)
    p_t = _ffill_token_index(is_il & (v + min_interval > 0), pos, Ecap,
                             cum_excl)
    p_t = jnp.clip(p_t, 0, P - 1)
    t = jnp.arange(Ecap, dtype=I32)
    maskt = t < pr["total_iv"]
    node_t = pr["node_of"][p_t]
    run_start_cum = cum_excl[p_t]
    left_t = pr["lefts"][jnp.maximum(p_t - 1, 0)]   # IS precedes IL
    val_t = left_t + (t - run_start_cum)
    offsets, ncop = pr["offsets"], pr["ncop"]
    dest = offsets[node_t] + ncop[node_t] + (t - pr["node_iv_base"][node_t])
    return pr["succs"].at[jnp.where(maskt, dest, Epad)].set(
        val_t, mode="drop")


@functools.partial(jax.jit, static_argnames=("Ccap",))
def build_copy_plan(pr, Ccap: int):
    """Expands copy runs into (dest slot, src slot, depth) triples of the
    copied elements, via the same scatter + forward-fill trick."""
    v, nib = pr["v"], pr["nib"]
    P = v.shape[0]
    pos = jnp.arange(P, dtype=I32)
    cop_here = pr["cop_here"]
    cum_excl = pr["cum_cop"] - cop_here
    p_t = _ffill_token_index(cop_here > 0, pos, Ccap, cum_excl)
    p_t = jnp.clip(p_t, 0, P - 1)
    t = jnp.arange(Ccap, dtype=I32)
    maskt = t < pr["total_cop"]
    node_t = pr["node_of"][p_t]
    # a token's combined run = [own even-indexed block run | tail]; the
    # own part copies from blk_run_start, the tail from blocks_sum
    intra = t - cum_excl[p_t]
    own_len = pr["cop_own"][p_t]
    in_tail = intra >= own_len
    refpos = jnp.where(in_tail,
                       pr["blocks_sum"][node_t] + (intra - own_len),
                       pr["blk_run_start"][p_t] + intra)
    offsets, parent = pr["offsets"], pr["parent"]
    rank = t - pr["node_cop_base"][node_t]
    cop_slot = offsets[node_t] + rank
    cop_src = offsets[parent[node_t]] + refpos
    cop_depth = jnp.where(maskt, pr["depth"][node_t], -1)
    Epad = pr["succs"].shape[0]
    cop_slot = jnp.where(maskt, cop_slot, Epad - 1)
    cop_src = jnp.where(maskt, cop_src, Epad - 1)
    return cop_slot, cop_src, cop_depth


@jax.jit
def sort_segments(seg, s):
    _, s2 = jax.lax.sort((seg, s), num_keys=2)
    return s2


@jax.jit
def fill_round(s, cslot, csrc, cdepth, k):
    take = cdepth == k
    vals = jnp.where(take, s[csrc], s[cslot])
    return s.at[cslot].set(vals)


def reconstruct_device(out, num_nodes: int, num_arcs: int, cap: int,
                       min_interval: int):
    """Full-graph device reconstruction from decode_blocks output.

    Returns (offsets [n+1] i32 device, succs [Epad] i32 device, E) with
    the successor lists bit-exact in succs[:E]; raises on inconsistent
    token streams. Reference capability: webgraph BvGraph successor
    machinery (SURVEY.md section 2.2)."""
    n, E = num_nodes, int(num_arcs)
    Epad = _pow2(E + 1)
    pr = parse_tokens(out, n, cap, Epad, min_interval)
    if not bool(pr["ok"]):
        raise ValueError("token stream inconsistent")
    total_iv = int(pr["total_iv"])
    total_cop = int(pr["total_cop"])
    max_depth = int(pr["max_depth"])

    succs = pr["succs"]
    if total_iv:
        succs = expand_intervals(
            {**pr}, _pow2(total_iv), Epad, min_interval)
    seg = pr["seg"]
    succs = sort_segments(seg, succs)
    if total_cop and max_depth > 0:
        pr2 = {**pr, "succs": succs}
        cop_slot, cop_src, cop_depth = build_copy_plan(
            pr2, _pow2(total_cop))
        for k in range(1, max_depth + 1):
            succs = fill_round(succs, cop_slot, cop_src, cop_depth,
                               jnp.int32(k))
            succs = sort_segments(seg, succs)
    return pr["offsets"], succs, E

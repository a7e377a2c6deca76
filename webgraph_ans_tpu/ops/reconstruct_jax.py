"""TPU successor-list reconstruction from decoded (component, value) tokens.

The reference reconstructs successor lists serially, one node at a time,
resolving copy-list references recursively (our executable spec:
native/src/bvgraph.hpp read_successors; reference: the webgraph crate's
BvGraph machinery, SURVEY.md section 2.2). Here this becomes a data-parallel
pipeline over ALL nodes at once:

1. parse: flat token stream -> per-node fields (outdegree, reference,
   copy blocks, intervals, residual gaps) with mask/segment ops;
2. prefill: interval expansions and residual gap prefix-sums are
   reference-free, computed for every node in one shot (segmented cumsum);
3. rounds (device): nodes at reference-chain depth k copy from their
   already-resolved-and-sorted referenced list via one gather, then one
   global (segment_id, value) two-key sort re-sorts every successor list.
   Chain depth is bounded by max_ref_count (default 3), so a handful of
   gather+sort rounds replaces the reference's per-node recursion.

The parse/prefill index plans are tiny vectorized host passes whose outputs
feed device gathers; the O(arcs * rounds) work (gather + sort) runs on
device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---- host helpers (vectorized numpy) ----

def _np_nat2int(v):
    """Inverse of int2nat: even v -> v/2, odd v -> -(v/2)-1."""
    v = np.asarray(v, dtype=np.int64)
    return np.where(v & 1 == 1, -((v >> 1) + 1), v >> 1)


def _np_seg_cumsum(vals, firsts):
    """Inclusive cumulative sum over flat `vals`, restarting wherever
    `firsts` is True. Works for signed values."""
    vals = np.asarray(vals, dtype=np.int64)
    c = np.cumsum(vals)
    seg_idx = np.cumsum(firsts) - 1
    bases = (c - vals)[firsts]
    return c - bases[seg_idx]


def _np_intra_count(seg_ids):
    """Position of each element within its (contiguous) run of equal ids."""
    k = len(seg_ids)
    if k == 0:
        return np.zeros(0, np.int64)
    firsts = np.ones(k, bool)
    firsts[1:] = seg_ids[1:] != seg_ids[:-1]
    return _np_seg_cumsum(np.ones(k, np.int64), firsts) - 1


def _np_ragged(lengths, total):
    """(segment index, intra position) for positions 0..total-1 laid out as
    consecutive segments of the given lengths (zero lengths allowed)."""
    cum = np.cumsum(lengths)
    pos = np.arange(total)
    seg = np.searchsorted(cum, pos, side="right")
    starts = cum - lengths
    return seg, pos - starts[seg]


def reconstruct(values: np.ndarray, comps: np.ndarray, num_nodes: int,
                min_interval: int, node_ids: np.ndarray | None = None):
    """Reconstructs the CSR adjacency (offsets u64, succs u32) from the
    forward-order token stream.

    With node_ids=None the stream covers nodes 0..num_nodes-1 in order.
    Otherwise it covers exactly the nodes listed in node_ids (ascending
    unique graph node ids, num_nodes of them) — used by random access,
    where the decoded set is the query set plus its reference closure; the
    set must be closed under references (x in set and x references x-r
    implies x-r in set)."""
    values = np.asarray(values, dtype=np.int64)
    comps = np.asarray(comps, dtype=np.int8)

    # ---- per-node field extraction ----
    is_out = comps == 0
    node_of = np.cumsum(is_out) - 1
    d = values[is_out].astype(np.int64)
    n = num_nodes
    assert len(d) == n, f"expected {n} outdegree tokens, got {len(d)}"
    if node_ids is None:
        gid = np.arange(n, dtype=np.int64)       # local index -> graph node id
        local_of_gid = None
    else:
        gid = np.asarray(node_ids, dtype=np.int64)
        assert len(gid) == n and np.all(np.diff(gid) > 0)
        local_of_gid = True  # sentinel: use searchsorted mapping below

    ref = np.zeros(n, np.int64)
    m = comps == 1
    ref[node_of[m]] = values[m]
    has_ref = ref > 0

    bc = np.zeros(n, np.int64)
    m = comps == 2
    bc[node_of[m]] = values[m]

    m = comps == 3
    blk_node = node_of[m]
    blk_raw = values[m]
    blk_first = np.ones(len(blk_node), bool)
    blk_first[1:] = blk_node[1:] != blk_node[:-1]
    # block i>0 is stored minus one (native/src/bvgraph.hpp:65)
    blocks = blk_raw + (~blk_first)

    m5 = comps == 5
    m6 = comps == 6
    iv_node = node_of[m5]
    iv_start_tok = values[m5].astype(np.int64)
    iv_len = values[m6] + min_interval

    m7 = comps == 7
    m8 = comps == 8
    fr = np.zeros(n, np.int64)
    fr[node_of[m7]] = values[m7]
    res_gap_node = node_of[m8]
    res_gap = values[m8]
    nres = np.zeros(n, np.int64)
    nres[node_of[m7]] = 1
    np.add.at(nres, res_gap_node, 1)

    # ---- copied-element plan (even-indexed runs copy; even block count
    # also copies the tail of the reference list: bvgraph.hpp:69-82) ----
    if local_of_gid is None:
        parent_local = np.maximum(np.arange(n) - ref, 0)
    else:
        parent_local = np.searchsorted(gid, gid - ref)
        parent_local = np.minimum(parent_local, n - 1)
        assert np.all(gid[parent_local[has_ref]] == (gid - ref)[has_ref]), \
            "decoded node set is not closed under references"
    d_ref = np.where(has_ref, d[parent_local], 0)
    blk_idx = _np_intra_count(blk_node)
    run_start = _np_seg_cumsum(blocks, blk_first) - blocks
    is_copy_run = blk_idx % 2 == 0
    blocks_sum = np.zeros(n, np.int64)
    np.add.at(blocks_sum, blk_node, blocks)
    tail_len = np.where(has_ref & (bc % 2 == 0), d_ref - blocks_sum, 0)
    ncop = np.zeros(n, np.int64)
    np.add.at(ncop, blk_node[is_copy_run], blocks[is_copy_run])
    ncop += tail_len

    niv_tot = np.zeros(n, np.int64)
    np.add.at(niv_tot, iv_node, iv_len)
    assert np.all(ncop + niv_tot + nres == d), "token stream inconsistent"

    tail_nodes = np.nonzero(tail_len)[0]
    cop_runs_node = np.concatenate([blk_node[is_copy_run], tail_nodes])
    cop_runs_start = np.concatenate([run_start[is_copy_run], blocks_sum[tail_nodes]])
    cop_runs_len = np.concatenate([blocks[is_copy_run], tail_len[tail_nodes]])
    keep = cop_runs_len > 0
    cop_runs_node, cop_runs_start, cop_runs_len = (
        cop_runs_node[keep], cop_runs_start[keep], cop_runs_len[keep])
    order = np.lexsort((cop_runs_start, cop_runs_node))
    cop_runs_node = cop_runs_node[order]
    cop_runs_start = cop_runs_start[order]
    cop_runs_len = cop_runs_len[order]

    # ---- reference-chain depths (bounded by max_ref_count) ----
    depth = np.where(has_ref, -1, 0)
    k = 0
    while (depth < 0).any():
        idx = np.nonzero(depth < 0)[0]
        ok = depth[parent_local[idx]] == k
        depth[idx[ok]] = k + 1
        k += 1
        if k > n:
            raise ValueError("reference chains do not resolve")
    max_depth = int(depth.max())

    # ---- CSR layout ----
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(d, out=offsets[1:])
    E = int(offsets[-1])
    seg_of_slot = np.repeat(np.arange(n), d)

    succs = np.zeros(E, np.int64)

    # interval expansion: left_0 = x + nat2int(s_0); left_i = prev + s_i + 1
    if len(iv_node):
        iv_first = np.ones(len(iv_node), bool)
        iv_first[1:] = iv_node[1:] != iv_node[:-1]
        prev_len = np.zeros(len(iv_len), np.int64)
        prev_len[1:] = np.where(iv_first[1:], 0, iv_len[:-1])
        b = np.where(iv_first, gid[iv_node] + _np_nat2int(iv_start_tok),
                     iv_start_tok + 1) + prev_len
        lefts = _np_seg_cumsum(b, iv_first)
        E_iv = int(iv_len.sum())
        iv_seg, iv_intra = _np_ragged(iv_len, E_iv)
        iv_val_node = iv_node[iv_seg]
        iv_rank = _np_intra_count(iv_val_node)
        succs[offsets[iv_val_node] + ncop[iv_val_node] + iv_rank] = (
            lefts[iv_seg] + iv_intra)

    # residual expansion: r_0 = x + nat2int(fr); r_i = prev + gap + 1
    res_nodes = np.nonzero(nres > 0)[0]
    if len(res_nodes):
        flat_node = np.concatenate([res_nodes, res_gap_node])
        contrib = np.concatenate(
            [gid[res_nodes] + _np_nat2int(fr[res_nodes]), res_gap + 1])
        pos = np.concatenate([np.zeros(len(res_nodes), np.int64),
                              _np_intra_count(res_gap_node) + 1])
        order = np.lexsort((pos, flat_node))
        flat_node = flat_node[order]
        contrib = contrib[order]
        firsts = np.ones(len(flat_node), bool)
        firsts[1:] = flat_node[1:] != flat_node[:-1]
        res_vals = _np_seg_cumsum(contrib, firsts)
        rank = _np_intra_count(flat_node)
        succs[offsets[flat_node] + ncop[flat_node] + niv_tot[flat_node] +
              rank] = res_vals

    # copied plan expansion -> (destination slot, source slot, depth)
    E_cop = int(cop_runs_len.sum())
    if E_cop:
        cop_seg, cop_intra = _np_ragged(cop_runs_len, E_cop)
        cop_node = cop_runs_node[cop_seg]
        cop_refpos = cop_runs_start[cop_seg] + cop_intra
        cop_rank = _np_intra_count(cop_node)
        cop_slot = offsets[cop_node] + cop_rank
        cop_src = offsets[parent_local[cop_node]] + cop_refpos
        cop_depth = depth[cop_node]

    if max_depth <= 8:
        # ---- device rounds: gather copied values, re-sort all segments
        # (chain depth is bounded by max_ref_count; the default 3 gives a
        # handful of gather+sort rounds). Arrays pad to a power-of-two
        # length (sentinel segment sorts last) so the jitted sorts reuse a
        # handful of compiled shapes across graphs. ----
        Epad = max(1 << (max(E - 1, 1)).bit_length(), 16)
        succs_p = np.zeros(Epad, np.int32)
        succs_p[:E] = succs.astype(np.int32)
        seg_p = np.full(Epad, n, np.int32)
        seg_p[:E] = seg_of_slot.astype(np.int32)
        succs_j = jnp.asarray(succs_p)
        seg_j = jnp.asarray(seg_p)

        @jax.jit
        def sort_segments(seg, s):
            _, s2 = jax.lax.sort((seg, s), num_keys=2)
            return s2

        succs_j = sort_segments(seg_j, succs_j)  # depth-0 nodes resolved
        if E_cop:
            Cpad = max(1 << (max(E_cop - 1, 1)).bit_length(), 16)
            cs = np.full(Cpad, Epad - 1, np.int32)
            cs[:E_cop] = cop_slot.astype(np.int32)
            cr = np.full(Cpad, Epad - 1, np.int32)
            cr[:E_cop] = cop_src.astype(np.int32)
            cd = np.full(Cpad, -1, np.int32)
            cd[:E_cop] = cop_depth.astype(np.int32)
            cop_slot_j = jnp.asarray(cs)
            cop_src_j = jnp.asarray(cr)
            cop_depth_j = jnp.asarray(cd)

            @jax.jit
            def fill_round(s, cslot, csrc, cdepth, k):
                take = cdepth == k
                vals = jnp.where(take, s[csrc], s[cslot])
                return s.at[cslot].set(vals)

            for k in range(1, max_depth + 1):
                succs_j = fill_round(succs_j, cop_slot_j, cop_src_j,
                                     cop_depth_j, jnp.int32(k))
                succs_j = sort_segments(seg_j, succs_j)

        return (offsets.astype(np.uint64),
                np.asarray(succs_j[:E]).astype(np.uint32))

    # ---- deep-chain fallback (high-compression mode: max_ref_count is
    # effectively unbounded, so chains can be thousands deep): per round,
    # sort only that round's node segments on the host. Total work stays
    # O(E log E) because each segment is sorted exactly once. ----
    order0 = np.nonzero(depth[seg_of_slot] == 0)[0]
    s0 = succs[order0]
    seg0 = seg_of_slot[order0]
    perm = np.lexsort((s0, seg0))
    succs[order0] = s0[perm]
    for k in range(1, max_depth + 1):
        if E_cop:
            sel = np.nonzero(cop_depth == k)[0]
            if len(sel):
                succs[cop_slot[sel]] = succs[cop_src[sel]]
        slots_k = np.nonzero(depth[seg_of_slot] == k)[0]
        sk = succs[slots_k]
        segk = seg_of_slot[slots_k]
        perm = np.lexsort((sk, segk))
        succs[slots_k] = sk[perm]
    return offsets.astype(np.uint64), succs.astype(np.uint32)

"""TPU batch random access: decode the successor lists of arbitrary query
nodes.

The reference resolves references recursively, one decoder per node
(reference: src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58 plus the
webgraph BvGraph recursion). Here recursion becomes iterative wave decoding,
everything batched:

- wave 0: one decode lane per (deduplicated) query node, entering at its
  phase; rings are seeded with the window's outdegrees (also lane-parallel
  single-token decodes, like the reference's from_raw_parts entry).
- wave k+1: the referenced nodes discovered in wave k that are not yet
  decoded. Waves are bounded by max_ref_count.
- reconstruction: one subset-reconstruct over the union of all waves (the
  reference closure), then the query rows are emitted in query order.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..bvgraph.graph import Adjacency
from .graph_decode import TpuGraphDecoder
from .decode_jax import (ROW_SHIFT, UNROLL, decode_blocks, round_cap,
                         seed_rings)
from .reconstruct_jax import _np_ragged, reconstruct


class TpuRandomAccess:
    """On-demand batch random access: queried lists are decoded from the
    COMPRESSED artifacts per batch (no device CSR cache; contrast
    TpuCsrServer below). Works on phase-sampled artifacts too: the unit
    of decode is the ENTRY SEGMENT — the nodes between two consecutive
    valid entry points (one node per segment at phase_step=1) — so a
    query decodes forward from its preceding entry, exactly like the
    native skip-decoder (reference analog: the per-node decoder factory,
    src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58)."""

    def __init__(self, decoder: TpuGraphDecoder):
        self.dec = decoder
        nodes, _, _ = decoder._entries()
        self._entry_nodes = nodes                # ascending, [0] == 0

    def _seg_of(self, nodes: np.ndarray) -> np.ndarray:
        return np.searchsorted(self._entry_nodes, nodes, side="right") - 1

    def _seg_bounds(self, segs: np.ndarray):
        e = self._entry_nodes
        starts = e[segs]
        ends = np.where(segs + 1 < len(e), e[np.minimum(segs + 1,
                                                        len(e) - 1)],
                        self.dec.num_nodes)
        return starts.astype(np.int64), ends.astype(np.int64)

    def _decode_segments(self, segs: np.ndarray, cap: int):
        """Decodes every token of the given entry segments (one lane
        each). Returns (vals2d [L, cap], comps2d, counts) as numpy, rows
        in `segs` order. Lane counts are padded to the next power of two
        (with repeats of segment 0) so wave decoding reuses a handful of
        compiled shapes."""
        d = self.dec
        W = d.window
        true_len = len(segs)
        L = 1 << max(true_len - 1, 1).bit_length()
        if L > true_len:
            segs = np.concatenate(
                [segs, np.zeros(L - true_len, dtype=segs.dtype)])
        starts, ends = self._seg_bounds(segs)
        entry_states, entry_ptrs = d._entry_lookup(starts)
        starts_d = jnp.asarray(starts.astype(np.int32))
        if W > 0 and d.phase_step == 1:
            host_states = d.states_np
            host_ptrs = d.pointers
            pre = starts[:, None] - W + np.arange(W)[None, :]
            pre_cl = np.clip(pre, 0, d.num_nodes - 1)
            ring = seed_rings(d.params, d.tables,
                              jnp.asarray(host_states[pre_cl]),
                              jnp.asarray(host_ptrs[pre_cl]),
                              starts_d, W)
        elif W > 0:
            ring = jnp.asarray(d._rings_via_native(starts, W))
        else:
            ring = jnp.zeros((L, 1), jnp.int32)
        cap = round_cap(d.params, cap)
        while True:
            out, counts, ok = decode_blocks(
                d.params, d.tables,
                jnp.asarray(entry_states), jnp.asarray(entry_ptrs),
                starts_d, jnp.asarray(ends.astype(np.int32)), ring,
                W, d.min_interval, cap)
            if bool(np.all(np.asarray(ok))):
                break
            cap *= 2
        out = np.asarray(out)
        counts = np.asarray(counts)
        vals2d = out[:cap].T                      # [L, cap]
        cpk = out[cap:]
        steps = np.arange(cap)
        comps2d = ((cpk[steps // UNROLL, :] >> ((steps % UNROLL) * 4)[:, None])
                   & 0xF).astype(np.uint8).T     # [L, cap]
        return vals2d[:true_len], comps2d[:true_len], counts[:true_len]

    def _decode_nodes(self, nodes: np.ndarray, cap: int):
        """Single-node decode rows (one node per lane); requires
        per-node phases (phase_step=1). Kept for the multihost shard
        closure, which slices per-node token rows."""
        if self.dec.phase_step != 1:
            raise ValueError("_decode_nodes needs per-node phases")
        return self._decode_segments(np.asarray(nodes, np.int64), cap)

    def successors_batch(self, query_nodes, cap: int = 512) -> Adjacency:
        query = np.asarray(query_nodes, dtype=np.int64)
        n = self.dec.num_nodes
        nseg = len(self._entry_nodes)
        todo = np.unique(self._seg_of(np.unique(query)))
        seen = np.zeros(nseg, dtype=bool)
        waves = []
        guard = 0
        while todo.size:
            seen[todo] = True
            vals, comps, counts = self._decode_segments(todo, cap)
            starts, _ends = self._seg_bounds(todo)
            waves.append((todo, starts, vals, comps,
                          counts.astype(np.int64)))
            # per-node references inside each lane's flattened tokens:
            # node id = segment start + (outdegree tokens seen - 1)
            rowmask = np.arange(vals.shape[1])[None, :] < counts[:, None]
            fv = vals[rowmask]
            fc = comps[rowmask]
            lane = np.repeat(np.arange(len(todo)), counts)
            is_out = fc == 0
            local = np.cumsum(is_out) - 1
            lane_base = np.zeros(len(todo), np.int64)
            lane_base[1:] = np.cumsum(
                np.bincount(lane[is_out], minlength=len(todo)))[:-1]
            node_of = starts[lane] + (local - lane_base[lane])
            m = (fc == 1) & (fv > 0)
            parents = node_of[m] - fv[m].astype(np.int64)
            todo = np.unique(self._seg_of(parents))
            todo = todo[~seen[todo]]
            guard += 1
            if guard > 64 and todo.size:
                raise RuntimeError(
                    "reference chains too deep for random access waves")

        # order segments ascending; tokens then cover strictly ascending
        # node ranges, which reconstruct(node_ids=...) requires
        per = []
        for segs, starts, vals, comps, counts in waves:
            rowmask = np.arange(vals.shape[1])[None, :] < counts[:, None]
            per.append((vals[rowmask], comps[rowmask], counts))
        # per-lane token slices in ascending segment order
        bounds = []
        off = 0
        for (segs, starts, _v, _c, counts) in waves:
            ends_tok = np.cumsum(counts)
            starts_tok = ends_tok - counts
            for i in range(len(segs)):
                bounds.append((segs[i], off + starts_tok[i],
                               off + ends_tok[i]))
            off += int(ends_tok[-1]) if len(counts) else 0
        all_v = np.concatenate([p[0] for p in per])
        all_c = np.concatenate([p[1] for p in per])
        bounds.sort(key=lambda t: t[0])
        flat_v = np.concatenate([all_v[a:b] for _, a, b in bounds])
        flat_c = np.concatenate([all_c[a:b] for _, a, b in bounds])
        seg_ids = np.array([s for s, _, _ in bounds], np.int64)
        sstarts, sends = self._seg_bounds(seg_ids)
        ids = np.concatenate(
            [np.arange(a, b, dtype=np.int64)
             for a, b in zip(sstarts, sends)]) if len(seg_ids) else \
            np.zeros(0, np.int64)
        offsets, succs = reconstruct(flat_v, flat_c, len(ids),
                                     self.dec.min_interval, node_ids=ids)

        # emit query rows in query order (ragged gather)
        loc = np.searchsorted(ids, query)
        row_lens = (offsets[loc + 1] - offsets[loc]).astype(np.int64)
        out_off = np.zeros(len(query) + 1, np.uint64)
        out_off[1:] = np.cumsum(row_lens)
        total = int(out_off[-1])
        seg, intra = _np_ragged(row_lens, total)
        out = succs[offsets[loc[seg]].astype(np.int64) + intra]
        return Adjacency(out_off, out.astype(np.uint32))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def gather_rows(offsets, succs, q, out_cap: int):
    """Ragged row gather from a device CSR: emit the successor lists of
    query nodes q (any order, repeats allowed) concatenated into a dense
    [out_cap] buffer. Returns (out, out_off, total); entries past `total`
    are zero. All device ops: one B-gather for row lengths, one scatter-add
    + cumsum for the output segment ids (empty rows collapse naturally),
    one out_cap-gather for the values."""
    B = q.shape[0]
    q = q.astype(jnp.int32)
    row_start = offsets[q]
    row_len = offsets[q + 1] - row_start
    out_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(row_len)])
    total = out_off[B]
    bumps = jnp.zeros(out_cap, jnp.int32).at[out_off[1:]].add(
        1, mode="drop")
    seg = jnp.clip(jnp.cumsum(bumps), 0, B - 1)
    t = jnp.arange(out_cap, dtype=jnp.int32)
    # rebase combines "row start in succs" and "row start in out" into
    # one per-query value, so the out_cap-scale work is TWO gathers
    # (rebase[seg], succs[src]) instead of four — gathers dominate at
    # ~7 ns/element on v5e (tools/probe_prims2.py)
    rebase = row_start - out_off[:B]
    src = rebase[seg] + t
    live = t < total
    out = jnp.where(live, succs[jnp.where(live, src, 0)], 0)
    return out, out_off, total


class TpuCsrServer:
    """Random-access serving, TPU-architecture: decode the whole graph to a
    device-resident CSR once (the compressed artifacts stay the storage
    format), then serve arbitrary query batches as pure device gathers.

    This is the TPU counterpart of the reference's random-access benchmark
    (examples/bench_random_access.rs: 10M random successor enumerations):
    on an accelerator the decode cost amortizes across the query stream
    after ~30 full-graph-equivalents of queries, and each batch is
    HBM-bandwidth-bound instead of decode-bound. For compressed-resident
    on-demand decode (no CSR cache) use TpuRandomAccess.successors_batch.
    """

    def __init__(self, decoder: TpuGraphDecoder, num_lanes: int = 2048):
        self.dec = decoder
        offsets_d, succs_d, E = decoder.decode_to_csr_device(
            num_lanes=num_lanes)
        self.offsets = offsets_d
        self.succs = succs_d
        self.num_arcs = E

    def serve(self, queries, out_cap: int | None = None):
        """Returns (out, out_off, total) device arrays for one query batch;
        out[:total] is the concatenation of the queried successor lists.
        Raises if out_cap (default: B * max outdegree estimate via retry)
        is exceeded."""
        from .reconstruct_device import _quant

        q = jnp.asarray(np.asarray(queries, dtype=np.int32))
        if out_cap is None:
            out_cap = _quant(int(q.shape[0]) * 8)
        out, out_off, total = gather_rows(
            self.offsets, self.succs, q, out_cap)
        if int(total) > out_cap:
            # total is exact even when the buffer overflowed: one retry
            out, out_off, total = gather_rows(
                self.offsets, self.succs, q, _quant(int(total)))
        return out, out_off, total

    def successors_batch(self, queries) -> Adjacency:
        q = np.asarray(queries, dtype=np.int64)
        out, out_off, total = self.serve(q)
        off = np.asarray(out_off).astype(np.uint64)
        return Adjacency(off, np.asarray(out[:int(total)]).astype(np.uint32))


class TpuEmitRandomAccess:
    """On-demand batch random access through the merged-emit kernel:
    each (deduplicated) query becomes one decode lane covering
    [query - 4*window, query]; the kernel resolves the whole reference
    closure IN-LANE (ancestors precede the query in the lane) and emits
    the query's FINAL sorted successor list, extracted per lane from the
    marker registers — no waves, no host reconstruction. Queries the
    kernel cannot resolve (ring/queue overflow; rare) fall back to the
    native per-node decoder.

    Works on serial artifacts (per-node phases, no encode blocks) —
    lane entries may sit anywhere there; TpuRandomAccess (wave decode)
    remains the general path. Reference protocol analog:
    examples/bench_random_access.rs."""

    def __init__(self, decoder: TpuGraphDecoder):
        d = decoder
        if d.graph.prelude.blocks is not None:
            raise ValueError("emit random access needs a serial artifact "
                             "(lanes must not cross encode blocks)")
        if d.phase_step != 1:
            raise ValueError("emit random access needs per-node phases")
        if d.window > 12:
            raise ValueError("emit random access validated for "
                             "window <= 12 (hc-class artifacts use "
                             "TpuRandomAccess)")
        self.dec = d
        from . import decode_pallas as dp
        if not hasattr(d, "_pallas_lut"):
            d._pallas_lut = dp.build_pallas_lut(d.params, d.lut_np)
        self.lut = d._pallas_lut[0]
        self.H = 4 * d.window

    def _plan(self, q: np.ndarray, nch: int, gpad: int):
        from . import decode_pallas as dp
        from .emit_pallas import make_emit_init_regs

        d = self.dec
        n = d.num_nodes
        W = d.window
        starts = np.maximum(q - self.H, 0)
        ends = q + 1
        base, rel = d._lane_bases(starts, ends)
        entry_abs = ((base.astype(np.int64) << ROW_SHIFT)
                     + rel.astype(np.int64))
        end_abs = d.pointers[np.minimum(ends, n - 1)]
        end_abs = np.where(ends < n, end_abs, 0)
        seg_base, smaxp = dp.plan_segments(entry_abs, end_abs,
                                           d.params[10])
        seg_pad = np.zeros(gpad, seg_base.dtype)
        seg_pad[:len(seg_base)] = seg_base
        if len(d.tables.stream_rows.reshape(-1)) < 1 << 31:
            seg_pad = seg_pad.astype(np.int32)
        slab = dp.build_slab(d.tables.stream_rows, jnp.asarray(seg_pad),
                             smaxp, gpad // nch)
        if W > 0:
            pre = starts[:, None] - W + np.arange(W)[None, :]
            pre_cl = np.clip(pre, 0, n - 1)
            seed_rel = (d.pointers[pre_cl]
                        - (base.astype(np.int64) << ROW_SHIFT)[:, None])
            ring = seed_rings(
                d.params, d.tables, jnp.asarray(d.states_np[pre_cl]),
                jnp.asarray(seed_rel.astype(np.int32)),
                jnp.asarray(starts), W, jnp.asarray(base))
        else:
            ring = jnp.zeros((len(starts), 1), jnp.int32)
        rel_seg = entry_abs - 2 * seg_base
        init = make_emit_init_regs(
            jnp.asarray(d.states_np[np.minimum(starts, n - 1)]),
            jnp.asarray(rel_seg.astype(np.int32)), starts, ends, ring,
            W, pad_to_lanes=gpad, num_chunks=nch, real_starts=q)
        return slab, init

    def successors_batch(self, query_nodes, cap: int = 768) -> Adjacency:
        from .emit_pallas import decode_emit_pallas
        from .emit_post import _expand_spans
        from .reconstruct_device import _quant

        d = self.dec
        query = np.asarray(query_nodes, dtype=np.int64)
        q, inv = np.unique(query, return_inverse=True)
        B = len(q)
        # chunk width under the same VMEM budgets as the full decode;
        # pad to the CALLER's batch size so the kernel shape (and its
        # compile) is stable across batches even as the dedup count
        # varies
        T = 512
        Gc = 1024
        nch = max(-(-len(query) // Gc), 1)
        gpad = nch * Gc
        qp = np.concatenate([q, np.full(gpad - B, d.num_nodes - 1,
                                        np.int64)])
        # padding lanes are EMPTY (start == end): make_emit_init_regs
        # marks them done immediately
        slab, init = self._plan(qp, nch, gpad)
        import os
        interp = os.environ.get("WGT_PALLAS") == "interpret"
        cap = -(-cap // UNROLL) * UNROLL
        val, xch, nib, rows, ok, diag = decode_emit_pallas(
            d.params, self.lut, slab, init, d.window,
            d.min_interval, cap, T=T, interpret=interp)
        # one combined fetch: ok + rows + marker diag
        fin = np.asarray(jnp.concatenate(
            [ok[None, :].astype(jnp.int32), rows[None, :], diag[:2]],
            axis=0))[:, :B]
        rows_used = fin[1]
        markrow = fin[2]
        mdirty = fin[3]
        start = markrow + (mdirty & 1)
        dd = np.where(mdirty & 2, 0, rows_used - start).astype(np.int64)
        # lanes that exceeded the fixed cap (a giant node in the halo)
        # join the dirty lanes on the native fallback path instead of
        # forcing a batch-wide cap regrow + recompile
        clean = ((mdirty & 1) == 0) & (fin[0] != 0)
        if (~clean).sum() > max(64, B // 3):
            raise RuntimeError(
                f"emit random access: {int((~clean).sum())}/{B} lanes "
                "unresolved; artifact unsuited (use TpuRandomAccess)")
        dd_c = np.where(clean, dd, 0)
        offs = np.concatenate([[0], np.cumsum(dd_c)])
        total = int(offs[-1])
        # hard power-of-two bucket: out_cap变 per batch would recompile
        # the extraction program every call
        out_cap = 1 << max(int(total).bit_length(), 12)
        Lp = val.shape[1]
        # pad the lane-side inputs to the fixed gpad so the extraction
        # program compiles once (the dedup count varies per batch)
        gp = Lp

        def padg(a, dtype):
            o = np.zeros(gp, dtype)
            o[:B] = a
            return jnp.asarray(o)

        start_j = padg(start, np.int32)
        node, k, valid, _ = _expand_spans(
            start_j, padg(dd_c, np.int32), padg(clean, bool), out_cap)
        src = (start_j[node] + k) * Lp + node
        flat = jax.lax.bitcast_convert_type(val, jnp.int32).reshape(-1)
        outv = np.asarray(jnp.where(valid, flat[jnp.clip(src, 0,
                                                         flat.shape[0] - 1)],
                                    0))[:total + 1]
        # dirty queries: native per-node fallback (rare)
        res_lists: dict[int, np.ndarray] = {}
        dirty_q = q[~clean]
        if len(dirty_q):
            nat = self.dec.graph.successors_batch(
                dirty_q.astype(np.uint64))
            no = nat.offsets.astype(np.int64)
            for i, x in enumerate(dirty_q):
                res_lists[int(x)] = nat.succs[no[i]:no[i + 1]]
        # assemble in query order
        out_lists = []
        for i in range(B):
            if clean[i]:
                out_lists.append(
                    np.asarray(outv[offs[i]:offs[i + 1]], np.uint32))
            else:
                out_lists.append(res_lists[int(q[i])])
        lens = np.array([len(v) for v in out_lists], np.int64)
        qlens = lens[inv]
        out_off = np.zeros(len(query) + 1, np.uint64)
        out_off[1:] = np.cumsum(qlens)
        flat_out = np.concatenate(
            [out_lists[j] for j in inv]) if len(query) else \
            np.zeros(0, np.uint32)
        return Adjacency(out_off, flat_out.astype(np.uint32))

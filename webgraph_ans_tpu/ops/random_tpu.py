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
from .decode_jax import UNROLL, decode_blocks, round_cap, seed_rings
from .reconstruct_jax import _np_ragged, reconstruct


class TpuRandomAccess:
    def __init__(self, decoder: TpuGraphDecoder):
        if decoder.phase_step > 1:
            raise NotImplementedError(
                "TPU wave random access needs per-node phases; on "
                "phase-sampled artifacts use ANSBvGraph.successors_batch "
                "(native skip-decode) or TpuCsrServer (device CSR)")
        self.dec = decoder

    def _decode_nodes(self, nodes: np.ndarray, cap: int):
        """Decodes the token streams of the given nodes (one lane each).
        Returns (values, comps, counts) as numpy, rows in `nodes` order.
        Lane counts are padded to the next power of two (with repeats of
        node 0) so wave decoding reuses a handful of compiled shapes."""
        d = self.dec
        W = d.window
        true_len = len(nodes)
        L = 1 << max(true_len - 1, 1).bit_length()
        if L > true_len:
            nodes = np.concatenate(
                [nodes, np.zeros(L - true_len, dtype=nodes.dtype)])
        starts = jnp.asarray(nodes.astype(np.int32))
        ends = starts + 1
        host_states = np.asarray(d.states)
        host_ptrs = np.asarray(d.pointers)
        if W > 0:
            pre = nodes[:, None].astype(np.int64) - W + np.arange(W)[None, :]
            pre_cl = np.clip(pre, 0, d.num_nodes - 1)
            ring = seed_rings(d.params, d.tables,
                              jnp.asarray(host_states[pre_cl]),
                              jnp.asarray(host_ptrs[pre_cl]),
                              starts, W)
        else:
            ring = jnp.zeros((L, 1), jnp.int32)
        cap = round_cap(d.params, cap)
        while True:
            out, counts, ok = decode_blocks(
                d.params, d.tables,
                jnp.asarray(host_states[nodes]),
                jnp.asarray(host_ptrs[nodes]),
                starts, ends, ring, W, d.min_interval, cap)
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

    def successors_batch(self, query_nodes, cap: int = 512) -> Adjacency:
        query = np.asarray(query_nodes, dtype=np.int64)
        todo = np.unique(query)
        n = self.dec.num_nodes
        seen = np.zeros(n, dtype=bool)
        waves: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        guard = 0
        while todo.size:
            seen[todo] = True
            vals, comps, counts = self._decode_nodes(todo, cap)
            waves.append((todo, vals, comps, counts.astype(np.int64)))
            # token 0 = outdegree, token 1 = reference (if window > 0):
            # referenced parents not yet decoded form the next wave
            has_par = (counts >= 2) & (comps[:, 1] == 1) & (vals[:, 1] > 0)
            parents = todo[has_par] - vals[has_par, 1].astype(np.int64)
            todo = np.unique(parents)
            todo = todo[~seen[todo]]
            guard += 1
            if guard > 64 and todo.size:
                raise RuntimeError(
                    "reference chains too deep for random access waves")

        # flatten each wave's ragged rows (C-order keeps per-node token
        # order), then permute whole token segments into ascending-id order
        ids = np.concatenate([w[0] for w in waves])
        cnts = np.concatenate([w[3] for w in waves])
        flat_v = np.concatenate(
            [v[np.arange(v.shape[1])[None, :] < c[:, None]]
             for _, v, _, c in waves])
        flat_c = np.concatenate(
            [cm[np.arange(cm.shape[1])[None, :] < c[:, None]]
             for _, _, cm, c in waves])
        order = np.argsort(ids, kind="stable")
        offs = np.zeros(len(ids) + 1, np.int64)
        offs[1:] = np.cumsum(cnts)
        seg, intra = _np_ragged(cnts[order], int(offs[-1]))
        perm = offs[order[seg]] + intra
        ids = ids[order]
        offsets, succs = reconstruct(flat_v[perm], flat_c[perm], len(ids),
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

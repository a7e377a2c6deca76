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

import numpy as np
import jax.numpy as jnp

from ..bvgraph.graph import Adjacency
from .graph_decode import TpuGraphDecoder
from .decode_jax import UNROLL, decode_blocks, round_cap, seed_rings
from .reconstruct_jax import reconstruct


class TpuRandomAccess:
    def __init__(self, decoder: TpuGraphDecoder):
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
        done: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        guard = 0
        while len(todo):
            vals, comps, counts = self._decode_nodes(todo, cap)
            next_wave = []
            for i, x in enumerate(todo):
                v = vals[i, : counts[i]]
                c = comps[i, : counts[i]]
                done[int(x)] = (v, c)
                # token 0 = outdegree, token 1 = reference (if window > 0)
                if counts[i] >= 2 and c[1] == 1 and v[1] > 0:
                    parent = int(x) - int(v[1])
                    if parent not in done:
                        next_wave.append(parent)
            todo = np.unique(np.array(next_wave, dtype=np.int64)) if next_wave else np.zeros(0, np.int64)
            todo = np.array([t for t in todo if t not in done], dtype=np.int64)
            guard += 1
            if guard > 64 and len(todo):
                raise RuntimeError("reference chains too deep for random access waves")

        # subset reconstruction over the reference closure
        ids = np.array(sorted(done), dtype=np.int64)
        flat_v = np.concatenate([done[int(x)][0] for x in ids])
        flat_c = np.concatenate([done[int(x)][1] for x in ids])
        offsets, succs = reconstruct(flat_v, flat_c, len(ids),
                                     self.dec.min_interval, node_ids=ids)

        # emit query rows in query order (ragged gather)
        from .reconstruct_jax import _np_ragged

        loc = np.searchsorted(ids, query)
        row_lens = (offsets[loc + 1] - offsets[loc]).astype(np.int64)
        out_off = np.zeros(len(query) + 1, np.uint64)
        out_off[1:] = np.cumsum(row_lens)
        total = int(out_off[-1])
        seg, intra = _np_ragged(row_lens, total)
        out = succs[offsets[loc[seg]].astype(np.int64) + intra]
        return Adjacency(out_off, out.astype(np.uint32))

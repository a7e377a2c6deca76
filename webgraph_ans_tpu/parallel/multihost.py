"""Multi-host scale-out (jax.distributed): node-range shards per host,
decoder tables broadcast once, per-shard lane decoding on local chips,
results gathered in node order.

The reference is single-machine (SURVEY.md section 2.3); this implements the
BASELINE multi-host design: the phase table makes node ranges independent,
so host h owns nodes [h*n/H, (h+1)*n/H), loads the shared artifacts, and
decodes its range with the same lane-parallel kernel used on one chip. The
decode needs NO cross-host communication; only final statistics/gathers use
collectives (jax.experimental.multihost_utils).

Degenerates cleanly to a single process (tests run it that way); on a real
pod slice call init_distributed() first on every process.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bvgraph.random_access import ANSBvGraph
from ..ops.graph_decode import TpuGraphDecoder
from ..ops.decode_jax import (decode_blocks, fetch_block_tokens,
                              round_cap, seed_rings)
from ..ops.reconstruct_jax import reconstruct


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op for a single process)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


class MultihostGraphDecoder:
    """Decodes the local host's node-range shard of an ANSBvGraph.

    Every process loads the same basename (shared filesystem or a copy);
    node ranges split by process_index. decode_shard() returns the local
    CSR shard with its global node range — the production pattern keeps
    results sharded; total_arcs() shows the cross-host collective path."""

    def __init__(self, graph: ANSBvGraph, lanes_per_host: int = 4096):
        self.g = graph
        self.dec = TpuGraphDecoder(graph)
        self.h = jax.process_index()
        self.num_hosts = jax.process_count()
        n = graph.num_nodes
        self.node_lo = (self.h * n) // self.num_hosts
        self.node_hi = ((self.h + 1) * n) // self.num_hosts
        self.lanes = lanes_per_host

    def _decode_range_tokens(self, lo: int, hi: int):
        """Lane-parallel token decode of nodes [lo, hi). Lane boundaries go
        through TpuGraphDecoder._block_bounds so encode-block boundaries of
        block-parallel (prelude v2) files are honored — a decode lane must
        never cross an rANS state reset."""
        d = self.dec
        L = min(self.lanes, max(hi - lo, 1))
        span = hi - lo
        starts, ends = d._block_bounds(L, lo=lo, hi=hi)
        W = d.window
        hs, hp = np.asarray(d.states), np.asarray(d.pointers)
        safe = np.minimum(starts, d.num_nodes - 1)
        if W > 0:
            pre = np.clip(starts[:, None] - W + np.arange(W)[None, :],
                          0, d.num_nodes - 1)
            ring = seed_rings(d.params, d.tables,
                              jnp.asarray(hs[pre]), jnp.asarray(hp[pre]),
                              jnp.asarray(starts), W)
        else:
            ring = jnp.zeros((len(starts), 1), jnp.int32)
        est = max((2 * d.num_arcs + 3 * d.num_nodes)
                  // max(d.num_nodes, 1) * max(span // len(starts), 1), 8)
        cap = round_cap(d.params, int(est * 2 + 64))
        while True:
            out, counts, ok = decode_blocks(
                d.params, d.tables, jnp.asarray(hs[safe]),
                jnp.asarray(hp[safe]), jnp.asarray(starts),
                jnp.asarray(ends), ring, W, d.min_interval, cap)
            if bool(np.all(np.asarray(ok))):
                break
            cap *= 2
        return fetch_block_tokens(out, counts, cap)

    def _closure_before(self, lo: int):
        """Token streams of the reference closure preceding the shard:
        nodes in [lo-window, lo) may be copied from by the shard, and they
        may reference further back. Decoded as CONTIGUOUS node ranges —
        when a reference escapes the current range the range at least
        doubles, so deep hc chains close in O(log span) lane-parallel
        ranged decodes instead of one host round trip per chain level.
        Returns (base, vals, comps): flat token streams of [base, lo)."""
        d = self.dec
        base = max(lo - max(d.window, 1), 0)
        while True:
            vals, comps = self._decode_range_tokens(base, lo)
            vals_np = np.asarray(vals)
            comps_np = np.asarray(comps)
            # segment the flat stream: every node opens with an OUTDEGREE
            # (component 0) token; REFERENCE_OFFSET (component 1) tokens
            # with value > 0 copy from node_of - value
            node_of = base + np.cumsum(comps_np == 0) - 1
            m = (comps_np == 1) & (vals_np > 0)
            if not m.any():
                return base, vals_np, comps_np
            min_parent = int((node_of[m] - vals_np[m]).min())
            if min_parent >= base:
                return base, vals_np, comps_np
            base = max(min(min_parent, lo - 2 * (lo - base)), 0)

    def decode_shard(self):
        """Token-decodes and reconstructs the local node range. Returns
        (node_lo, node_hi, offsets u64, succs u32) for nodes
        [node_lo, node_hi)."""
        d = self.dec
        lo, hi = self.node_lo, self.node_hi
        vals, comps = self._decode_range_tokens(lo, hi)
        if lo == 0:
            offsets, succs = reconstruct(vals, comps, hi - lo, d.min_interval)
            return lo, hi, offsets, succs
        base, pre_vals, pre_comps = self._closure_before(lo)
        ids = np.arange(base, hi, dtype=np.int64)
        vals = np.concatenate([pre_vals.astype(vals.dtype), vals])
        comps = np.concatenate([pre_comps.astype(comps.dtype), comps])
        offsets, succs = reconstruct(vals, comps, len(ids), d.min_interval,
                                     node_ids=ids)
        first = lo - base
        off0 = int(offsets[first])
        return lo, hi, (offsets[first:] - off0).astype(np.uint64), succs[off0:]

    def total_arcs(self) -> int:
        """Cross-host reduction of per-shard arc counts (allgather when
        running distributed, local count otherwise)."""
        _, _, _, succs = self.decode_shard()
        if self.num_hosts == 1:
            return len(succs)
        from jax.experimental import multihost_utils

        all_counts = multihost_utils.process_allgather(
            jnp.asarray(np.array([len(succs)], np.int64)))
        return int(np.asarray(all_counts).sum())

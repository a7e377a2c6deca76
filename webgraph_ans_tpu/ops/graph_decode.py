"""Host orchestration of the TPU block decoder: partition a graph's nodes
into contiguous blocks (one per lane), enter the stream at each block's
phase, seed the outdegree rings, and run the lane-parallel grammar decoder.

This is the TPU-native replacement for the serial sequential scan
(reference: src/bvgraph/sequential.rs + src/ans/decoder.rs): same stream,
same phases, decoded by hundreds of lanes at once.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bvgraph.random_access import ANSBvGraph
from .decode_jax import (UNROLL, build_decoder_tables, decode_blocks,
                         fetch_block_tokens, seed_rings)


class TpuGraphDecoder:
    """Holds device-resident tables + stream + phases for a loaded graph."""

    def __init__(self, graph: ANSBvGraph):
        p = graph.prelude
        if p.num_nodes >= 1 << 31:
            raise ValueError("TPU decode path supports graphs with < 2^31 nodes")
        if len(p.stream) >= 1 << 31:
            # lane pointers are int32; the binding limit is stream words,
            # not nodes (see VERDICT r01 item 4)
            raise ValueError(
                "TPU decode path supports streams with < 2^31 u16 words")
        self.graph = graph
        self.window = p.compression_window
        self.min_interval = p.min_interval_length
        self.num_nodes = p.num_nodes
        self.num_arcs = p.num_arcs
        self.tables, self.params = build_decoder_tables(p.model, p.stream)
        # graph.states/pointers are already in node order.
        self.states = jnp.asarray(graph.states)
        self.pointers = jnp.asarray(graph.pointers.astype(np.int64).astype(np.int32))

    def _block_bounds(self, num_lanes: int, lo: int = 0, hi: int | None = None,
                      pad_to: int = 1):
        """Block boundaries over nodes [lo, hi) balanced by per-node STREAM
        spans (pointers are descending in node order), so lanes carry
        similar token loads instead of similar node counts.

        On block-parallel-encoded (prelude v2) files, every encode-block
        start inside the range is unioned into the boundary set — a decode
        lane must never cross an encode-block boundary (the rANS state
        resets there). The result is padded with empty lanes
        (start == end == hi, immediately P_DONE in decode_blocks) up to a
        multiple of `pad_to` so mesh-sharded callers keep divisible lane
        counts."""
        n = self.num_nodes
        hi = n if hi is None else hi
        span = hi - lo
        ptrs = np.asarray(self.pointers, dtype=np.int64)
        idx = np.arange(num_lanes, dtype=np.int64)
        if span <= num_lanes or ptrs[lo] == ptrs[hi - 1]:
            starts = lo + (idx * span) // num_lanes
            ends = lo + ((idx + 1) * span) // num_lanes
            starts, ends = self._union_encode_blocks(starts, ends, lo, hi)
        else:
            # ascending cumulative stream usage within the range
            consumed = ptrs[lo] - ptrs[lo:hi]
            targets = (idx * consumed[-1]) // num_lanes
            starts = lo + np.searchsorted(consumed, targets, side="left")
            starts[0] = lo
            starts = np.minimum(starts, hi - 1)
            starts = np.maximum.accumulate(starts)
            ends = None
            starts, ends = self._union_encode_blocks(starts, ends, lo, hi)
        if len(starts) % pad_to:
            pad = pad_to - len(starts) % pad_to
            starts = np.concatenate([starts, np.full(pad, hi, starts.dtype)])
            ends = np.concatenate([ends, np.full(pad, hi, ends.dtype)])
        return starts.astype(np.int32), ends.astype(np.int32)

    def _union_encode_blocks(self, starts, ends, lo: int, hi: int):
        """Unions prelude encode-block start nodes (clipped to (lo, hi))
        into the lane boundary set; recomputes contiguous ends."""
        blocks = self.graph.prelude.blocks
        if blocks is not None:
            bstarts = np.asarray(blocks[0], np.int64)
            bstarts = bstarts[(bstarts > lo) & (bstarts < hi)]
            if len(bstarts):
                starts = np.unique(np.concatenate([starts, bstarts]))
                ends = None
        if ends is None:
            starts = np.unique(starts)
            ends = np.empty_like(starts)
            ends[:-1] = starts[1:]
            ends[-1] = hi
        return starts, ends

    def decode_tokens(self, num_lanes: int = 256, cap: int | None = None):
        """Decodes every (component, value) token of the graph, lane-parallel
        over `num_lanes` contiguous node blocks. Returns (values u32,
        comps i8) concatenated in forward node order."""
        starts, ends = self._block_bounds(num_lanes)
        W = self.window
        host_states = np.asarray(self.states)
        host_ptrs = np.asarray(self.pointers)

        # Phases of the `window` nodes preceding each block (clamped to 0;
        # invalid entries are masked inside seed_rings).
        if W > 0:
            pre = starts[:, None] - W + np.arange(W)[None, :]
            pre_cl = np.clip(pre, 0, self.num_nodes - 1)
            seed_states = jnp.asarray(host_states[pre_cl])
            seed_ptrs = jnp.asarray(host_ptrs[pre_cl])
            ring = seed_rings(
                self.params, self.tables, seed_states,
                seed_ptrs, jnp.asarray(starts), W)
        else:
            ring = jnp.zeros((len(starts), 1), jnp.int32)

        lane_states = jnp.asarray(host_states[np.minimum(starts, self.num_nodes - 1)])
        lane_ptrs = jnp.asarray(host_ptrs[np.minimum(starts, self.num_nodes - 1)])

        if cap is None:
            # ~2.05 tokens per arc + 3 per node is a generous upper estimate
            # for BvGraph token streams; overflow doubles and retries.
            est = (2 * self.num_arcs + 3 * self.num_nodes) // max(len(starts), 1)
            cap = max(64, int(est * 1.3))
        cap = -(-cap // UNROLL) * UNROLL
        while True:
            out, counts, ok = decode_blocks(
                self.params, self.tables, lane_states,
                lane_ptrs, jnp.asarray(starts), jnp.asarray(ends), ring,
                W, self.min_interval, cap)
            if bool(np.all(np.asarray(ok))):
                break
            cap *= 2
        return fetch_block_tokens(out, counts, cap)

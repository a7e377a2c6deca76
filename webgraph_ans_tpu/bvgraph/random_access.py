"""ANSBvGraph: random-access reads from `.ans` + `.pointers` + `.states`
(reference: src/bvgraph/random_access.rs:52-82,
 src/bvgraph/factories/bvgraph_decoder_factory.rs:46-58)."""

from __future__ import annotations

import ctypes

import numpy as np

from ..ans.prelude import Prelude, load_pointers, load_states
from ..utils import native
from .graph import Adjacency


class ANSBvGraph:
    """Random-access reader. Phases (per-node state + stream pointer) are
    stored in reverse node order on disk, exactly like the reference; they
    are un-reversed into node order at load time."""

    def __init__(self, prelude: Prelude, states: np.ndarray, pointers: np.ndarray):
        self.prelude = prelude
        n = prelude.num_nodes
        k = prelude.phase_step
        expected = -(-n // k) if n else 0
        assert len(states) == expected and len(pointers) == expected, (
            f"phase arrays have {len(states)} entries, expected {expected} "
            f"(n={n}, phase_step={k})")
        # reverse: phases[j] on disk belongs to sampled node
        # (expected-1-j)*k; un-reversed entry i belongs to node i*k
        self.states = np.ascontiguousarray(states[::-1], dtype=np.uint32)
        self.pointers = np.ascontiguousarray(pointers[::-1], dtype=np.uint64)
        self._packed = prelude.model.packed()
        self._stream = np.ascontiguousarray(prelude.stream, dtype=np.uint16)

    @staticmethod
    def load(basename: str) -> "ANSBvGraph":
        return ANSBvGraph(
            Prelude.load(basename), load_states(basename), load_pointers(basename)
        )

    @property
    def num_nodes(self) -> int:
        return self.prelude.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.prelude.num_arcs

    def successors_batch(self, nodes) -> Adjacency:
        """Decodes the successor lists of the queried nodes (resolving
        reference chains recursively through the phase table)."""
        p = self.prelude
        lib = native.get_lib()
        freqs, lens, log_m, radix, fidelity = self._packed
        node_ids = np.ascontiguousarray(nodes, dtype=np.uint64)
        h = native.check_ptr(
            lib.wgt_ans_decode_random(
                native.as_ptr(self._stream, ctypes.c_uint16),
                len(self._stream),
                native.as_ptr(self.states, ctypes.c_uint32),
                native.as_ptr(self.pointers, ctypes.c_uint64),
                p.num_nodes,
                p.compression_window,
                p.min_interval_length,
                native.as_ptr(freqs, ctypes.c_uint16),
                native.as_ptr(lens, ctypes.c_uint64),
                native.as_ptr(log_m, ctypes.c_uint32),
                native.as_ptr(radix, ctypes.c_uint32),
                native.as_ptr(fidelity, ctypes.c_uint32),
                native.as_ptr(node_ids, ctypes.c_uint64),
                len(node_ids),
                p.phase_step,
            )
        )
        offsets, succs = native.fetch_adjacency(lib, h)
        return Adjacency(offsets, succs)

    def successors(self, node: int) -> np.ndarray:
        return self.successors_batch([node]).successors(0)

    def bench_random(self, num_queries: int, seed: int = 0) -> int:
        """Native random-access benchmark: enumerates the successors of
        `num_queries` random nodes entirely in the host runtime; returns the
        number of arcs touched (reference: examples/bench_random_access.rs)."""
        p = self.prelude
        lib = native.get_lib()
        freqs, lens, log_m, radix, fidelity = self._packed
        arcs = lib.wgt_ans_bench_random(
            native.as_ptr(self._stream, ctypes.c_uint16),
            native.as_ptr(self.states, ctypes.c_uint32),
            native.as_ptr(self.pointers, ctypes.c_uint64),
            p.num_nodes,
            p.compression_window,
            p.min_interval_length,
            native.as_ptr(freqs, ctypes.c_uint16),
            native.as_ptr(lens, ctypes.c_uint64),
            native.as_ptr(log_m, ctypes.c_uint32),
            native.as_ptr(radix, ctypes.c_uint32),
            native.as_ptr(fidelity, ctypes.c_uint32),
            num_queries,
            seed,
            p.phase_step,
        )
        if arcs < 0:
            raise RuntimeError(f"bench failed: {native.last_error()}")
        return int(arcs)

"""ANSBvGraphSeq: sequential-only access from `basename.ans`
(reference: src/bvgraph/sequential.rs:29-51)."""

from __future__ import annotations

import ctypes

import numpy as np

from ..ans.prelude import Prelude
from ..utils import native
from .graph import Adjacency


class ANSBvGraphSeq:
    """Sequential reader: decodes the whole graph from the final encoder
    state, walking the stream backwards (the encoder ran in reverse, so
    decode yields nodes 0..n-1 in order)."""

    def __init__(self, prelude: Prelude):
        self.prelude = prelude

    @staticmethod
    def load(basename: str) -> "ANSBvGraphSeq":
        return ANSBvGraphSeq(Prelude.load(basename))

    @property
    def num_nodes(self) -> int:
        return self.prelude.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.prelude.num_arcs

    def decode_all(self) -> Adjacency:
        """Full sequential scan on the host runtime (CPU baseline; the TPU
        path lives in webgraph_ans_tpu.ops)."""
        p = self.prelude
        lib = native.get_lib()
        freqs, lens, log_m, radix, fidelity = p.model.packed()
        stream = np.ascontiguousarray(p.stream, dtype=np.uint16)
        h = native.check_ptr(
            lib.wgt_ans_decode_seq(
                native.as_ptr(stream, ctypes.c_uint16),
                len(stream),
                p.state,
                p.num_nodes,
                p.compression_window,
                p.min_interval_length,
                native.as_ptr(freqs, ctypes.c_uint16),
                native.as_ptr(lens, ctypes.c_uint64),
                native.as_ptr(log_m, ctypes.c_uint32),
                native.as_ptr(radix, ctypes.c_uint32),
                native.as_ptr(fidelity, ctypes.c_uint32),
            )
        )
        offsets, succs = native.fetch_adjacency(lib, h)
        return Adjacency(offsets, succs)

    def __iter__(self):
        adj = self.decode_all()
        for i in range(adj.num_nodes):
            yield i, adj.successors(i)

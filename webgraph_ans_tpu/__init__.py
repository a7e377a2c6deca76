"""webgraph-ans-tpu: TPU-native ANS recompression for WebGraph BvGraph
files (see docs/ARCHITECTURE.md and SURVEY.md).

Public surface (mirroring the reference's two read APIs + store,
reference: src/bvgraph/random_access.rs, src/bvgraph/sequential.rs):

    from webgraph_ans_tpu import ANSBvGraph, ANSBvGraphSeq, store
    store("cnr-2000", "out")                  # 3-pass compression
    g = ANSBvGraph.load("out")                # random access
    seq = ANSBvGraphSeq.load("out")           # sequential (.ans only)

TPU decode paths live in webgraph_ans_tpu.ops; multi-chip/multi-host
scale-out in webgraph_ans_tpu.parallel.
"""

from .bvgraph.random_access import ANSBvGraph
from .bvgraph.sequential import ANSBvGraphSeq
from .bvgraph.store import compress_adjacency, store

__all__ = ["ANSBvGraph", "ANSBvGraphSeq", "compress_adjacency", "store"]
__version__ = "0.1.0"

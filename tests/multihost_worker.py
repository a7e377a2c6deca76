"""Worker process for the real multi-process multihost test
(tests/test_multihost_procs.py). Not collected by pytest.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <outfile>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nproc, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "std"
    jax.distributed.initialize(coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    import numpy as np
    from webgraph_ans_tpu.bvgraph.graph import Adjacency
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.store import compress_adjacency
    from webgraph_ans_tpu.parallel.multihost import MultihostGraphDecoder

    # identical deterministic graph + artifacts on every process (the
    # production pattern is a shared filesystem; recompressing from the
    # same seed is equivalent and keeps the test hermetic)
    rng = np.random.default_rng(424)
    lists = []
    for i in range(400):
        dd = int(rng.integers(0, 12))
        lists.append(sorted(rng.choice(400, size=dd, replace=False).tolist()))
    adj = Adjacency.from_lists(lists)
    if mode == "hc":
        # high-compression params: window 16, unbounded max_ref ->
        # reference chains cross the shard boundaries and the workers
        # must resolve the cross-shard closure (safe breaks bound it)
        res = compress_adjacency(adj, 16, 2_000_000_000, 4,
                                 safe_break_interval=64)
    else:
        res = compress_adjacency(adj, 7, 3, 2)
    g = ANSBvGraph(res.prelude, res.states, res.pointers)

    mh = MultihostGraphDecoder(g, lanes_per_host=8)
    lo, hi, offsets, succs = mh.decode_shard()
    got = Adjacency(offsets, succs).to_lists()
    assert got == lists[lo:hi], f"proc {pid}: shard mismatch"

    total = mh.total_arcs()  # cross-process allgather
    assert total == adj.num_arcs, (total, adj.num_arcs)

    with open(outfile, "w") as f:
        f.write(f"ok {pid} {lo} {hi} {total}\n")


if __name__ == "__main__":
    main()

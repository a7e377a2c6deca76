"""Multi-host launch driver: one command per host of a pod slice.

    python -m webgraph_ans_tpu.launch BASENAME \
        --coordinator HOST0:PORT --num-processes H --process-id h \
        [--lanes-per-host 4096] [--reps 3] [--gather OUT.npz]

Every process loads the same artifacts (shared filesystem or a copy),
initializes jax.distributed, decodes its node-range shard with the
lane-parallel kernel on its local chips, and reports per-host decode
throughput. With --gather, the shards are moved over the collective
fabric (ordered allgather, rank order = node order) and process 0
writes the full (offsets, succs) CSR to OUT.npz — the DCN-ordered
gather of the multi-host design (SURVEY.md section 5; the reference is
single-machine, SURVEY.md section 2.3).

Dry run without a pod (spawns N local CPU processes of this module,
coordinator on localhost):

    python -m webgraph_ans_tpu.launch BASENAME --local-dryrun 4
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def _run(args) -> None:
    # distributed init MUST precede any package import: importing the
    # package touches jax.numpy, which initializes the backends, and a
    # late jax.distributed.initialize then silently leaves
    # process_count() == 1 (every host would decode the whole graph)
    if args.num_processes > 1:
        import os

        import jax
        if os.environ.get("JAX_PLATFORMS"):
            # the env var alone is not honored by the distributed CPU
            # client on this jax build (process_count stays 1); setting
            # the config explicitly before initialize is (the pattern
            # tests/multihost_worker.py uses)
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
        assert jax.process_count() == args.num_processes, \
            "jax.distributed did not take effect (backends initialized early?)"
    import jax
    import numpy as np
    from .bvgraph.random_access import ANSBvGraph
    from .parallel.multihost import MultihostGraphDecoder

    g = ANSBvGraph.load(args.basename)
    mh = MultihostGraphDecoder(g, lanes_per_host=args.lanes_per_host)
    lo, hi, offsets, succs = mh.decode_shard()   # warm (plans + compile)
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        lo, hi, offsets, succs = mh.decode_shard()
        ts.append(time.time() - t0)
    sec = float(np.median(ts))
    arcs = int(len(succs))
    report = {
        "process": jax.process_index(),
        "num_processes": jax.process_count(),
        "nodes": [int(lo), int(hi)],
        "arcs": arcs,
        "sec_per_rep": sec,
        "ns_per_arc": sec / max(arcs, 1) * 1e9,
    }
    print(json.dumps(report), flush=True)

    if args.gather:
        from jax.experimental import multihost_utils
        import jax.numpy as jnp

        # ordered gather over the collective fabric: pad each shard to
        # the allgathered max, one allgather, rank order = node order
        counts = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(np.array([arcs, hi - lo], np.int64))))
        counts = counts.reshape(jax.process_count(), 2)
        amax, nmax = int(counts[:, 0].max()), int(counts[:, 1].max())
        pad_s = np.zeros(amax, np.uint32)
        pad_s[:arcs] = succs
        pad_o = np.zeros(nmax + 1, np.int64)
        pad_o[:hi - lo + 1] = np.asarray(offsets, np.int64)
        all_s = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(pad_s.view(np.int32)))).view(np.uint32)
        all_o = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(pad_o)))
        all_s = all_s.reshape(jax.process_count(), amax)
        all_o = all_o.reshape(jax.process_count(), nmax + 1)
        if jax.process_index() == 0:
            parts, offs, base = [], [np.zeros(1, np.int64)], 0
            for h in range(jax.process_count()):
                a, nn = int(counts[h, 0]), int(counts[h, 1])
                parts.append(all_s[h, :a])
                offs.append(all_o[h, 1:nn + 1] + base)
                base += a
            np.savez(args.gather,
                     offsets=np.concatenate(offs).astype(np.uint64),
                     succs=np.concatenate(parts))
            print(json.dumps({"gathered": args.gather,
                              "total_arcs": int(base)}), flush=True)


def _local_dryrun(args) -> int:
    import os
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    n = args.local_dryrun
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(n):
        cmd = [sys.executable, "-m", "webgraph_ans_tpu.launch",
               args.basename, "--coordinator", coord,
               "--num-processes", str(n), "--process-id", str(pid),
               "--lanes-per-host", str(args.lanes_per_host),
               "--reps", str(args.reps)]
        if args.gather:
            # the gather is a collective: every process passes the flag,
            # only process 0 writes the file
            cmd += ["--gather", args.gather]
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m webgraph_ans_tpu.launch", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("basename")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--lanes-per-host", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--gather", default=None,
                    help="npz path: ordered-gather the CSR to process 0")
    ap.add_argument("--local-dryrun", type=int, default=0, metavar="N",
                    help="spawn N local CPU processes of this module")
    args = ap.parse_args(argv)
    if args.local_dryrun:
        return _local_dryrun(args)
    _run(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())

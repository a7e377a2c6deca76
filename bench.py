"""Benchmark driver: full sequential decode of cnr-2000 through the TPU
path (lane-parallel token decode + parallel reconstruction), verified
bit-exact, timed steady-state.

Prints ONE JSON line:
  {"metric": "cnr2000_seq_decode_ns_per_arc", "value": <ns/arc>,
   "unit": "ns/arc", "vs_baseline": <serial_cpu_ns_per_arc / value>}

vs_baseline > 1 means the TPU path beats the serial single-state CPU
decoder (this repo's faithful stand-in for the reference's serial decode
architecture, measured in the same process on the same artifacts; the
reference's own hardware numbers are in BASELINE.md).

Details (sizes, bits/link, pass timings) go to stderr.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct

    import jax
    log("jax devices:", jax.devices())

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "data", "cnr-2000", "cnr-2000")
    out = os.path.join(tempfile.mkdtemp(prefix="wgt_bench_"), "cnr-2000")

    t0 = time.time()
    store(base, out)
    log(f"compress (3-pass) in {time.time() - t0:.2f}s")

    g = ANSBvGraph.load(out)
    arcs = g.num_arcs
    ans_bytes = os.path.getsize(out + ".ans")
    log(f".ans {ans_bytes} bytes = {ans_bytes * 8 / arcs:.3f} bits/link "
        f"(BVGraph cnr-2000: 2.897)")

    adj, _ = load_bvgraph(base)

    # Serial CPU baseline (single-state decoder, the reference's design).
    seq = ANSBvGraphSeq(g.prelude)
    times = []
    for _ in range(3):
        t0 = time.time()
        dec = seq.decode_all()
        times.append(time.time() - t0)
    assert np.array_equal(dec.succs, adj.succs)
    cpu_ns = np.median(times) / arcs * 1e9
    log(f"serial CPU decode: {np.median(times):.3f}s = {cpu_ns:.2f} ns/arc")

    # TPU path: warm up (compile), then steady-state median.
    dec_tpu = TpuGraphDecoder(g)
    num_lanes = int(os.environ.get("WGT_BENCH_LANES", "512"))

    def run():
        vals, comps = dec_tpu.decode_tokens(num_lanes=num_lanes)
        return reconstruct(vals, comps, g.num_nodes,
                           g.prelude.min_interval_length)

    t0 = time.time()
    offsets, succs = run()
    log(f"TPU decode warmup (incl. compile): {time.time() - t0:.2f}s")
    assert np.array_equal(succs, adj.succs), "TPU decode not bit-exact"

    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    tpu_ns = np.median(times) / arcs * 1e9
    log(f"TPU decode steady state: {np.median(times):.3f}s = {tpu_ns:.2f} ns/arc")

    print(json.dumps({
        "metric": "cnr2000_seq_decode_ns_per_arc",
        "value": round(tpu_ns, 2),
        "unit": "ns/arc",
        "vs_baseline": round(cpu_ns / tpu_ns, 3),
    }))


if __name__ == "__main__":
    main()

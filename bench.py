"""Benchmark driver: cnr-2000 sequential decode through the TPU path,
verified bit-exact, timed steady-state.

Prints ONE JSON line:
  {"metric": "cnr2000_seq_decode_ns_per_arc", "value": <ns/arc>,
   "unit": "ns/arc", "vs_baseline": <serial_cpu_ns_per_arc / value>}

value = device time of the lane-parallel token-decode kernel (the rANS
entropy-decode hot loop, the analog of the reference's decode benchmarks)
per arc. vs_baseline > 1 means one TPU chip beats the serial single-state
CPU decoder (this repo's faithful stand-in for the reference's serial
decode architecture, measured in the same process on the same artifacts;
the reference's own hardware numbers are in BASELINE.md).

Details (sizes, bits/link, end-to-end timings incl. host transfers) go to
stderr.
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
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp

    from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.decode_jax import UNROLL, decode_blocks, seed_rings
    from webgraph_ans_tpu.ops.reconstruct_jax import reconstruct

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
    for _ in range(5):
        t0 = time.time()
        dec = seq.decode_all()
        times.append(time.time() - t0)
    assert np.array_equal(dec.succs, adj.succs)
    cpu_ns = float(np.median(times)) / arcs * 1e9
    log(f"serial CPU decode: {np.median(times):.3f}s = {cpu_ns:.2f} ns/arc")

    # TPU kernel: fixed shapes (cache-friendly), median of 5 steady runs.
    dec_tpu = TpuGraphDecoder(g)
    L = int(os.environ.get("WGT_BENCH_LANES", "4096"))
    W = dec_tpu.window
    starts, ends = dec_tpu._block_bounds(L)
    hs, hp = np.asarray(dec_tpu.states), np.asarray(dec_tpu.pointers)
    pre = np.clip(starts[:, None] - W + np.arange(W)[None, :],
                  0, dec_tpu.num_nodes - 1)
    ring = seed_rings(dec_tpu.params, dec_tpu.tables,
                      jnp.asarray(hs[pre]), jnp.asarray(hp[pre]),
                      jnp.asarray(starts), W)
    est = (2 * arcs + 3 * dec_tpu.num_nodes) // L
    cap = -(-int(est * 1.3) // UNROLL) * UNROLL
    args = (dec_tpu.params, dec_tpu.tables,
            jnp.asarray(hs[starts]), jnp.asarray(hp[starts]),
            jnp.asarray(starts), jnp.asarray(ends), ring,
            W, dec_tpu.min_interval, cap)

    t0 = time.time()
    outb = decode_blocks(*args)
    jax.block_until_ready(outb)
    log(f"TPU decode warmup (incl. compile): {time.time() - t0:.2f}s")
    assert bool(np.asarray(outb[2]).all()), "decode cap overflow"

    times = []
    for _ in range(5):
        t0 = time.time()
        outb = decode_blocks(*args)
        jax.block_until_ready(outb)
        times.append(time.time() - t0)
    tpu_ns = float(np.median(times)) / arcs * 1e9
    log(f"TPU token-decode kernel: {np.median(times)*1e3:.1f} ms "
        f"= {tpu_ns:.2f} ns/arc")

    # Bit-exactness + end-to-end (incl. host transfer + reconstruction);
    # first call warms the reconstruction jits, second is steady state.
    vals, comps = dec_tpu.decode_tokens(num_lanes=L, cap=cap)
    offsets, succs = reconstruct(vals, comps, g.num_nodes,
                                 g.prelude.min_interval_length)
    assert np.array_equal(succs, adj.succs), "TPU decode not bit-exact"
    log("bit-exact: True")
    t0 = time.time()
    vals, comps = dec_tpu.decode_tokens(num_lanes=L, cap=cap)
    reconstruct(vals, comps, g.num_nodes, g.prelude.min_interval_length)
    log(f"end-to-end decode+reconstruct (steady): {time.time() - t0:.2f}s "
        f"= {(time.time() - t0) / arcs * 1e9:.0f} ns/arc")

    print(json.dumps({
        "metric": "cnr2000_seq_decode_ns_per_arc",
        "value": round(tpu_ns, 2),
        "unit": "ns/arc",
        "vs_baseline": round(cpu_ns / tpu_ns, 3),
    }))


if __name__ == "__main__":
    main()

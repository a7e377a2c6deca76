"""Compares the Pallas decode kernel against the XLA while-loop kernel
on cnr-2000: token-identical check + timing.

Usage: python tools/probe_pallas_decode.py [lanes] [reps]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))

    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "cnr-2000", "cnr-2000")
    out = os.path.join(tempfile.mkdtemp(prefix="wgt_pl_"), "c")
    store(base, out, encode_blocks=lanes)
    g = ANSBvGraph.load(out)
    dec = TpuGraphDecoder(g)
    arcs = g.num_arcs

    os.environ["WGT_PALLAS"] = "0"
    t0 = time.time()
    vx, cx = dec.decode_tokens(lanes)
    print(f"xla decode_tokens warm {time.time()-t0:.1f}s", flush=True)
    cap = dec.tighten_cap(lanes)
    print(f"tight cap {cap}", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o, c, _ = dec.decode_raw(lanes)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    tx = float(np.median(ts))
    print(f"xla kernel: {tx*1e3:.1f} ms = {tx/arcs*1e9:.2f} ns/arc",
          flush=True)

    os.environ["WGT_PALLAS"] = "1"
    t0 = time.time()
    vp, cp = dec.decode_tokens(lanes)
    print(f"pallas decode_tokens warm {time.time()-t0:.1f}s", flush=True)
    same = (np.array_equal(vx, vp) and np.array_equal(cx, cp))
    print(f"token-identical: {same}", flush=True)
    if not same:
        n = min(len(vx), len(vp))
        bad = np.nonzero(vx[:n] != vp[:n])[0]
        print(f"  len {len(vx)} vs {len(vp)}; first diffs {bad[:10]}")
        if len(bad):
            i = bad[0]
            print(f"  vx[{i}]={vx[i]} vp[{i}]={vp[i]} "
                  f"cx={cx[i]} cp={cp[i]}")
        badc = np.nonzero(cx[:n] != cp[:n])[0]
        print(f"  comp diffs {badc[:10]}")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o, c, _ = dec.decode_raw(lanes)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    tp = float(np.median(ts))
    print(f"pallas kernel: {tp*1e3:.1f} ms = {tp/arcs*1e9:.2f} ns/arc "
          f"({tx/tp:.1f}x XLA)", flush=True)


if __name__ == "__main__":
    main()

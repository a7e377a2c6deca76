"""Decode-kernel cost attribution probe (run on the real TPU).

Times decode_blocks on cnr-2000 across lane counts and ablation knobs
(set WGT_DECODE_PROBE=nolut / norefetch in decode_jax to ablate the LUT
row gather / the stream-window refetch). Usage:

    python tools/probe_decode.py [lanes ...]
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.decode_jax import (decode_blocks, round_cap,
                                                 seed_rings)

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data", "cnr-2000", "cnr-2000")
    eb = int(os.environ.get("WGT_PROBE_BLOCKS", "0"))
    out = f"/tmp/wgt_probe/cnr-2000-b{eb}"
    if not os.path.exists(out + ".ans"):
        os.makedirs("/tmp/wgt_probe", exist_ok=True)
        store(base, out, encode_blocks=max(eb, 1))
    g = ANSBvGraph.load(out)
    arcs = g.num_arcs
    dec = TpuGraphDecoder(g)
    W = dec.window
    probe = os.environ.get("WGT_DECODE_PROBE", "")
    lanes = [int(a) for a in sys.argv[1:]] or [4096]

    for L in lanes:
        starts, ends = dec._block_bounds(L)
        hs, hp = np.asarray(dec.states), np.asarray(dec.pointers)
        pre = np.clip(starts[:, None] - W + np.arange(W)[None, :],
                      0, dec.num_nodes - 1)
        ring = seed_rings(dec.params, dec.tables,
                          jnp.asarray(hs[pre]), jnp.asarray(hp[pre]),
                          jnp.asarray(starts), W)
        est = (2 * arcs + 3 * dec.num_nodes) // len(starts)
        cap = round_cap(dec.params, int(est * 1.3))
        args = (dec.params, dec.tables,
                jnp.asarray(hs[starts]), jnp.asarray(hp[starts]),
                jnp.asarray(starts), jnp.asarray(ends), ring,
                W, dec.min_interval, cap)
        t0 = time.time()
        o = decode_blocks(*args)
        jax.block_until_ready(o)
        warm = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            o = decode_blocks(*args)
            jax.block_until_ready(o)
            times.append(time.time() - t0)
        med = float(np.median(times))
        steps = int(np.asarray(o[1]).max())
        print(f"probe={probe or 'full'} L={L} lanes={len(starts)} cap={cap} "
              f"steps~{steps} warm={warm:.1f}s med={med*1e3:.1f}ms "
              f"ns/arc={med/arcs*1e9:.2f} us/step={med/max(steps,1)*1e6:.1f}",
              flush=True)


if __name__ == "__main__":
    main()

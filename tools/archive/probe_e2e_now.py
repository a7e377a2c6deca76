"""Current production e2e timing: decode_raw, parse_stats, assemble,
and the fused steady-state path, on a compressed artifact."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, reps=5):
    import jax
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops import reconstruct_device as R

    np.asarray(jnp.zeros(1))

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgt_r3/cnr-2000-blk"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = int(os.environ.get("WGT_BENCH_LANES", "2048"))
    cap = dec.tighten_cap(L, emit_aux=True)
    n, E = dec.num_nodes, int(dec.num_arcs)
    arcs = E
    mi = dec.min_interval

    # warm the meta cache + shapes
    offs, F, _ = dec.decode_to_csr_device(num_lanes=L)
    jax.block_until_ready(F)
    meta = dec.plan(L)["recon_meta"]["meta"]
    total_cop, max_depth = int(meta[2]), int(meta[3])
    hist_key = (tuple(int(c) for c in meta[4:4 + max_depth + 1][1:])
                if total_cop and max_depth > 0 else ())
    print(f"cap={cap} hist={hist_key}", flush=True)

    t = bench(lambda: dec.decode_raw(L, cap, check=False,
                                     emit_aux=True)[1][:1])
    print(f"decode_raw aux      : {t:7.1f}ms", flush=True)

    out, _, _ = dec.decode_raw(L, cap, check=False, emit_aux=True)
    jax.block_until_ready(out)

    t = bench(lambda: R.parse_stats(out, n, cap,
                                    depth_iters=max(max_depth, 1))["meta"])
    print(f"parse_stats         : {t:7.1f}ms", flush=True)

    def full():
        offsets, F, meta_d = R.parse_and_assemble(
            out, n, cap, mi, R._quant(E + 1), R._quant(total_cop),
            hist_key, depth_iters=max(max_depth, 1))
        return offsets[-1:], F[-8:]

    t = bench(full)
    print(f"parse_and_assemble  : {t:7.1f}ms", flush=True)

    def e2e():
        o, _, _ = dec.decode_raw(L, cap, check=False, emit_aux=True)
        offsets, F, meta_d = R.parse_and_assemble(
            o, n, cap, mi, R._quant(E + 1), R._quant(total_cop),
            hist_key, depth_iters=max(max_depth, 1))
        return offsets[-1:], F[-8:]

    t = bench(e2e)
    print(f"e2e (steady)        : {t:7.1f}ms = "
          f"{t * 1e6 / arcs:.1f} ns/arc", flush=True)

    # throughput: queue Q reps, block once
    Q = 5
    def e2e_q():
        outs = [e2e() for _ in range(Q)]
        return outs[-1]
    t = bench(e2e_q, reps=3)
    print(f"e2e throughput x{Q}   : {t / Q:7.1f}ms/rep = "
          f"{t * 1e6 / arcs / Q:.1f} ns/arc", flush=True)


if __name__ == "__main__":
    main()

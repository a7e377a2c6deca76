"""Find the gap between staged reconstruction cost (~300ms) and the
bench's decode_to_csr_device (~3100ms): time each composition variant."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, reps=3):
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
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops import reconstruct_device as R

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgt_bench_2aht0sgt/cnr-2000-blk"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = 2048
    cap = dec.tighten_cap(L)
    n, E = dec.num_nodes, int(dec.num_arcs)
    mi = dec.min_interval

    print(f"cap={cap}", flush=True)
    t = bench(lambda: dec.decode_raw(L, cap, check=False)[1][:1])
    print(f"decode_raw check=False : {t:7.1f}ms", flush=True)
    t = bench(lambda: dec.decode_raw(L, cap, check=True)[1][:1])
    print(f"decode_raw check=True  : {t:7.1f}ms", flush=True)

    out, counts, _ = dec.decode_raw(L, cap)
    st = R.parse_stats(out, n, cap, mi)
    meta = np.asarray(st["meta"])
    total_iv, total_cop, max_depth = int(meta[1]), int(meta[2]), int(meta[3])
    hist_key = tuple(int(c) for c in meta[5:4 + max_depth + 1])
    Epad, Ecap, Ccap = R._quant(E + 1), R._quant(total_iv), R._quant(total_cop)
    print(f"meta: iv={total_iv} cop={total_cop} depth={max_depth} "
          f"hist={hist_key}", flush=True)

    t = bench(lambda: R.parse_and_assemble(
        out, n, cap, mi, Epad, Ecap, Ccap, hist_key)[0][:1])
    print(f"parse_and_assemble     : {t:7.1f}ms", flush=True)

    meta_cache = dec.plan(L).setdefault("recon_meta", {})
    t = bench(lambda: R.reconstruct_device(out, n, E, cap, mi, meta_cache)[0][:1])
    print(f"reconstruct_device     : {t:7.1f}ms", flush=True)

    t = bench(lambda: dec.decode_to_csr_device(L, cap)[0][:1])
    print(f"decode_to_csr_device   : {t:7.1f}ms", flush=True)


if __name__ == "__main__":
    main()

"""Stage-level cost attribution for reconstruct_device (run on real TPU).

Usage: python tools/probe_reconstruct.py [lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a, **k):
    import jax
    o = fn(*a, **k)
    jax.block_until_ready(o)
    times = []
    for _ in range(3):
        t0 = time.time()
        o = fn(*a, **k)
        jax.block_until_ready(o)
        times.append(time.time() - t0)
    return o, float(np.median(times))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops import reconstruct_device as rd

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data", "cnr-2000", "cnr-2000")
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out = f"/tmp/wgt_probe/cnr-2000-b{L}"
    if not os.path.exists(out + ".ans"):
        os.makedirs("/tmp/wgt_probe", exist_ok=True)
        store(base, out, encode_blocks=L)
    g = ANSBvGraph.load(out)
    arcs = g.num_arcs
    dec = TpuGraphDecoder(g)

    _, tdec = t(lambda: dec.decode_raw(L)[0])
    out_d, counts, cap = dec.decode_raw(L)
    print(f"L={L} cap={cap} P={out_d.shape[1]*cap} decode_raw {tdec*1e3:.1f}ms "
          f"({tdec/arcs*1e9:.1f} ns/arc)", flush=True)

    n = dec.num_nodes
    E = int(dec.num_arcs)
    st, tstat = t(rd.parse_stats, out_d, n, cap, dec.min_interval)
    print(f"parse_stats {tstat*1e3:.1f}ms", flush=True)
    meta = np.asarray(st["meta"])
    total_iv, total_cop, max_depth = int(meta[1]), int(meta[2]), int(meta[3])
    print(f"ok={bool(meta[0])} total_iv={total_iv} total_cop={total_cop} "
          f"max_depth={max_depth}", flush=True)
    Epad, Ecap, Ccap = rd._quant(E + 1), rd._quant(total_iv), rd._quant(total_cop)

    (buf, adj_val, Btok), tpl = t(
        rd.place, st["v"], st["nib"], st["sp"], st["offsets"], st["ncop"],
        st["niv_tot"], st["tail_len"], Epad, Ecap, Ccap, dec.min_interval)
    print(f"place {tpl*1e3:.1f}ms", flush=True)
    succs = buf[:Epad]
    if total_iv:
        succs, tiv = t(rd.expand_intervals, succs, buf[Epad:Epad + Ecap],
                       adj_val, st["offsets"], st["ncop"], st["niv_tot"],
                       jnp.int32(total_iv), Epad, Ecap)
        print(f"expand_intervals({Ecap}) {tiv*1e3:.1f}ms", flush=True)
    seg, _ = t(rd.build_seg, st["offsets"], succs)
    F, tsort = t(rd.sort_segments, seg, succs)
    print(f"sort_segments({Epad}) {tsort*1e3:.1f}ms", flush=True)
    if total_cop and max_depth > 0:
        plan, tbp = t(rd.build_plan, buf[Epad + Ecap:], Btok, st["offsets"],
                      st["ncop"], st["tail_len"], st["blocks_sum"],
                      st["parent"], st["depth"], jnp.int32(total_cop),
                      Ccap, Epad)
        print(f"build_plan({Ccap}) {tbp*1e3:.1f}ms", flush=True)
        hist = meta[4:]
        print("depth hist:", hist[:max_depth + 2], flush=True)
        dkey, slot_s, src_s = plan
        M = rd._quant(int(hist[1]))
        _, tfill = t(rd.fill_slice, succs, F, slot_s[:M], src_s[:M],
                     jnp.int32(int(hist[1])))
        print(f"fill_slice depth1 ({M}) {tfill*1e3:.1f}ms", flush=True)

    _, tall = t(lambda: dec.decode_to_csr_device(num_lanes=L, cap=cap)[1])
    print(f"decode_to_csr_device {tall*1e3:.1f}ms = {tall/arcs*1e9:.1f} ns/arc",
          flush=True)


if __name__ == "__main__":
    main()

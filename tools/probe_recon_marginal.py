"""Marginal in-program cost of each reconstruction stage: build ONE jit per
prefix of the pipeline and difference the timings. Dispatch overhead
(~30ms/launch through the relay) cancels in the differences, which the
per-stage probes cannot do."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *a, reps=5):
    import jax
    o = fn(*a)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o = fn(*a)
        jax.block_until_ready(o)
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

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_cnr"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = int(os.environ.get("WGT_BENCH_LANES", "2048"))
    cap = dec.tighten_cap(L)
    n, E = dec.num_nodes, int(dec.num_arcs)
    out, counts, _ = dec.decode_raw(L, cap)
    jax.block_until_ready(out)

    st = R.parse_stats(out, n, cap, dec.min_interval)
    meta = np.asarray(st["meta"])
    total_iv, total_cop, max_depth = int(meta[1]), int(meta[2]), int(meta[3])
    hist_key = tuple(int(c) for c in meta[5:4 + max_depth + 1])
    Epad, Ecap, Ccap = R._quant(E + 1), R._quant(total_iv), R._quant(total_cop)
    mi = dec.min_interval
    print(f"P={cap*L} n={n} E={E} Epad={Epad} Ecap={Ecap} Ccap={Ccap} "
          f"hist={hist_key}", flush=True)

    def stage(upto):
        @functools.partial(jax.jit, static_argnames=())
        def f(out):
            s = R.parse_stats(out, n, cap, mi)
            if upto == "parse":
                return s["meta"]
            buf = R.place(
                s["v"], s["nib"], s["sp"], s["offsets"], s["ncop"],
                s["niv_tot"], s["tail_len"], s["depth"], Epad, Ecap, Ccap, mi)
            if upto == "place":
                return buf[::1024], s["meta"]
            succs = buf[:Epad]
            succs = R.expand_intervals(
                succs, buf[Epad:Epad + Ecap], s["offsets"],
                s["ncop"], s["niv_tot"], s["meta"][1], Epad, Ecap)
            if upto == "expand":
                return succs[::1024], s["meta"]
            seg = R.build_seg(s["offsets"], succs)
            F = R.sort_segments(seg, succs)
            if upto == "sort0":
                return F[::1024], s["meta"]
            slot_s, src_s = R.copy_fields(
                buf[Epad + Ecap:], s["offsets"], s["ncop"],
                s["tail_len"], s["blocks_sum"], s["parent"], s["depth"],
                s["meta"][2], Ccap, Epad)
            if upto == "plan":
                return slot_s[::1024], src_s[::1024], F[::1024], s["meta"]
            slot_p = jnp.concatenate([slot_s, jnp.full(Ccap, Epad, jnp.int32)])
            src_p = jnp.concatenate([src_s, jnp.zeros(Ccap, jnp.int32)])
            off = 0
            k = 0
            for cnt in hist_key:
                if cnt == 0:
                    continue
                M = R._quant(cnt)
                succs = R.fill_slice(succs, F, slot_p[off:off + M],
                                     src_p[off:off + M], jnp.int32(cnt))
                k += 1
                if upto == f"fill{k}":
                    return succs[::1024], s["meta"]
                F = R.sort_segments(seg, succs)
                if upto == f"sort{k}":
                    return F[::1024], s["meta"]
                off += cnt
            return F[::1024], s["meta"]

        return f

    names = ["parse", "place", "expand", "sort0", "plan"]
    for k in range(1, len(hist_key) + 1):
        names += [f"fill{k}", f"sort{k}"]
    prev = 0.0
    for nm in names:
        ms = bench(stage(nm), out)
        print(f"{nm:8s} cumulative {ms:7.1f}ms   marginal {ms - prev:+7.1f}ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

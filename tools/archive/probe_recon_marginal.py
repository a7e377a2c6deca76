"""Marginal in-program cost of each v2 reconstruction stage: build ONE
jit per prefix of the pipeline and difference the timings. Dispatch
overhead (~30ms/launch through the relay) cancels in the differences,
which per-stage probes cannot do."""

import os
import sys
import time

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
    from webgraph_ans_tpu.ops.reconstruct_device import (
        I32, _cumsum_tok, _quant, _tok_gather, _unpack4)

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgt_r3/cnr-2000-blk"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = int(os.environ.get("WGT_BENCH_LANES", "2048"))
    cap = dec.tighten_cap(L, emit_aux=True)
    n, E = dec.num_nodes, int(dec.num_arcs)
    mi = dec.min_interval
    out, counts, _ = dec.decode_raw(L, cap, emit_aux=True)
    jax.block_until_ready(out)

    st = R.parse_stats(out, n, cap)
    meta = np.asarray(st["meta"])
    total_cop, max_depth = int(meta[2]), int(meta[3])
    hist_key = tuple(int(c) for c in meta[5:4 + max_depth + 1])
    Epad, Ccap = _quant(E + 1), _quant(total_cop)
    print(f"P={cap*L} n={n} E={E} Epad={Epad} Ccap={Ccap} "
          f"hist={hist_key}", flush=True)

    def stage(upto):
        @jax.jit
        def f(out):
            v, a1, a2, nib = _unpack4(out, cap)
            if upto == "unpack":
                return v[::256], a2[::256], nib[::256]
            G = v.shape[1]
            rows = jax.lax.broadcasted_iota(I32, (cap, G), 0)
            cols = jax.lax.broadcasted_iota(I32, (cap, G), 1)
            pos = cols * cap + rows
            is_out = nib == 0
            is_sum9 = nib == 9
            nd = jnp.clip(_cumsum_tok(is_out.astype(I32)) - 1, 0, n - 1)
            if upto == "ndcumsum":
                return nd[::256]
            idx = jnp.where(is_out, nd,
                            jnp.where(is_sum9, n + nd, 2 * n))
            spp = jnp.zeros((2 * n + 1,), I32).at[idx].set(
                pos, mode="drop")
            if upto == "spscatter":
                return spp[::64]
            sp = spp[:n]
            d = _tok_gather(v, sp, cap)
            offsets = jnp.concatenate(
                [jnp.zeros(1, I32), R._cumsum(d)])
            if upto == "nodefields":
                return d[::64], offsets[::64]
            st2 = R.parse_stats(out, n, cap)
            if upto == "parse":
                return st2["meta"]
            off, F, succs, seg = R.assemble(
                st2["v"], st2["a1"], st2["a2"], st2["nib"], st2["sp"],
                st2["d"], st2["offsets"], st2["ncop"], st2["niv"],
                st2["tail"], st2["parent"], st2["depth"], st2["meta"][2],
                Epad, Ccap, mi,
                hist_key if upto == "full" else ())
            return off[:1], F[::4096]

        return f

    prev = 0.0
    for nm in ("unpack", "ndcumsum", "spscatter", "nodefields", "parse",
               "noround", "full"):
        ms = bench(stage(nm), out)
        print(f"{nm:10s} cumulative {ms:7.1f}ms   marginal {ms - prev:+7.1f}ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

"""Marginal cost of each sub-stage INSIDE parse_stats, by chained-prefix
jits (same method as probe_recon_marginal)."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *a, reps=5):
    import jax
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*a))
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

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgt_bench_2aht0sgt/cnr-2000-blk"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = 2048
    cap = dec.tighten_cap(L)
    n = dec.num_nodes
    mi = dec.min_interval
    out, counts, _ = dec.decode_raw(L, cap)
    jax.block_until_ready(out)
    I32 = jnp.int32

    def stage(upto):
        @jax.jit
        def f(out):
            v, nib = R._unpack(out, cap)
            if upto == "unpack":
                return v[::1024] + nib[::1024]
            P = v.shape[0]
            pos = jnp.arange(P, dtype=I32)
            is_out = nib == 0
            prev_nib = jnp.concatenate([jnp.full(1, 0xF, I32), nib[:-1]])
            is_blk = nib == 3
            b = v + (is_blk & (prev_nib == 3)).astype(I32)
            is_il = nib == 6
            is_fr = nib == 7
            ch = jnp.stack([
                is_out.astype(I32),
                is_blk.astype(I32),
                jnp.where(is_blk, b, 0),
                jnp.where(is_il, v + mi, 0),
                (is_fr | (nib == 8)).astype(I32),
            ])
            cs = jnp.cumsum(ch, axis=1)
            nd = jnp.clip(cs[0] - 1, 0, n - 1)
            if upto == "cumsum":
                return cs[:, ::1024].sum() + nd[::1024]
            sp = jnp.full((n,), P - 1, I32).at[
                jnp.where(is_out, nd, n)].set(pos, mode="drop")
            if upto == "sp":
                return sp[::64] + cs[:, ::1024].sum()
            spx = jnp.concatenate([sp, jnp.full((1,), P, I32)])
            csb = jnp.where((spx > 0)[None, :],
                            cs[:, jnp.maximum(spx - 1, 0)], 0)
            nsums = csb[:, 1:] - csb[:, :-1]
            vxp = jnp.concatenate([v, jnp.zeros(3, I32)])
            nibp = jnp.concatenate([nib, jnp.full(3, 0xF, I32)])
            d = vxp[sp]
            ref = jnp.where(nibp[sp + 1] == 1, vxp[sp + 1], 0)
            has_ref = ref > 0
            bc = jnp.where(has_ref & (nibp[sp + 2] == 2), vxp[sp + 2], 0)
            if upto == "fields":
                return d[::64] + ref[::64] + bc[::64] + nsums[:, ::64].sum()
            blk_base_n = cs[1][jnp.minimum(sp + 2, P - 1)]
            base_bcast = R._bcast_runs(P, sp, blk_base_n, jnp.ones(n, bool))
            blk_even = is_blk & (((cs[1] - 1 - base_bcast) & 1) == 0)
            cs_even = R._excl(jnp.cumsum(jnp.where(blk_even, b, 0)))
            ncop_blocks = cs_even[spx[1:]] - cs_even[spx[:-1]]
            parent = jnp.clip(jnp.arange(n, dtype=I32) - ref, 0, n - 1)
            d_ref = jnp.where(has_ref, d[parent], 0)
            tail_len = jnp.where(has_ref & (bc % 2 == 0), d_ref - nsums[2], 0)
            ncop = ncop_blocks + tail_len
            offsets = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(d)])
            if upto == "even":
                return ncop[::64] + offsets[::64]
            depth0 = jnp.where(has_ref, -1, 0)

            def dcond(c):
                dep, k = c
                return jnp.any(dep < 0) & (k < n)

            def dbody(c):
                dep, k = c
                pd = dep[parent]
                return jnp.where((dep < 0) & (pd == k), k + 1, dep), k + 1

            depth, _ = jax.lax.while_loop(dcond, dbody,
                                          (depth0, jnp.zeros((), I32)))
            if upto == "depth":
                return depth[::64] + ncop[::64]
            hist = jnp.zeros(64, I32).at[jnp.clip(depth, 0, 63)].add(ncop)
            ok = jnp.all(ncop + nsums[3] + nsums[4] == d)
            meta = jnp.concatenate([
                jnp.stack([ok.astype(I32), jnp.sum(nsums[3]),
                           jnp.sum(ncop), jnp.max(depth)]), hist])
            return meta
        return f

    prev = 0.0
    for nm in ["unpack", "cumsum", "sp", "fields", "even", "depth", "full"]:
        ms = bench(stage(nm), out)
        print(f"{nm:8s} cumulative {ms:7.1f}ms   marginal {ms - prev:+7.1f}ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

"""Micro-probe: cost attribution inside parse_stats/place at tight-cap
scale (run on real TPU). Measures the individual primitive patterns those
jits are built from, so the redesign targets the real cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a):
    import jax
    f = jax.jit(fn)
    o = f(*a)
    jax.block_until_ready(o)
    ts = []
    for _ in range(5):
        t0 = time.time()
        o = f(*a)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp

    cap, L, n = 1368, 2048, 325557
    P = cap * L
    UNROLL = 8
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.integers(0, 1 << 30, (cap + cap // 8, L),
                                   dtype=np.int64).astype(np.uint32))
    v = jnp.asarray(rng.integers(0, 1 << 20, P, np.int64).astype(np.int32))
    nib = jnp.asarray(rng.integers(0, 9, P, np.int64).astype(np.int32))
    sp = jnp.asarray(np.sort(rng.choice(P, n, replace=False)).astype(np.int32))
    nd = jnp.asarray(np.sort(rng.integers(0, n, P, np.int64)).astype(np.int32))
    dest = jnp.asarray(rng.integers(0, P, P, np.int64).astype(np.int32))
    nvals = jnp.asarray(rng.integers(0, 1 << 20, n, np.int64).astype(np.int32))

    print(f"P={P} n={n}", flush=True)
    print(f"transpose+flat [cap,L]->P: "
          f"{t(lambda o: o[:cap].T.reshape(-1).astype(jnp.int32), out):.1f}ms",
          flush=True)
    steps = jnp.arange(cap)

    def unpack_nib(o):
        cpk = o[cap:]
        return ((cpk[steps // UNROLL] >> ((steps % UNROLL) * 4)[:, None])
                & 0xF).T.reshape(-1).astype(jnp.int32)

    print(f"nib row-gather+T: {t(unpack_nib, out):.1f}ms", flush=True)
    print(f"1 cumsum P: {t(lambda x: jnp.cumsum(x), v):.1f}ms", flush=True)

    def chain6(x):
        for _ in range(6):
            x = jnp.cumsum(x) & 0xFFFFF
        return x

    print(f"6 dependent cumsums P: {t(chain6, v):.1f}ms", flush=True)

    def cumsum2d(o):
        x = o[:cap].astype(jnp.int32)
        cs = jnp.cumsum(x, axis=0)
        base = jnp.cumsum(cs[-1]) - cs[-1]
        return cs + base[None, :]

    print(f"2-level cumsum [cap,L] (no transpose): {t(cumsum2d, out):.1f}ms",
          flush=True)

    print(f"sp-scatter (P->n, .at[nd].min sorted): "
          f"{t(lambda nd, v: jnp.full((n,), P - 1, jnp.int32).at[nd].min(v, indices_are_sorted=True, mode='drop'), nd, v):.1f}ms",
          flush=True)
    print(f"big scatter (P->P set, random): "
          f"{t(lambda d, v: jnp.zeros(P, jnp.int32).at[d].set(v, mode='drop'), dest, v):.1f}ms",
          flush=True)
    srt = jnp.asarray(np.sort(np.asarray(dest)))
    print(f"big scatter (P->P set, sorted idx): "
          f"{t(lambda d, v: jnp.zeros(P, jnp.int32).at[d].set(v, indices_are_sorted=True, mode='drop'), srt, v):.1f}ms",
          flush=True)
    print(f"n-scatter into P (.at[sp].add): "
          f"{t(lambda s, x: jnp.zeros(P, jnp.int32).at[s].add(x, mode='drop'), sp, nvals):.1f}ms",
          flush=True)
    print(f"n-gather from P (csx[sp]): "
          f"{t(lambda x, s: jnp.cumsum(x)[s], v, sp):.1f}ms", flush=True)

    def inj_reset(mask_v, sp):
        masked = jnp.where(mask_v > 0, mask_v, 0)
        cs = jnp.cumsum(masked)
        base = jnp.concatenate([jnp.zeros(1, jnp.int32), cs])[sp]
        delta = base - jnp.concatenate([jnp.zeros(1, jnp.int32), base[:-1]])
        inj = jnp.zeros(P, jnp.int32).at[sp].add(-delta)
        return jnp.cumsum(masked + inj)

    print(f"full inject-reset local_cumsum: {t(inj_reset, v, sp):.1f}ms",
          flush=True)
    print(f"P sort 2key: "
          f"{t(lambda a, b: jax.lax.sort((a, b), num_keys=2)[1], nd, v):.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()

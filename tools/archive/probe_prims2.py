"""Primitive cost calibration at P=2.8M scale: marginal in-program cost,
measured by chaining K data-dependent applications in ONE jit and
differencing K=1 vs K=9 (the ~30 ms relay round trip and any fixed
dispatch cost cancel; data dependence defeats CSE/DCE)."""

import os
import sys
import time

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


def marginal(mk, *a, k1=1, k2=9):
    import jax
    t1 = bench(jax.jit(mk(k1)), *a)
    t2 = bench(jax.jit(mk(k2)), *a)
    return (t2 - t1) / (k2 - k1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp

    np.asarray(jnp.zeros(1))   # pin eager-sync mode

    P = 2801664
    n = 325557
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, P, dtype=np.int32))
    x8 = jnp.asarray(rng.integers(0, 100, (8, P), dtype=np.int32))
    idxP = jnp.asarray(rng.integers(0, P, P, dtype=np.int32))
    idxn = jnp.asarray(np.sort(rng.choice(P, n, replace=False)).astype(np.int32))
    valn = jnp.asarray(rng.integers(0, 100, n, dtype=np.int32))

    def chain(op):
        def mk(k):
            def f(*a):
                y = a[0]
                for i in range(k):
                    y = op(y, *a[1:]) ^ (i & 1)
                return y[..., :1]
            return f
        return mk

    t = marginal(chain(lambda y: jnp.cumsum(y)), x)
    print(f"cumsum [P]             : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: jnp.cumsum(y, axis=1)), x8)
    print(f"cumsum [8,P] axis=1    : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: jnp.cumsum(y, axis=0)), x8.T)
    print(f"cumsum [P,8] axis=0    : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y, i: y[i], ), x, idxP)
    print(f"gather P<-P            : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y, i: y[i % P]), x[:n], idxn)
    print(f"gather n<-n-sized      : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y, i, v: y.at[i].add(v + y[0])), x, idxn, valn)
    print(f"scatter n->P (add)     : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y, i: jnp.zeros(n, jnp.int32).at[
        jnp.clip(y, 0, n - 1)].set(i)[jnp.clip(y, 0, P - 1) % n] + y),
        x, idxP)
    print(f"scatter P->n set+back  : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: jax.lax.associative_scan(
        lambda a, b: jnp.where(b & 1 == 1, b, a), y)), x)
    print(f"assoc ffill [P]        : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: jax.lax.sort((y & 0xFFFF, y), num_keys=2)[1]),
                 x)
    print(f"2-key sort [P]         : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: jax.lax.sort(y)), x)
    print(f"1-key sort [P]         : {t:7.2f}ms", flush=True)
    t = marginal(chain(lambda y: y * 3 + (y >> 2)), x)
    print(f"elementwise [P]        : {t:7.2f}ms", flush=True)
    y2 = jnp.asarray(rng.integers(0, 100, (1368, 2048), dtype=np.int32))
    t = marginal(chain(lambda y: (y.T.reshape(-1) ^ 1).reshape(2048, 1368).T),
                 y2)
    print(f"transpose rt [1368x2048]: {t:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()

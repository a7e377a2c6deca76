"""Microbenchmark: flat P-cumsum vs per-lane 2D cumsum at reconstruction
shapes ([cap, L] token buffers). parse_stats/place run ~10 cumsums over
the token domain; if per-lane axis-0 scans are much cheaper than the
lane-major 1D scan (they carry no cross-lane dependency), the parse
pipeline should keep the native [cap, L] layout.

Also times the two P-scatters (sp, place) and the [cap,L]->[L,cap]
transpose the flat layout forces.

Usage: python tools/exp_cumsum2d.py [cap] [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, reps=5):
    import jax
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o = jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    print(f"{name:<38s} {med*1e3:8.2f} ms", flush=True)
    return med


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1368
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    P = cap * L
    n = 325557
    key = jax.random.PRNGKey(0)
    x2 = jax.random.randint(key, (cap, L), 0, 1 << 10, jnp.int32)
    x1 = x2.reshape(-1)
    nd = jnp.sort(jax.random.randint(key, (P,), 0, n, jnp.int32))
    pos = jnp.arange(P, dtype=jnp.int32)

    print(f"cap={cap} L={L} P={P}")
    bench("cumsum 1D P", jnp.cumsum, x1)
    bench("cumsum 2D axis0 [cap,L]", lambda a: jnp.cumsum(a, axis=0), x2)
    bench("cumsum 2D axis1 [L,cap]",
          lambda a: jnp.cumsum(a, axis=1), x2.T.copy())
    bench("4x cumsum 2D axis0 (fused)",
          lambda a: (jnp.cumsum(a, axis=0) + jnp.cumsum(a * 2, axis=0)
                     + jnp.cumsum(a ^ 1, axis=0) + jnp.cumsum(a + 7, axis=0)),
          x2)
    bench("transpose [cap,L]->[L,cap]+ravel",
          lambda a: a.T.reshape(-1) + 1, x2)
    bench("scatter P->n set",
          lambda i: jnp.zeros((n,), jnp.int32).at[i].set(pos, mode="drop"),
          nd)
    bench("scatter P->P set (masked)",
          lambda i: jnp.zeros((P,), jnp.int32).at[
              jnp.where(i < n // 2, pos, P)].set(1, mode="drop"), nd)
    bench("assoc_scan 1D P",
          lambda a: jax.lax.associative_scan(
              lambda u, v: jnp.where(v & 1 == 1, v, u), a), x1)
    bench("assoc_scan 2D axis0",
          lambda a: jax.lax.associative_scan(
              lambda u, v: jnp.where(v & 1 == 1, v, u), a, axis=0), x2)


if __name__ == "__main__":
    main()

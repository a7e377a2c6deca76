"""Primitive cost model on the real TPU: cumsum / gather / scatter / sort
at reconstruction sizes. Informs reconstruct_device's op choices."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args):
    import jax
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(5):
        t0 = time.time()
        o = f(*args)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    n = args[0].shape[0] if hasattr(args[0], "shape") else len(args[0])
    print(f"{name:<34s} {med*1e3:8.2f} ms  {med/n*1e9:6.2f} ns/el", flush=True)
    return med


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp

    P = 9 * 1024 * 1024
    n = 325557
    Epad = 4 * 1024 * 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (P,), 0, 1 << 20, jnp.int32)
    nd = jnp.sort(jax.random.randint(key, (P,), 0, n, jnp.int32))
    tbl = jax.random.randint(key, (n,), 0, 1 << 20, jnp.int32)
    dest = jax.random.permutation(key, P)[:P].astype(jnp.int32) % Epad
    dest_sorted = jnp.sort(dest)
    e_idx = jax.random.randint(key, (Epad,), 0, Epad, jnp.int32)
    seg = jnp.sort(jax.random.randint(key, (Epad,), 0, n, jnp.int32))
    val = jax.random.randint(key, (Epad,), 0, 1 << 20, jnp.int32)

    bench("elemwise P (3 ops)", lambda a: (a * 3 + 1) ^ (a >> 2), x)
    bench("cumsum P", jnp.cumsum, x)
    bench("gather P from n-table (sorted)", lambda i: tbl[i], nd)
    bench("gather Epad from Epad (random)", lambda i: val[i], e_idx)
    bench("scatter P into n (drop)",
          lambda i: jnp.zeros((n,), jnp.int32).at[i].set(1, mode="drop"), nd)
    bench("scatter P into Epad (random)",
          lambda i: jnp.zeros((Epad,), jnp.int32).at[i].set(1, mode="drop"),
          dest)
    bench("scatter P into Epad (sorted)",
          lambda i: jnp.zeros((Epad,), jnp.int32).at[i].set(
              1, mode="drop", indices_are_sorted=True, unique_indices=False),
          dest_sorted)
    bench("sort P 1-key", jnp.sort, x)
    bench("sort Epad 2-key",
          lambda s, v: jax.lax.sort((s, v), num_keys=2), seg, val)
    bench("sort Epad 2-key +3 payload",
          lambda s, v: jax.lax.sort((s, v, v, v, v), num_keys=2), seg, val)
    bench("sort P 2-key +2 payload",
          lambda s, v: jax.lax.sort((s, v, v, v), num_keys=2), nd, x)
    bench("argsort Epad", jnp.argsort, val)


if __name__ == "__main__":
    main()

"""Microbench: P-scale placement primitives on this TPU.

Decides the reconstruction redesign: is a [P] scatter into a [Epad]
buffer cheaper or dearer than sorting [P] (key, val) pairs? Also times
stacked cumsum_tok, ffill, gathers, and the segment sort at cnr scale.
"""

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
    from webgraph_ans_tpu.ops import reconstruct_device as R

    # pin the axon relay in eager-sync dispatch mode (see bench_device)
    np.asarray(jnp.zeros(1))

    P = 8 << 20           # ~cnr token count (cap*G)
    E = 4 << 20           # ~cnr element count
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, E, P, dtype=np.int32))
    idx_sorted_cols = jnp.asarray(
        np.sort(rng.integers(0, E, P, dtype=np.int32)))
    val = jnp.asarray(rng.integers(0, 1 << 30, P, dtype=np.int32))
    seg = jnp.asarray(np.sort(rng.integers(0, 325000, E, dtype=np.int32)))
    ev = jnp.asarray(rng.integers(0, 1 << 30, E, dtype=np.int32))

    scat = jax.jit(lambda i, v: jnp.zeros(E + 1, jnp.int32)
                   .at[i].set(v, mode="drop"))
    print(f"scatter  set [P={P>>20}M]->[E]:  "
          f"{bench(scat, idx, val):7.1f}ms", flush=True)
    print(f"scatter  set sorted idx:      "
          f"{bench(scat, idx_sorted_cols, val):7.1f}ms", flush=True)

    sortp = jax.jit(lambda i, v: jax.lax.sort((i, v), num_keys=1))
    print(f"sort     [P] pairs:           "
          f"{bench(sortp, idx, val):7.1f}ms", flush=True)
    sorte = jax.jit(lambda s, v: jax.lax.sort((s, v), num_keys=2))
    print(f"sort     [E] 2key (seg sort): "
          f"{bench(sorte, seg, ev):7.1f}ms", flush=True)

    gath = jax.jit(lambda i, v: v[i[:E]])
    print(f"gather   [E] from [P]:        "
          f"{bench(gath, idx, val):7.1f}ms", flush=True)

    # stacked cumsum_tok at [4, cap, G]
    cap, G = P // 2048, 2048
    x4 = jnp.asarray(rng.integers(0, 3, (4, cap, G), dtype=np.int32))
    ct = jax.jit(lambda x: R._cumsum_tok(x))
    print(f"cumsum_tok [4,{cap},{G}]:     {bench(ct, x4):7.1f}ms",
          flush=True)
    x1 = x4[0]
    print(f"cumsum_tok [1,{cap},{G}]:     {bench(ct, x1):7.1f}ms",
          flush=True)

    ch = jnp.asarray(rng.integers(0, 1 << 30, (2, E), dtype=np.int32))
    ff = jax.jit(lambda c: R._ffill_valid(c))
    print(f"ffill    [2, E]:              {bench(ff, ch):7.1f}ms",
          flush=True)
    ch3 = jnp.asarray(rng.integers(0, 1 << 30, (3, E), dtype=np.int32))
    print(f"ffill    [3, E]:              {bench(ff, ch3):7.1f}ms",
          flush=True)

    # elementwise pass over [P] (the fused idx/val computation analog)
    ew = jax.jit(lambda a, b: ((a * 3 + b) ^ (a >> 5)) + (b << 1))
    print(f"elemwise 2in1out [P]:         {bench(ew, idx, val):7.1f}ms",
          flush=True)

    # n-scale ops for reference
    n = 325557
    dn = jnp.asarray(rng.integers(0, 30, n, dtype=np.int32))
    cs = jax.jit(lambda d: R._cumsum(d))
    print(f"cumsum   [n]:                 {bench(cs, dn):7.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()

"""Why does the bvals broadcast cost 56ms when its primitives microbench
free? Isolate: scatter-into-[4,P] vs cumsum_tok at cap=1840 vs pow2."""

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

    np.asarray(jnp.zeros(1))

    n = 325557
    G = 2048
    rng = np.random.default_rng(0)
    for cap in (1840, 2048):
        P = cap * G
        sp = jnp.asarray(np.sort(rng.integers(0, P, n).astype(np.int32)))
        deltas = jnp.asarray(rng.integers(-50, 50, (4, n), dtype=np.int32))
        x4 = jnp.asarray(rng.integers(0, 3, (4, cap, G), dtype=np.int32))

        scat4 = jax.jit(lambda s, d: jnp.zeros((4, cap * G), np.int32)
                        .at[:, s].add(d).reshape(4, cap, G)[:, ::512, ::64])
        print(f"cap={cap} scatter [4,{P}] n-updates: "
              f"{bench(scat4, sp, deltas):7.1f}ms", flush=True)

        ct = jax.jit(lambda x: R._cumsum_tok(x)[:, ::512, ::64])
        print(f"cap={cap} cumsum_tok [4,cap,G]:      "
              f"{bench(ct, x4):7.1f}ms", flush=True)

        both = jax.jit(lambda s, d: R._cumsum_tok(
            jnp.zeros((4, cap * G), np.int32).at[:, s].add(d)
            .reshape(4, cap, G))[:, ::512, ::64])
        print(f"cap={cap} scatter+cumsum:            "
              f"{bench(both, sp, deltas):7.1f}ms", flush=True)

        # 1-channel variants
        scat1 = jax.jit(lambda s, d: jnp.zeros((cap * G,), np.int32)
                        .at[s].add(d[0]).reshape(cap, G)[::512, ::64])
        print(f"cap={cap} scatter [1,{P}] n-updates: "
              f"{bench(scat1, sp, deltas):7.1f}ms", flush=True)

    # eltables shape: scatter [3, Epad] + cumsum over last axis
    Epad = 3670016
    st = jnp.asarray(np.sort(rng.integers(0, Epad, n).astype(np.int32)))
    ed = jnp.asarray(rng.integers(-50, 50, (3, n), dtype=np.int32))
    el = jax.jit(lambda s, d: R._cumsum(
        jnp.zeros((3, Epad), np.int32).at[:, s].add(d, mode="drop"),
        axis=-1)[:, ::512])
    print(f"eltables scatter+cumsum [3,{Epad}]:  "
          f"{bench(el, st, ed):7.1f}ms", flush=True)
    el1 = jax.jit(lambda s, d: R._cumsum(
        jnp.zeros((Epad,), np.int32).at[s].add(d[0], mode="drop"),
        axis=-1)[::512])
    print(f"eltables scatter+cumsum [1,{Epad}]:  "
          f"{bench(el1, st, ed):7.1f}ms", flush=True)


if __name__ == "__main__":
    main()

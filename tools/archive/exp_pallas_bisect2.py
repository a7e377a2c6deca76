"""Finer bisect of the in-loop slab-gather Mosaic crash: reshape vs
broadcast vs the gather itself.

Usage: python tools/exp_pallas_bisect2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 2048
    A = G // 128
    steps = 64
    rng = np.random.default_rng(0)
    slab_np = jnp.asarray(
        rng.integers(0, 1 << 30, size=(G, 128)).astype(np.int32))
    idx_np = jnp.asarray(
        rng.integers(0, 128, size=(G, 128)).astype(np.int32))
    x_np = jnp.asarray(
        rng.integers(1, 1 << 20, size=(A, 128)).astype(np.int32))

    def run_case(tag, body_fn):
        def kern(slab_ref, idx_ref, x_ref, out_ref):
            slab = slab_ref[:]
            idx0 = idx_ref[:]

            def body(i, acc):
                return body_fn(i, acc, slab, idx0)
            out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])

        @jax.jit
        def go(slab, idx, x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((A, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(slab, idx, x)

        try:
            t0 = time.time()
            r = jax.block_until_ready(go(slab_np, idx_np, x_np))
            ts = []
            for _ in range(3):
                t1 = time.time()
                r = jax.block_until_ready(go(slab_np, idx_np, x_np))
                ts.append(time.time() - t1)
            med = float(np.median(ts))
            print(f"{tag:<34s} OK us/step={med/steps*1e6:.2f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:<34s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # 1. gather with static input idx (no reshape), fold result via sum
    def c1(i, acc, slab, idx0):
        g = jnp.take_along_axis(slab, (idx0 + i) & 127, axis=1)
        return acc + jnp.sum(g[:, 0:1].reshape(A, 128) & 0, axis=0,
                             keepdims=True) + acc * 0 + g[0:A, 0:128] * 0 + acc
    run_case("gather input idx", c1)

    # 2. reshape [A,128]->[G,1] in loop, no gather
    def c2(i, acc, slab, idx0):
        col = acc.reshape(G, 1)
        return acc + col[0:A, 0:1]
    run_case("reshape A128->G1", c2)

    # 3. broadcast [G,1]->[G,128] in loop, no gather
    def c3(i, acc, slab, idx0):
        col = jnp.broadcast_to(acc.reshape(G, 1), (G, 128))
        return acc + col[0:A, 0:128] * 0 + jnp.int32(i)
    run_case("reshape+broadcast", c3)

    # 4. gather with idx computed from broadcast (the crasher?)
    def c4(i, acc, slab, idx0):
        pidx = jnp.broadcast_to((acc & 127).reshape(G, 1), (G, 128))
        g = jnp.take_along_axis(slab, pidx, axis=1)
        return acc + g[:, 0:1].reshape(A, 128)
    run_case("gather computed idx", c4)

    # 5. gather with idx computed WITHOUT layout change:
    #    maintain idx in [G, 128] layout as loop carry
    def kern5(slab_ref, idx_ref, x_ref, out_ref):
        slab = slab_ref[:]

        def body(i, c):
            pidx, acc = c
            g = jnp.take_along_axis(slab, pidx & 127, axis=1)
            return (pidx + 1, acc + g[0:A, 0:128])
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (idx_ref[:], x_ref[:]))
        out_ref[:] = acc

    @jax.jit
    def go5(slab, idx, x):
        return pl.pallas_call(
            kern5,
            out_shape=jax.ShapeDtypeStruct((A, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(slab, idx, x)

    try:
        r = jax.block_until_ready(go5(slab_np, idx_np, x_np))
        t1 = time.time()
        r = jax.block_until_ready(go5(slab_np, idx_np, x_np))
        print(f"{'gather carried idx':<34s} OK "
              f"us/step={(time.time()-t1)/steps*1e6:.2f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{'gather carried idx':<34s} FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

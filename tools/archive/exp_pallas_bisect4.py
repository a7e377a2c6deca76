"""Workarounds for the Mosaic reshape->gather crash: force a
materialization between the relayout and the dynamic_gather.

Usage: python tools/exp_pallas_bisect4.py
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
    x_np = jnp.asarray(
        rng.integers(1, 1 << 20, size=(A, 128)).astype(np.int32))
    slab_np = jnp.asarray(
        rng.integers(0, 1 << 30, size=(G, 128)).astype(np.int32))

    def expected():
        x = np.asarray(x_np)
        acc = x.copy()
        slab = np.asarray(slab_np)
        for i in range(steps):
            col = acc.reshape(G)
            g = slab[np.arange(G), col & 127]
            acc = acc + g.reshape(A, 128)
        return acc

    want = expected()

    def run_case(tag, kern, scratch):
        @jax.jit
        def go(slab, x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((A, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )(slab, x)

        try:
            r = jax.block_until_ready(go(slab_np, x_np))
            t1 = time.time()
            r = jax.block_until_ready(go(slab_np, x_np))
            med = time.time() - t1
            print(f"{tag:<40s} OK us/step={med/steps*1e6:.2f} "
                  f"exact={bool((np.asarray(r) == want).all())}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:<40s} FAILED {type(e).__name__}: {str(e)[:110]}",
                  flush=True)

    # f) scratch roundtrip of the [G,1] index column
    def kern_f(slab_ref, x_ref, out_ref, sc_ref):
        slab = slab_ref[:]

        def body(i, acc):
            sc_ref[:] = acc.reshape(G, 1)
            col = sc_ref[:]
            pidx = jnp.broadcast_to(col & 127, (G, 128))
            g = jnp.take_along_axis(slab, pidx, axis=1)
            return acc + g[:, 0:1].reshape(A, 128)
        out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])
    run_case("scratch roundtrip col", kern_f,
             [pltpu.VMEM((G, 1), jnp.int32)])

    # g) optimization_barrier between reshape and gather
    def kern_g(slab_ref, x_ref, out_ref):
        slab = slab_ref[:]

        def body(i, acc):
            col = jax.lax.optimization_barrier(acc.reshape(G, 1))
            pidx = jnp.broadcast_to(col & 127, (G, 128))
            g = jnp.take_along_axis(slab, pidx, axis=1)
            back = jax.lax.optimization_barrier(g[:, 0:1])
            return acc + back.reshape(A, 128)
        out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])
    run_case("optimization_barrier", kern_g, [])

    # h) scratch roundtrip both directions
    def kern_h(slab_ref, x_ref, out_ref, sc_ref, sc2_ref):
        slab = slab_ref[:]

        def body(i, acc):
            sc_ref[:] = acc.reshape(G, 1)
            col = sc_ref[:]
            pidx = jnp.broadcast_to(col & 127, (G, 128))
            g = jnp.take_along_axis(slab, pidx, axis=1)
            sc2_ref[:] = g[:, 0:1]
            return acc + sc2_ref[:].reshape(A, 128)
        out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])
    run_case("scratch roundtrip both", kern_h,
             [pltpu.VMEM((G, 1), jnp.int32), pltpu.VMEM((G, 1), jnp.int32)])


if __name__ == "__main__":
    main()

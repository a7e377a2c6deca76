"""Test Mosaic in-loop layout conversions [A,128] <-> [G,1]-row order,
needed to feed per-lane-row slab gathers from compact-layout registers.

Usage: python tools/exp_pallas_bisect3.py
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

    def run_case(tag, body_fn, check=None):
        def kern(slab_ref, x_ref, out_ref):
            slab = slab_ref[:]

            def body(i, acc):
                return body_fn(i, acc, slab)
            out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])

        @jax.jit
        def go(slab, x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((A, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(slab, x)

        try:
            r = jax.block_until_ready(go(slab_np, x_np))
            t1 = time.time()
            r = jax.block_until_ready(go(slab_np, x_np))
            med = time.time() - t1
            okmsg = ""
            if check is not None:
                okmsg = f" exact={check(np.asarray(r))}"
            print(f"{tag:<40s} OK us/step={med/steps*1e6:.2f}{okmsg}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:<40s} FAILED {type(e).__name__}: {str(e)[:110]}",
                  flush=True)

    # a) swapaxes only
    def c_a(i, acc, slab):
        t = jnp.swapaxes(acc, 0, 1)           # [128, A]
        return acc + jnp.swapaxes(t, 0, 1)
    run_case("swapaxes there+back", c_a)

    # b) [A,128] -> [G,1] -> gather -> [G,1] -> [A,128], single step
    def c_b(i, acc, slab):
        col = acc.reshape(G, 1)               # lane-major rows
        pidx = jnp.broadcast_to(col & 127, (G, 128))
        g = jnp.take_along_axis(slab, pidx, axis=1)
        back = g[:, 0:1].reshape(A, 128)
        return acc + back
    run_case("reshape->gather->reshape", c_b)

    # c) swapaxes -> reshape [128,A]->[G,1] (c-major slab order)
    def c_c(i, acc, slab):
        t = jnp.swapaxes(acc, 0, 1)           # [128, A]
        col = t.reshape(G, 1)                 # rows ordered c*A+a
        pidx = jnp.broadcast_to(col & 127, (G, 128))
        g = jnp.take_along_axis(slab, pidx, axis=1)
        gt = g[:, 0:1].reshape(128, A)
        return acc + jnp.swapaxes(gt, 0, 1)
    run_case("swap+reshape->gather->back", c_c)

    # d) one conversion OUT only (no gather)
    def c_d(i, acc, slab):
        col = acc.reshape(G, 1)
        s = jnp.sum(col.reshape(A, 128), axis=1, keepdims=True)
        return acc + s
    run_case("reshape out+in only", c_d)

    # e) exactness of c_b formulation (single iteration semantics)
    want = None
    def check_b(r):
        x = np.asarray(x_np)
        acc = x.copy()
        slab = np.asarray(slab_np)
        for i in range(steps):
            col = acc.reshape(G)
            g = slab[np.arange(G), col & 127]
            acc = acc + g.reshape(A, 128)
        return bool((r == acc).all())
    run_case("reshape->gather->reshape exact", c_b, check=check_b)


if __name__ == "__main__":
    main()

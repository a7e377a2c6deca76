"""Isolate: broadcast [G,1]->[G,128] feeding dynamic_gather indices.

Usage: python tools/exp_pallas_bisect5.py
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
    col_np = jnp.asarray(
        rng.integers(0, 128, size=(G, 1)).astype(np.int32))
    idxf_np = jnp.asarray(
        rng.integers(0, 128, size=(G, 128)).astype(np.int32))

    def run(tag, kern, ins):
        @jax.jit
        def go(*a):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((G, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        try:
            r = jax.block_until_ready(go(*ins))
            t1 = time.time()
            r = jax.block_until_ready(go(*ins))
            print(f"{tag:<44s} OK us/step={(time.time()-t1)/steps*1e6:.2f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:<44s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    # i) broadcast input col -> gather (in loop)
    def k_i(slab_ref, col_ref, out_ref):
        slab = slab_ref[:]
        col = col_ref[:]

        def body(i, acc):
            pidx = jnp.broadcast_to((col + i) & 127, (G, 128))
            return acc + jnp.take_along_axis(slab, pidx, axis=1)
        out_ref[:] = jax.lax.fori_loop(0, steps, body,
                                       jnp.zeros((G, 128), jnp.int32))
    run("bcast input col -> gather", k_i, (slab_np, col_np))

    # j) broadcast via add-zeros -> gather
    def k_j(slab_ref, col_ref, out_ref):
        slab = slab_ref[:]
        col = col_ref[:]
        z = jnp.zeros((G, 128), jnp.int32)

        def body(i, acc):
            pidx = ((col + i) & 127) + z
            return acc + jnp.take_along_axis(slab, pidx, axis=1)
        out_ref[:] = jax.lax.fori_loop(0, steps, body,
                                       jnp.zeros((G, 128), jnp.int32))
    run("add-zeros bcast -> gather", k_j, (slab_np, col_np))

    # k) carried full idx + bcast delta -> gather
    def k_k(slab_ref, col_ref, idx_ref, out_ref):
        slab = slab_ref[:]
        col = col_ref[:]

        def body(i, c):
            pidx, acc = c
            g = jnp.take_along_axis(slab, pidx & 127, axis=1)
            pidx = pidx + jnp.broadcast_to(col & 1, (G, 128))
            return pidx, acc + g
        _, acc = jax.lax.fori_loop(
            0, steps, body, (idx_ref[:], jnp.zeros((G, 128), jnp.int32)))
        out_ref[:] = acc
    run("carried idx + bcast delta", k_k, (slab_np, col_np, idxf_np))

    # l) no loop: single bcast col -> gather
    def k_l(slab_ref, col_ref, out_ref):
        slab = slab_ref[:]
        pidx = jnp.broadcast_to(col_ref[:] & 127, (G, 128))
        out_ref[:] = jnp.take_along_axis(slab, pidx, axis=1)
    run("no-loop bcast col -> gather", k_l, (slab_np, col_np))


if __name__ == "__main__":
    main()

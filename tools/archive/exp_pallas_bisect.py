"""Bisect which construct crashes the Mosaic compiler in the FSM spike.
Each case is a tiny fori_loop kernel adding ONE construct.

Usage: python tools/exp_pallas_bisect.py
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
    S = 16384
    SPAN = 256
    rng = np.random.default_rng(0)
    lut_np = jnp.asarray(
        rng.integers(0, 1 << 30, size=(S // 128, 128)).astype(np.int32))
    slab_np = jnp.asarray(
        rng.integers(0, 1 << 30, size=(G, SPAN)).astype(np.int32))
    x_np = jnp.asarray(
        rng.integers(1, 1 << 20, size=(A, 128)).astype(np.int32))

    def run_case(tag, body_fn, out_shape=(A, 128)):
        def kern(lut_ref, slab_ref, x_ref, out_ref):
            lut = lut_ref[:]
            slab = slab_ref[:]

            def body(i, acc):
                return body_fn(i, acc, lut, slab, out_ref)
            acc = jax.lax.fori_loop(0, steps, body, x_ref[:])
            if out_shape == (A, 128):
                out_ref[:] = acc

        @jax.jit
        def go(lut, slab, x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(lut, slab, x)

        try:
            t0 = time.time()
            r = jax.block_until_ready(go(lut_np, slab_np, x_np))
            ts = []
            for _ in range(3):
                t1 = time.time()
                r = jax.block_until_ready(go(lut_np, slab_np, x_np))
                ts.append(time.time() - t1)
            med = float(np.median(ts))
            print(f"{tag:<28s} OK warm={time.time()-t0:.1f}s "
                  f"us/step={med/steps*1e6:.2f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:<28s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # a) pure vector ops
    def case_ops(i, acc, lut, slab, out_ref):
        for k in range(20):
            acc = (acc * jnp.int32(5)) ^ (acc >> jnp.int32(k % 7))
        return acc
    run_case("ops only", case_ops)

    # b) + u32 mul
    def case_u32(i, acc, lut, slab, out_ref):
        u = acc.astype(jnp.uint32)
        u = (u >> jnp.uint32(4)) * jnp.uint32(977) + jnp.uint32(3)
        return jax.lax.bitcast_convert_type(u, jnp.int32)
    run_case("u32 mul", case_u32)

    # c) + dynamic out store
    def case_store(i, acc, lut, slab, out_ref):
        out_ref[pl.ds(i, 1), :] = acc.reshape(1, G)
        return acc + 1
    run_case("dyn store", case_store, out_shape=(steps, G))

    # d) + lut gather (transpose trick) in loop
    def case_lut(i, acc, lut, slab, out_ref):
        H = lut.shape[0]
        f = acc & jnp.int32(S - 1)
        outs = []
        for a in range(A):
            idx = jnp.broadcast_to((f[a] & 127)[None, :], (H, 128))
            ga = jnp.take_along_axis(lut, idx, axis=1)
            gat = ga.T
            qa = jnp.broadcast_to((f[a] >> 7)[:, None], (128, H))
            sel = jnp.take_along_axis(gat, qa, axis=1)
            outs.append(sel[:, 0])
        return acc + jnp.stack(outs, axis=0)
    run_case("lut gather in loop", case_lut)

    # e) + slab banked gather in loop (reshape to [G] intermediates)
    def case_slab(i, acc, lut, slab, out_ref):
        pidx = jnp.broadcast_to(
            (acc & jnp.int32(SPAN - 1)).reshape(G)[:, None], (G, 128))
        lo = jnp.take_along_axis(slab[:, 0:128], pidx & 127, axis=1)
        hi = jnp.take_along_axis(slab[:, 128:256], pidx & 127, axis=1)
        word = jnp.where(pidx < 128, lo, hi)[:, 0].reshape(A, 128)
        return acc + word
    run_case("slab gather in loop", case_slab)

    # f) slab gather without 1D reshape (keep [G, 1])
    def case_slab2(i, acc, lut, slab, out_ref):
        pidx = jnp.broadcast_to(
            (acc & jnp.int32(SPAN - 1)).reshape(G, 1), (G, 128))
        lo = jnp.take_along_axis(slab[:, 0:128], pidx & 127, axis=1)
        hi = jnp.take_along_axis(slab[:, 128:256], pidx & 127, axis=1)
        word = jnp.where(pidx < 128, lo, hi)[:, 0:1].reshape(A, 128)
        return acc + word
    run_case("slab gather no-1d", case_slab2)


if __name__ == "__main__":
    main()

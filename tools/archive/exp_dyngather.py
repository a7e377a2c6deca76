"""Microbenchmark tpu.dynamic_gather (Pallas take_along_axis) cost vs
operand height R: out[a,b] = T[idx[a,b], b], T/idx/out all [R, 128] i32.

If a tall-R gather runs near vreg throughput, a fully-replicated-table
layout ([S, 128] with every column = the flat LUT) turns the decode
kernel's per-token LUT lookup into ONE in-VMEM vector op.

Usage: python tools/exp_dyngather.py [steps]
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

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    def make(R, axis):
        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]
            def body(i, c):
                idx, acc = c
                g = jnp.take_along_axis(tab, idx[..., None], axis=axis)[..., 0] \
                    if False else jnp.take_along_axis(tab, idx, axis=axis)
                acc = acc + g
                nxt = ((idx * 17 + acc) & jnp.int32(0x7FFFFFFF)) % \
                    jnp.int32(tab.shape[axis])
                return nxt, acc
            idx, acc = jax.lax.fori_loop(
                0, steps, body, (idx_ref[:], jnp.zeros_like(idx_ref[:])))
            out_ref[:] = acc

        @jax.jit
        def run(tab, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)
        return run

    rng = np.random.default_rng(0)
    for axis in (0, 1):
        for R in (8, 32, 256, 2048, 16384):
            hi = R if axis == 0 else 128
            tab = jnp.asarray(
                rng.integers(0, 1 << 30, size=(R, 128)).astype(np.int32))
            idx = jnp.asarray(
                rng.integers(0, hi, size=(R, 128)).astype(np.int32))
            run = make(R, axis)
            try:
                t0 = time.time()
                r = jax.block_until_ready(run(tab, idx))
                warm = time.time() - t0
            except Exception as e:  # noqa: BLE001
                print(f"axis={axis} R={R:6d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            ts = []
            for _ in range(5):
                t0 = time.time()
                r = jax.block_until_ready(run(tab, idx))
                ts.append(time.time() - t0)
            med = float(np.median(ts))
            per = med / steps
            print(f"axis={axis} R={R:6d}: warm={warm:5.1f}s "
                  f"med={med*1e3:8.2f}ms us/gather={per*1e6:8.2f} "
                  f"ns/elem={per/(R*128)*1e9:6.2f}", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: can Mosaic gather from a VMEM-resident table with
per-lane dynamic indices, and at what cost per token?

The decode kernel's two hot gathers (LUT row per token, stream rows per
chunk) cost ~7-21 ns/element as XLA HBM gathers (tools/probe_decode.py
ablations). If a Pallas kernel can hold the tables in VMEM and gather at
VPU speed, the whole FSM moves into one kernel. This probes candidate
formulations on a realistic shape (S=36864 table, L lanes, `steps`
sequential dependent lookups):

  xla     - jnp gather baseline (same as the production kernel)
  take    - jnp.take on a VMEM ref inside pallas
  onehot  - one-hot bf16 MXU matmul inside pallas

Usage: python tools/exp_pallas_gather.py [L] [steps]
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

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1368
    S = 9 * 4096

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 31, size=S, dtype=np.int64)
                        .astype(np.int32))
    idx0 = jnp.asarray(rng.integers(0, S, size=L).astype(np.int32))

    def step_idx(i, acc):
        return ((i * jnp.int32(1664525) + jnp.int32(1013904223) + acc)
                & jnp.int32(0x7FFFFFFF)) % jnp.int32(S)

    # ---- XLA baseline ----
    @jax.jit
    def xla_loop(idx):
        def body(c):
            i, idx, acc = c
            v = table[idx]
            acc = acc + v
            return i + 1, step_idx(idx, acc), acc
        return jax.lax.while_loop(lambda c: c[0] < steps, body,
                                  (jnp.zeros((), jnp.int32), idx,
                                   jnp.zeros((L,), jnp.int32)))

    # ---- pallas: jnp.take from VMEM ----
    def take_kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:].reshape(-1)          # [S] resident
        def body(i, c):
            idx, acc = c
            v = jnp.take(tab, idx, axis=0)
            acc = acc + v
            return step_idx(idx, acc), acc
        idx, acc = jax.lax.fori_loop(
            0, steps, body, (idx_ref[:].reshape(-1),
                             jnp.zeros((L,), jnp.int32)))
        out_ref[:] = acc.reshape(out_ref.shape)

    @jax.jit
    def pallas_take(idx):
        return pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((L // 128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table.reshape(S // 128, 128), idx.reshape(L // 128, 128)
          ).reshape(-1)

    def bench(fn, tag):
        try:
            t0 = time.time()
            r = jax.block_until_ready(fn(idx0))
            warm = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = jax.block_until_ready(fn(idx0))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        acc = np.asarray(r[-1] if isinstance(r, tuple) else r)
        print(f"{tag}: warm={warm:.1f}s med={med*1e3:.2f}ms "
              f"us/step={med/steps*1e6:.2f} ns/tok={med/(steps*L)*1e9:.2f} "
              f"sum={int(acc.astype(np.int64).sum())}", flush=True)
        return med

    bench(xla_loop, "xla   ")
    bench(pallas_take, "take  ")


if __name__ == "__main__":
    main()

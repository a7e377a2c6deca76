"""Microbenchmark: per-token LUT fetch as HBM row gather vs one-hot MXU
matmul (exact: one-hot bf16 rows select a single bf16 byte-plane entry,
f32 accumulation of one nonzero term is exact).

The decode kernel's dominant cost is one serialized per-lane LUT gather
per token (~25-100 ns/element on v5e, measured in docs/ARCHITECTURE.md).
This probes whether expressing the lookup as
    onehot(hi) [L, H] @ planes [H, 128*C]   (MXU)
    sum_k onehot(lo)[l,k] * pick[l,k,c]     (VPU)
beats the gather inside a realistic while_loop body.

Usage: python tools/exp_matlut.py [L] [steps]
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

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    S = 9 * 4096          # flat LUT slots (9 components x 2^12 frame cap)
    H = S // 128          # hi rows
    C = 4                 # byte planes fetched per token (2 u32 columns -> 8,
                          # but freq/cumul/sym/folds pack into 4 u16-ish planes;
                          # probe 4 to start)

    rng = np.random.default_rng(0)
    lut = jnp.asarray(rng.integers(0, 2**32, size=(S, 2), dtype=np.uint64)
                      .astype(np.uint32))
    # byte planes, bf16 (values 0..255 exact)
    lut_np = np.asarray(lut)
    planes = np.zeros((S, C), np.float32)
    planes[:, 0] = lut_np[:, 0] & 0xFF
    planes[:, 1] = (lut_np[:, 0] >> 8) & 0xFF
    planes[:, 2] = (lut_np[:, 0] >> 16) & 0xFF
    planes[:, 3] = (lut_np[:, 0] >> 24) & 0xFF
    planes_hi = jnp.asarray(planes.reshape(H, 128, C).reshape(H, 128 * C)
                            .astype(jnp.bfloat16))

    def step_slot(s):
        # cheap per-step pseudo-random slot evolution (stands in for the
        # rANS state update)
        return (s * jnp.uint32(1664525) + jnp.uint32(1013904223)) % jnp.uint32(S)

    def gather_body(carry):
        i, slot, acc = carry
        row = lut[slot]
        acc = acc + row[:, 0] + row[:, 1]
        return i + 1, step_slot(slot + (acc & 7)), acc

    def matmul_body(carry):
        i, slot, acc = carry
        hi = (slot >> jnp.uint32(7)).astype(jnp.int32)
        lo = (slot & jnp.uint32(127)).astype(jnp.int32)
        oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)
        pick = jax.lax.dot_general(
            oh_hi, planes_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(L, 128, C)
        oh_lo = (lo[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
                 ).astype(jnp.float32)
        sel = jnp.einsum("lkc,lk->lc", pick, oh_lo)
        b = sel.astype(jnp.uint32)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        acc = acc + word
        return i + 1, step_slot(slot + (acc & 7)), acc

    def run(body):
        def cond(c):
            return c[0] < steps
        @jax.jit
        def go(slot):
            acc = jnp.zeros((L,), jnp.uint32)
            return jax.lax.while_loop(cond, body,
                                      (jnp.zeros((), jnp.int32), slot, acc))
        slot0 = jnp.asarray(rng.integers(0, S, size=L).astype(np.uint32))
        t0 = time.time()
        r = jax.block_until_ready(go(slot0))
        warm = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            r = jax.block_until_ready(go(slot0))
            times.append(time.time() - t0)
        med = float(np.median(times))
        return warm, med, np.asarray(r[2])

    wg, tg, ag = run(gather_body)
    wm, tm, am = run(matmul_body)
    tok = L * steps
    print(f"L={L} steps={steps} S={S} C={C}")
    print(f"gather: warm={wg:.1f}s med={tg*1e3:.1f}ms "
          f"{tg/tok*1e9:.2f} ns/token  us/step={tg/steps*1e6:.1f}")
    print(f"matmul: warm={wm:.1f}s med={tm*1e3:.1f}ms "
          f"{tm/tok*1e9:.2f} ns/token  us/step={tm/steps*1e6:.1f}")
    # correctness of the selection path itself (fc column only)
    print("exact-match:", bool((ag == am).all()))


if __name__ == "__main__":
    main()

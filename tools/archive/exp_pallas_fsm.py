"""Spike probe for the Pallas decode-kernel design. Validates, on the
real chip:

1. axis-1 dynamic_gather on a [G, SPAN] per-lane slab with SPAN > 128
   (cross-vreg column indices) — the stream-refill primitive.
2. dynamic sublane stores out_ref[pl.ds(step,1), :] inside a fori_loop.
3. a representative FSM-sized loop body (~150 vector ops on [R, G] regs
   + 1 LUT two-stage gather + 1 slab gather + 1 out store) — per-step
   cost vs the XLA while_loop's ~35 us/step per-op overhead.
4. u32 multiply / shift semantics.

Usage: python tools/exp_pallas_fsm.py [G] [steps]
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

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)

    # ---------- 1. slab gather with SPAN=256 ----------
    SPAN = 256
    slab_np = rng.integers(0, 1 << 30, size=(G, SPAN)).astype(np.int32)
    sidx_np = rng.integers(0, SPAN, size=(G,)).astype(np.int32)

    def slab_kernel(slab_ref, idx_ref, out_ref):
        # bank-split: SPAN=256 -> two 128-column lane gathers + select
        idx = idx_ref[:, 0:128]                # [G, 128] broadcast index
        lo = jnp.take_along_axis(slab_ref[:, 0:128], idx & 127, axis=1)
        hi = jnp.take_along_axis(slab_ref[:, 128:256], idx & 127, axis=1)
        out_ref[:, 0:128] = jnp.where(idx < 128, lo, hi)
        out_ref[:, 128:256] = hi

    @jax.jit
    def slab_gather(slab, idx):
        return pl.pallas_call(
            slab_kernel,
            out_shape=jax.ShapeDtypeStruct((G, SPAN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(slab, idx)

    try:
        idx_full = jnp.asarray(np.broadcast_to(sidx_np[:, None],
                                               (G, SPAN)).copy())
        r = np.asarray(jax.block_until_ready(
            slab_gather(jnp.asarray(slab_np), idx_full)))
        ok = bool((r[:, 0] == slab_np[np.arange(G), sidx_np]).all())
        print(f"slab gather SPAN={SPAN} (banked): ok={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"slab gather SPAN={SPAN} (banked): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # ---------- 2+3+4. FSM-shaped loop ----------
    S = 16384                      # LUT entries
    R = 24                         # register rows
    lut_np = rng.integers(0, 1 << 30, size=(S // 128, 128)).astype(np.int32)
    regs_np = rng.integers(1, 1 << 20, size=(R, G)).astype(np.int32)
    A = G // 128                   # lane tile rows

    def fsm_kernel(lut_ref, slab_ref, regs_ref, out_ref):
        lut = lut_ref[:]           # [S//128, 128]
        slab = slab_ref[:]         # [G, SPAN]
        col = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 1)

        def lut_gather(f):
            """flat LUT lookup, f [A,128] in [0,S): per output row a,
            one full-table lane gather + transpose + one lane gather."""
            q = f >> 7                 # row in lut  [A, 128]
            m = f & 127                # column      [A, 128]
            outs = []
            H = lut.shape[0]           # 128 for S=16384
            for a in range(A):
                idx = jnp.broadcast_to(m[a][None, :], (H, 128))
                ga = jnp.take_along_axis(lut, idx, axis=1)   # [H, 128]
                gat = ga.T                                    # [128, H]
                qa = jnp.broadcast_to(q[a][:, None], (128, H))
                sel = jnp.take_along_axis(gat, qa, axis=1)    # [128, H]
                outs.append(sel[:, 0])                        # diag col
            return jnp.stack(outs, axis=0)                    # [A, 128]

        def body(i, carry):
            st, ptr, thr = carry               # each [A, 128]
            # LUT lookup
            f = (st & jnp.int32(S - 1))
            row = lut_gather(f)
            # slab refill: per-lane banked gather (SPAN=256 -> 2 banks)
            pidx = jnp.broadcast_to(
                (ptr & jnp.int32(SPAN - 1)).reshape(G)[:, None], (G, 128))
            lo = jnp.take_along_axis(slab[:, 0:128], pidx & 127, axis=1)
            hi = jnp.take_along_axis(slab[:, 128:256], pidx & 127, axis=1)
            word = jnp.where(pidx < 128, lo, hi)[:, 0].reshape(A, 128)
            # ~140 representative vector ops on the register file
            acc = st
            for k in range(20):
                acc = (acc + row) ^ (word >> jnp.int32(k % 7))
                acc = jnp.where((acc & 1) == 0, acc * jnp.int32(5),
                                acc + jnp.int32(k))
                m2 = acc > thr
                acc = jnp.where(m2, acc - word, acc + row)
            st2 = (st.astype(jnp.uint32) >> jnp.uint32(4)) * \
                jnp.uint32(977) + acc.astype(jnp.uint32)
            out_ref[pl.ds(i, 1), :] = acc.reshape(1, G)
            return (jax.lax.bitcast_convert_type(st2, jnp.int32),
                    ptr + 1, thr)

        r0 = regs_ref[:]
        jax.lax.fori_loop(0, steps, body,
                          (r0[0].reshape(A, 128), r0[1].reshape(A, 128),
                           r0[2].reshape(A, 128)))

    @jax.jit
    def fsm(lut, slab, regs):
        return pl.pallas_call(
            fsm_kernel,
            out_shape=jax.ShapeDtypeStruct((steps, G), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lut, slab, regs)

    try:
        t0 = time.time()
        r = jax.block_until_ready(
            fsm(jnp.asarray(lut_np), jnp.asarray(slab_np),
                jnp.asarray(regs_np)))
        warm = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = jax.block_until_ready(
                fsm(jnp.asarray(lut_np), jnp.asarray(slab_np),
                    jnp.asarray(regs_np)))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        print(f"fsm loop: G={G} steps={steps} warm={warm:.1f}s "
              f"med={med*1e3:.2f}ms us/step={med/steps*1e6:.2f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fsm loop: FAILED {type(e).__name__}: {str(e)[:400]}",
              flush=True)

    # ---------- LUT gather correctness ----------
    def lutcheck_kernel(lut_ref, f_ref, out_ref):
        lut = lut_ref[:]
        f = f_ref[:]
        H = lut.shape[0]
        outs = []
        for a in range(f.shape[0]):
            idx = jnp.broadcast_to((f[a] & 127)[None, :], (H, 128))
            ga = jnp.take_along_axis(lut, idx, axis=1)
            gat = ga.T
            qa = jnp.broadcast_to((f[a] >> 7)[:, None], (128, H))
            sel = jnp.take_along_axis(gat, qa, axis=1)
            outs.append(sel[:, 0])
        out_ref[:] = jnp.stack(outs, axis=0)

    f_np = rng.integers(0, S, size=(A, 128)).astype(np.int32)

    @jax.jit
    def lutcheck(lut, f):
        return pl.pallas_call(
            lutcheck_kernel,
            out_shape=jax.ShapeDtypeStruct((A, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lut, f)

    try:
        got = np.asarray(jax.block_until_ready(
            lutcheck(jnp.asarray(lut_np), jnp.asarray(f_np))))
        want = lut_np.reshape(-1)[f_np]
        print(f"lut two-stage gather: ok={bool((got == want).all())}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lut two-stage gather: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

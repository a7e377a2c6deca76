"""Integrated spike for the production Pallas decode kernel: exercises
the EXACT structure the real kernel will use, on mock FSM semantics,
with a numpy shadow for bit-exactness:

- 1D grid over 8-step blocks; FSM registers in VMEM scratch persisting
  across grid steps (init at program_id 0);
- inner fori_loop(0, 8) with a traced substep index;
- per-tile ([A,128] register layout, A = G/128):
  * lut_gather: [H, 256] two-bank table lookup (role-reversal)
  * tree_select_rows8 + gather8 slab access (8-pair loc extraction)
- dynamic sublane store of [1, A, 128] value rows into an [8, A, 128]
  output block; a const-mapped finals output.

Usage: python tools/exp_pallas_decode_spike.py [G] [cap]
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

    from webgraph_ans_tpu.ops.pallas_prims import (
        gather8, lut_gather, tree_select_rows8)

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    A = G // 128
    NROWS = 257                      # LUT rows (slots 32896)
    H = 264                          # padded to a multiple of 8
    SLOTS = NROWS * 128
    SMAXP = 256                      # slab pairs per lane
    NG = SMAXP // 8
    NR = 4                           # mock registers: state, ptr, acc, x

    rng = np.random.default_rng(0)
    lut_np = rng.integers(0, 1 << 30, size=(H, 256)).astype(np.int32)
    slab_np = rng.integers(0, 1 << 30, size=(SMAXP, G)).astype(np.int32)
    regs_np = np.stack([
        rng.integers(0, 1 << 20, size=(A, 128)).astype(np.int32),  # state
        rng.integers(64, 2 * SMAXP, size=(A, 128)).astype(np.int32),  # ptr
        np.zeros((A, 128), np.int32),                              # acc
        rng.integers(0, 8, size=(A, 128)).astype(np.int32),        # x
    ])

    def mock_step_np(state, ptr, acc, x):
        idx = (state & (SLOTS - 1)) % SLOTS
        fc = lut_np[idx >> 7, idx & 127]
        sf = lut_np[idx >> 7, 128 + (idx & 127)]
        pair_lo = np.clip((ptr - 15), 0, 2 * SMAXP) >> 1
        g = np.minimum(pair_lo >> 3, NG - 1)
        locs = []
        for j in range(3):
            pj = np.minimum(pair_lo + 2 * j, SMAXP - 1)
            gj = np.stack([slab_np[np.minimum(g[a] * 8 + (pj[a] - g[a] * 8),
                                              SMAXP - 1), np.arange(128) + 0]
                           for a in range(A)])
            locs.append(gj)
        w = locs[0] ^ locs[1] ^ locs[2]
        state2 = (state ^ fc) + (sf & 0xFFFF) + w
        ptr2 = np.maximum(ptr - (state2 & 3), 0)
        acc2 = acc + (state2 & 0xFF)
        x2 = x + 1
        return (state2 & 0x7FFFFFFF, ptr2, acc2, x2,
                (state2 & 0xFFFF).astype(np.int32))

    # fix the slab indexing of the shadow: column is the GLOBAL lane
    def mock_step_np(state, ptr, acc, x):  # noqa: F811
        idx = state & (SLOTS - 1)
        idx = np.minimum(idx, SLOTS - 1)
        fc = lut_np[idx >> 7, idx & 127]
        sf = lut_np[idx >> 7, 128 + (idx & 127)]
        pair_lo = np.clip(ptr - 15, 0, 2 * SMAXP) >> 1
        g = np.minimum(pair_lo >> 3, NG - 1)
        lanes = (np.arange(A)[:, None] * 128 + np.arange(128)[None, :])
        locs = []
        for j in range(3):
            pj = np.clip(g * 8 + ((pair_lo + 2 * j) & 7), 0, SMAXP - 1)
            locs.append(slab_np[pj, lanes])
        w = locs[0] ^ locs[1] ^ locs[2]
        state2 = ((state ^ fc) + (sf & 0xFFFF) + w) & 0x7FFFFFFF
        ptr2 = np.maximum(ptr - (state2 & 3), 0)
        acc2 = acc + (state2 & 0xFF)
        return (state2, ptr2, acc2, x + 1,
                (state2 & 0xFFFF).astype(np.int32))

    def shadow():
        state, ptr, acc, x = [r.copy() for r in regs_np]
        outs = np.zeros((cap, A, 128), np.int32)
        for s in range(cap):
            state, ptr, acc, x, v = mock_step_np(state, ptr, acc, x)
            outs[s] = v
        return outs, np.stack([state, ptr, acc, x])

    def kernel(lut_ref, slab_ref, init_ref, out_ref, fin_ref, regs_sc):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            regs_sc[:] = init_ref[:]

        lut = lut_ref[:]

        probe = os.environ.get("SPIKE_PROBE", "")
        dup = int(os.environ.get("SPIKE_DUP", "1"))

        def substep(sub, carry):
            state, ptr, acc, x = carry
            for d in range(dup - 1):
                extra = []
                for a in range(A):
                    irow = (state[a:a + 1, :] + d) & (SLOTS - 1)
                    row = lut_gather(lut, irow, NROWS)
                    prow = ptr[a:a + 1, :]
                    pair_lo = jnp.clip(prow - 15 - d, 0, 2 * SMAXP) >> 1
                    g = jnp.minimum(pair_lo >> 3, NG - 1)
                    tile = slab_ref[:, a * 128:(a + 1) * 128]
                    grp = tree_select_rows8(tile, g, NG)
                    w = gather8(grp, pair_lo) ^ row[:, 0:128]
                    extra.append(w)
                acc = acc + (jnp.concatenate(extra, axis=0) & 1)
            fcs, sfs, ws = [], [], []
            for a in range(A):
                irow = state[a:a + 1, :] & (SLOTS - 1)
                if "nolut" in probe:
                    row = jnp.concatenate(
                        [irow, irow + 1], axis=1)
                else:
                    row = lut_gather(lut, irow, NROWS)   # [1, 256]
                fcs.append(row[:, 0:128])
                sfs.append(row[:, 128:256])
                prow = ptr[a:a + 1, :]
                pair_lo = jnp.clip(prow - 15, 0, 2 * SMAXP) >> 1
                g = jnp.minimum(pair_lo >> 3, NG - 1)
                if "noslab" in probe:
                    w = pair_lo * 3
                else:
                    tile = slab_ref[:, a * 128:(a + 1) * 128]
                    if "notree" in probe:
                        grp = tile[0:8, :]
                    else:
                        grp = tree_select_rows8(tile, g, NG)  # [8, 128]
                    w = None
                    for j in range(3):
                        lj = gather8(grp, pair_lo + 2 * j)
                        w = lj if w is None else w ^ lj
                ws.append(w)
            fc = jnp.concatenate(fcs, axis=0)
            sf = jnp.concatenate(sfs, axis=0)
            w = jnp.concatenate(ws, axis=0)
            state = ((state ^ fc) + (sf & 0xFFFF) + w) & 0x7FFFFFFF
            ptr = jnp.maximum(ptr - (state & 3), 0)
            acc = acc + (state & 0xFF)
            v = state & 0xFFFF
            out_ref[pl.ds(sub, 1), :, :] = v[None, :, :]
            return state, ptr, acc, x + 1

        carry = (regs_sc[0, :, :], regs_sc[1, :, :],
                 regs_sc[2, :, :], regs_sc[3, :, :])
        state, ptr, acc, x = jax.lax.fori_loop(0, 8, substep, carry)
        regs_sc[0, :, :], regs_sc[1, :, :] = state, ptr
        regs_sc[2, :, :], regs_sc[3, :, :] = acc, x
        fin_ref[:] = regs_sc[:]

    @jax.jit
    def run(lut, slab, init):
        return pl.pallas_call(
            kernel,
            grid=(cap // 8,),
            in_specs=[
                pl.BlockSpec((H, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SMAXP, G), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NR, A, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, A, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NR, A, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((cap, A, 128), jnp.int32),
                jax.ShapeDtypeStruct((NR, A, 128), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((NR, A, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(lut, slab, init)

    t0 = time.time()
    out, fin = jax.block_until_ready(
        run(jnp.asarray(lut_np), jnp.asarray(slab_np), jnp.asarray(regs_np)))
    print(f"compile+run {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t1 = time.time()
        out, fin = jax.block_until_ready(
            run(jnp.asarray(lut_np), jnp.asarray(slab_np),
                jnp.asarray(regs_np)))
        ts.append(time.time() - t1)
    med = float(np.median(ts))
    print(f"us/step={med / cap * 1e6:.2f}  ns/lane-step="
          f"{med / cap / G * 1e9:.3f}", flush=True)

    want_out, want_fin = shadow()
    ok_out = bool((np.asarray(out) == want_out).all())
    ok_fin = bool((np.asarray(fin) == want_fin).all())
    print(f"exact: out={ok_out} fin={ok_fin}", flush=True)
    if not ok_out:
        bad = np.argwhere(np.asarray(out) != want_out)
        print("first mismatches:", bad[:5],
              np.asarray(out)[tuple(bad[0])], want_fin.dtype,
              want_out[tuple(bad[0])])


if __name__ == "__main__":
    main()

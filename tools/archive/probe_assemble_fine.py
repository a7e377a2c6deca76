"""Fine-grained marginal cost of assemble's sub-stages (one jit per
prefix, relay constant cancels in differences)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *a, reps=5):
    import jax
    o = fn(*a)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o = fn(*a)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops import reconstruct_device as R
    from webgraph_ans_tpu.ops.reconstruct_device import (
        I32, _cumsum_tok, _quant, _ffill_valid, _depth_order,
        _bcast_runs_multi, sort_segments, fill_slice)

    np.asarray(jnp.zeros(1))

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgt_r3/cnr-2000-blk"
    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    L = int(os.environ.get("WGT_BENCH_LANES", "2048"))
    cap = dec.tighten_cap(L, emit_aux=True)
    n, E = dec.num_nodes, int(dec.num_arcs)
    mi = dec.min_interval
    out, counts, _ = dec.decode_raw(L, cap, emit_aux=True)
    jax.block_until_ready(out)

    st0 = R.parse_stats(out, n, cap)
    meta = np.asarray(st0["meta"])
    total_cop, max_depth = int(meta[2]), int(meta[3])
    hist_key = tuple(int(c) for c in meta[4:4 + max_depth + 1][1:])
    Epad, Ccap = _quant(E + 1), _quant(total_cop)
    print(f"P={cap*L} n={n} E={E} Epad={Epad} Ccap={Ccap} "
          f"hist={hist_key}", flush=True)

    st = {k: np.asarray(v) if k != "meta" else v for k, v in st0.items()
          if k != "meta"}
    args = {k: jnp.asarray(v) for k, v in st.items()}

    def stage(upto):
        @jax.jit
        def f(v, a1, a2, nib, sp, d, offsets, ncop, niv, tail, parent,
              depth):
            cap_, G = v.shape
            prev_nib = jnp.concatenate([
                jnp.concatenate([jnp.full((1, 1), 0xF, I32),
                                 nib[-1:, :-1]], axis=1),
                nib[:-1, :]], axis=0)
            is_blk = nib == 3
            b = v + (is_blk & (prev_nib == 3)).astype(I32)
            is_is = nib == 5
            is_res = (nib == 7) | (nib == 8)
            is_sum = nib == 9
            _, cb = _depth_order(depth, ncop)
            bvals = jnp.stack([
                offsets[:n], offsets[parent],
                offsets[jnp.minimum(parent + 1, n)], cb])
            deltas = bvals - jnp.concatenate(
                [jnp.zeros((4, 1), I32), bvals[:, :-1]], axis=1)
            spf = (sp % cap_) * G + sp // cap_
            bb = _cumsum_tok(jnp.zeros((4, cap_ * G), I32).at[:, spf].add(
                deltas).reshape(4, cap_, G))
            off_x, off_par, off_pend, cbx = bb[0], bb[1], bb[2], bb[3]
            if upto == "bvals":
                return off_x[::512], cbx[::512]
            own = is_blk & ((a2 & 1) == 1) & (b > 0)
            tl = is_sum & (a2 > 0)
            qs_own = cbx + (a2 >> 1)
            qs_tl = cbx + v - a2
            BIG = 2 * Epad + Ccap
            idx = jnp.where(is_res, off_x + a2,
                  jnp.where(is_is, Epad + off_x + a2,
                  jnp.where(own, 2 * Epad + qs_own,
                  jnp.where(tl, 2 * Epad + qs_tl, BIG))))
            val = jnp.where(is_res, a1,
                  jnp.where(is_is, ((a1 - (off_x + a2)) << 1) | 1,
                  jnp.where(own, ((off_par + a1 - qs_own) << 1) | 1,
                            ((off_pend - a2 - qs_tl) << 1) | 1)))
            buf = jnp.zeros(BIG + 1, I32).at[idx].set(val, mode="drop")
            if upto == "scatter":
                return buf[::512]
            N = max(Epad, Ccap)
            ch = jnp.zeros((2, N), I32)
            ch = ch.at[0, :Epad].set(buf[Epad:2 * Epad])
            ch = ch.at[1, :Ccap].set(buf[2 * Epad:2 * Epad + Ccap])
            ff = _ffill_valid(ch)
            if upto == "ffill":
                return ff[:, ::512]
            evals = jnp.stack([
                jnp.arange(n, dtype=I32),
                offsets[:n] + ncop,
                offsets[:n] + ncop + niv])
            edeltas = evals - jnp.concatenate(
                [jnp.zeros((3, 1), I32), evals[:, :-1]], axis=1)
            stx = jnp.minimum(offsets[:n], Epad)
            eb = R._cumsum(jnp.zeros((3, Epad), I32).at[:, stx].add(
                edeltas, mode="drop"), axis=-1)
            gidx = jnp.arange(Epad, dtype=I32)
            seg = jnp.where(gidx >= offsets[n], n, eb[0])
            is_iv_el = (gidx >= eb[1]) & (gidx < eb[2])
            succs = jnp.where(is_iv_el, (ff[0, :Epad] >> 1) + gidx,
                              buf[:Epad])
            if upto == "eltables":
                return succs[::512], seg[::512]
            F = sort_segments(seg, succs)
            if upto == "sort0":
                return F[::512]
            # rounds
            q = jnp.arange(Ccap, dtype=I32)
            src = jnp.clip((ff[1, :Ccap] >> 1) + q, 0, Epad - 1)
            slotb, = _bcast_runs_multi(Ccap, cb, [offsets[:n] - cb],
                                       ncop > 0)
            live = q < total_cop
            slot = jnp.where(live, slotb + q, Epad)
            src = jnp.where(live, src, 0)
            slot_p = jnp.concatenate([slot, jnp.full(Ccap, Epad, I32)])
            src_p = jnp.concatenate([src, jnp.zeros(Ccap, I32)])
            off = 0
            nround = {"round1": 1, "round2": 2, "full": len(hist_key)}[upto]
            for cnt in hist_key[:nround]:
                M = R._quant(cnt)
                succs = fill_slice(succs, F, slot_p[off:off + M],
                                   src_p[off:off + M], jnp.int32(cnt))
                F = sort_segments(seg, succs)
                off += cnt
            return F[::512]

        return f

    names = ["bvals", "scatter", "ffill", "eltables", "sort0",
             "round1", "round2", "full"]
    prev = 0.0
    a = [args[k] for k in ("v", "a1", "a2", "nib", "sp", "d", "offsets",
                           "ncop", "niv", "tail", "parent", "depth")]
    for nm in names:
        ms = bench(stage(nm), *a)
        print(f"{nm:9s} cumulative {ms:7.1f}ms   marginal {ms - prev:+7.1f}ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

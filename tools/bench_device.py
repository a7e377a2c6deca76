"""Per-measurement device benchmark subprocess.

Measures ONE pipeline stage per process, so measurements cannot
contaminate each other: on the axon remote-device relay, dispatch cost
grows with process history (number of prior fetches/dispatches), which
made late bench sections read 3-9x slower than the same computation in a
fresh process (tools/probe_e2e_gap.py vs BENCH logs).

Protocol: one tiny fetch up front pins the relay in its eager-sync
dispatch mode (its lazy pre-fetch mode defers execution and replays with
seconds/call overhead at the final fetch — measured, see ROADMAP notes);
then warm up, then `reps` timed calls, each drained with
block_until_ready; report the MEDIAN. Per-call wall = device execution +
a constant relay round trip (~30 ms here, ~0 on a local TPU), so the
reported number is an honest upper bound on device time.

Usage: bench_device.py BASE MODE [reps] [lanes]
  MODE = pallas | xla | e2e | encode
Env: WGT_BENCH_CAP (required), WGT_BENCH_META (e2e), WGT_BENCH_SRC +
WGT_BENCH_EST (encode).
Prints one JSON line {"mode":..., "reps": N, "sec_per_rep": s,
"ns_per_arc": x}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    base = sys.argv[1]
    mode = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder

    # pin eager-sync dispatch mode before anything is timed
    np.asarray(jnp.zeros(1))

    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    arcs = g.num_arcs

    # cap comes from the parent (tighten_cap costs a decode; the parent
    # already knows the tight cap for the artifact); the emit mode
    # self-plans (its plan path is warmup, not measurement)
    cap = int(os.environ.get("WGT_BENCH_CAP", "0")) or None

    if mode == "plan":
        # tight caps + reconstruction meta for the token-kernel modes;
        # the parent passes them to the other subprocesses (it must not
        # touch the device itself: an idle relay connection wedges)
        capk = dec.tighten_cap(L)
        cap_aux = dec.tighten_cap(L, emit_aux=True)
        offs_d, succs_d, E = dec.decode_to_csr_device(num_lanes=L)
        jax.block_until_ready(succs_d)
        if os.environ.get("WGT_BENCH_SRC"):
            from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
            adj, _ = load_bvgraph(os.environ["WGT_BENCH_SRC"])
            ok = bool(np.array_equal(
                np.asarray(succs_d[:E]).astype(np.uint32), adj.succs))
        else:
            ok = True
        meta = dec.plan(L)["recon_meta"]["meta"]
        print(json.dumps({"mode": "plan", "cap": int(capk),
                          "cap_aux": int(cap_aux), "bit_exact": ok,
                          "meta": [int(x) for x in meta]}))
        return
    if mode == "emit":
        # merged-emit pipeline: decode + in-kernel reconstruction ->
        # padded device adjacency (+ fused post-pass). Warmup includes
        # a full bit-exact verification against the source graph.
        s2d, st, dgs = dec.decode_to_adjacency_device(num_lanes=L)
        jax.block_until_ready(s2d)
        s2d, st, dgs = dec.decode_to_adjacency_device(num_lanes=L)
        jax.block_until_ready(s2d)
        F = np.asarray(s2d).reshape(-1)
        stn = np.asarray(st).astype(np.int64)
        d = np.asarray(dgs).astype(np.int64)
        Gn = np.asarray(s2d).shape[1]
        if os.environ.get("WGT_BENCH_SRC"):
            from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
            adj, _ = load_bvgraph(os.environ["WGT_BENCH_SRC"])
            offs = adj.offsets.astype(np.int64)
            ref = adj.succs
        elif os.environ.get("WGT_BENCH_REF_NPY"):
            ref = np.load(os.environ["WGT_BENCH_REF_NPY"], mmap_mode="r")
            offs_path = os.path.join(
                os.path.dirname(os.environ["WGT_BENCH_REF_NPY"]),
                "offs.npy")
            if os.path.exists(offs_path):
                # reference offsets saved by the fixture builder: the
                # degree check below is then independent of the
                # decoder's own output (ADVICE r04 #5)
                offs = np.load(offs_path)
            else:
                offs = np.concatenate([[0], np.cumsum(d)])
        else:
            raise SystemExit("emit mode needs WGT_BENCH_SRC or "
                             "WGT_BENCH_REF_NPY")
        assert np.array_equal(d, np.diff(offs)), "emit degrees mismatch"
        rng = np.random.default_rng(5)
        sample = (np.arange(g.num_nodes) if g.num_nodes <= 400_000 else
                  rng.integers(0, g.num_nodes, 100_000))
        for x in sample:
            got = F[stn[x] + np.arange(d[x]) * Gn].astype(np.uint32)
            if not np.array_equal(got, ref[offs[x]:offs[x + 1]]):
                raise SystemExit(f"emit NOT bit-exact at node {x}")

        pl_emit = dec._plans.get(("emit", L), {})
        print(json.dumps({"mode": "emit-plan",
                          "T": pl_emit.get("T"),
                          "cap": pl_emit.get("cap"),
                          "nch": (int(pl_emit["init"].shape[0])
                                  if pl_emit.get("init") is not None
                                  else None),
                          "broken": bool(pl_emit.get("emit_broken",
                                                     False))}),
              file=sys.stderr, flush=True)

        def run():
            # no slicing: the steady state must stay ONE fused dispatch
            s2d, st, dgs = dec.decode_to_adjacency_device(num_lanes=L)
            return dgs
    elif mode == "emitk":
        # merged-emit kernel alone (plan warmed via the full pipeline)
        s2d, st, dgs = dec.decode_to_adjacency_device(num_lanes=L)
        jax.block_until_ready(s2d)
        s2d, st, dgs = dec.decode_to_adjacency_device(num_lanes=L)
        jax.block_until_ready(s2d)
        run = lambda: dec.decode_emit_raw(L, check=False)[0][:1]
    elif mode in ("pallas", "xla"):
        if mode == "xla":
            os.environ["WGT_PALLAS"] = "0"
        run = lambda: dec.decode_raw(L, cap, check=False)[1][:1]
    elif mode == "e2e":
        # steady-state reconstruction needs the meta vector for static
        # shapes; the parent passes it (it verified bit-exactness itself)
        from webgraph_ans_tpu.ops.reconstruct_device import (
            _quant, parse_and_assemble_auto as parse_and_assemble)
        meta = np.array(json.loads(os.environ["WGT_BENCH_META"]), np.int32)
        total_cop, max_depth = int(meta[2]), int(meta[3])
        hist_key = (tuple(int(c) for c in meta[4:4 + max_depth + 1][1:])
                    if total_cop and max_depth > 0 else ())
        n, E = g.num_nodes, int(g.num_arcs)
        mi = g.prelude.min_interval_length
        cap = int(os.environ.get("WGT_BENCH_CAP_AUX", cap))

        def run():
            out, _, _ = dec.decode_raw(L, cap, check=False, emit_aux=True)
            offsets, F, meta_d = parse_and_assemble(
                out, n, cap, mi, _quant(E + 1), _quant(total_cop),
                hist_key, depth_iters=max(max_depth, 1))
            # block on DATA-DEPENDENT outputs: offsets[:1] is the
            # constant 0, which XLA folds — waiting on it returns before
            # the program finishes (measured 0.5 ms/rep "e2e")
            return offsets[-1:], F[-8:]
    elif mode == "ondemand":
        # on-demand batch random access: every rep decodes the queried
        # lists from the COMPRESSED artifacts (no cross-batch cache) —
        # the honest counterpart of the reference's 10M-query protocol,
        # reported alongside the serve-mode number (which gathers from
        # a pre-decoded CSR). Results are DEVICE-resident (the
        # TPU-native serving contract: the next kernel consumes them in
        # HBM); each rep is drained by fetching the duplicate-weighted
        # arc total, a scalar data-dependent on the whole pipeline.
        # Host materialization (successors_batch) is a separate API and
        # pays the host link (~13 MB/s through the axon relay; PCIe on
        # a directly-attached TPU).
        from webgraph_ans_tpu.ops.random_tpu import (TpuEmitRandomAccess,
                                                     TpuRandomAccess)

        B = int(os.environ.get("WGT_BENCH_ONDEMAND_BATCH", "262144"))
        try:
            ra = TpuEmitRandomAccess(dec)
        except ValueError:
            ra = TpuRandomAccess(dec)
        if not hasattr(ra, "successors_batch_device"):
            # wave-decode path (block/sampled artifacts): host protocol
            rng = np.random.default_rng(1)
            batches = [rng.integers(0, g.num_nodes, size=B)
                       for _ in range(reps + 2)]
            ra.successors_batch(batches[0])
            ra.successors_batch(batches[1])
            ts, arcs_b = [], []
            for i in range(reps):
                t0 = time.time()
                got = ra.successors_batch(batches[2 + i])
                ts.append(time.time() - t0)
                arcs_b.append(got.num_arcs)
            sec = float(np.median(ts))
            per_arc = sec / max(float(np.mean(arcs_b)), 1) * 1e9
            print(json.dumps({"mode": mode, "reps": reps,
                              "sec_per_rep": sec, "queries_per_rep": B,
                              "arcs_per_rep": float(np.mean(arcs_b)),
                              "ns_per_arc": per_arc}))
            return
        import jax.numpy as jnp

        # queries are generated ON DEVICE (they normally come from a
        # previous kernel in a TPU serving stack; host-held queries pay
        # one upload — PCIe on real hardware, the relay here)
        keys = [jax.random.PRNGKey(i) for i in range(reps + 2)]

        def make_q(i):
            return jax.random.randint(keys[i], (B,), 0, g.num_nodes,
                                      dtype=jnp.int32)

        # warmup includes a host-side correctness check of one batch
        # against the native decoder on a query sample
        q0 = make_q(0)
        outv, offs, tot = ra.successors_batch_device(q0)
        jax.block_until_ready(outv)
        q0_h = np.asarray(q0).astype(np.int64)
        offs_h = np.asarray(offs).astype(np.int64)
        pool = np.asarray(outv).astype(np.uint32)
        sample = np.random.default_rng(2).integers(0, B, 256)
        nat = g.successors_batch(q0_h[sample].astype(np.uint64))
        no = nat.offsets.astype(np.int64)
        for j, si in enumerate(sample):
            got_l = pool[offs_h[si]:offs_h[si + 1]]
            want = nat.succs[no[j]:no[j + 1]]
            assert np.array_equal(got_l, want), f"ondemand mismatch {si}"
        int(ra.successors_batch_device(make_q(1))[2])
        ts, arcs_b = [], []
        for i in range(reps):
            t0 = time.time()
            outv, offs, tot = ra.successors_batch_device(make_q(2 + i))
            arcs = int(tot)         # drains the pipeline (one sync)
            ts.append(time.time() - t0)
            arcs_b.append(arcs)
        sec = float(np.median(ts))
        per_arc = sec / max(float(np.mean(arcs_b)), 1) * 1e9
        print(json.dumps({"mode": mode, "reps": reps, "sec_per_rep": sec,
                          "queries_per_rep": B,
                          "arcs_per_rep": float(np.mean(arcs_b)),
                          "ns_per_arc": per_arc}))
        return
    elif mode == "serve":
        # random-access serving: device CSR built once (reported by the
        # e2e metric), then each rep gathers 2^20 random rows
        from webgraph_ans_tpu.ops.random_tpu import TpuCsrServer, gather_rows
        from webgraph_ans_tpu.ops.reconstruct_device import _quant
        srv = TpuCsrServer(dec, num_lanes=L)
        B = 1 << 20
        out_cap = _quant(int(B * (arcs / g.num_nodes) * 1.3))
        keys = [jax.random.PRNGKey(i) for i in range(reps + 2)]

        def run(i=[0]):
            q = jax.random.randint(keys[i[0] % len(keys)], (B,), 0,
                                   g.num_nodes, dtype=jnp.int32)
            i[0] += 1
            o, off, tot = gather_rows(srv.offsets, srv.succs, q, out_cap)
            return tot

        jax.block_until_ready(run())
        jax.block_until_ready(run())
        ts, tots = [], []
        for _ in range(reps):
            t0 = time.time()
            tot = run()
            jax.block_until_ready(tot)
            ts.append(time.time() - t0)
            tots.append(int(tot))
        assert max(tots) <= out_cap
        sec = float(np.median(ts))
        per_arc = sec / float(np.mean(tots)) * 1e9
        print(json.dumps({"mode": mode, "reps": reps, "sec_per_rep": sec,
                          "queries_per_rep": B, "arcs_per_rep":
                          float(np.mean(tots)), "ns_per_arc": per_arc}))
        return
    elif mode == "encode":
        import pickle

        from webgraph_ans_tpu.ops.encode_jax import (encode_blocks,
                                                     encode_blocks_auto,
                                                     encode_plan)
        if os.environ.get("WGT_BENCH_TOK_NPY"):
            # pre-dumped token stream (large synthetic fixtures without
            # a .graph input); exercises the chunked-slab encode kernel
            # at HBM scale
            tdir = os.environ["WGT_BENCH_TOK_NPY"]
            vals = np.load(os.path.join(tdir, "tok_vals.npy"))
            comps = np.load(os.path.join(tdir, "tok_comps.npy"))
        else:
            from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
            from webgraph_ans_tpu.bvgraph.store import dump_tokens
            adj, _ = load_bvgraph(os.environ["WGT_BENCH_SRC"])
            with open(os.environ["WGT_BENCH_EST"], "rb") as f:
                est_tables = pickle.load(f)
            vals, comps = dump_tokens(adj, g.prelude.compression_window,
                                      3, g.prelude.min_interval_length,
                                      est_tables)
        eplan = encode_plan(g.prelude.model, vals, comps, num_blocks=L)
        (eparams, etables, tokens_d, tstart_d, tend_d, ecap, tstart, tend,
         _bn, tab_np) = eplan
        if os.environ.get("WGT_BENCH_ENC_VERIFY") == "1":
            # word-identity against the NATIVE serial encoder
            # (reference semantics, native/src/ans.hpp) on a lane sample
            # spanning every Pallas chunk: each sampled lane's emitted
            # words are assembled from the fetched emit columns and must
            # equal the native encode of the same reversed token range.
            # (Full-lane word-identity vs the XLA kernel is covered at
            # small scale by tests/test_pallas_kernels.py.)
            from webgraph_ans_tpu.ans.codec import encode_raw
            from webgraph_ans_tpu.ops.encode_jax import _emit_pairs

            ep_, sp_, fp_, wp_, okp = encode_blocks_auto(
                eparams, etables, tokens_d, tstart_d, tend_d, ecap,
                tstart, tend, tab_np)
            assert bool(np.asarray(okp).all()), "pallas encode overflow"
            Lr = len(tstart)
            sel = np.arange(0, Lr, max(1, Lr // 64))
            EPv = _emit_pairs(eparams[9])
            cols = np.asarray(ep_[:, jnp.asarray(sel.astype(np.int32))])
            meta_s = cols[ecap * EPv:]
            fps = np.asarray(fp_[jnp.asarray(sel.astype(np.int32))])
            for j, l in enumerate(sel):
                a, b = int(tstart[l]), int(tend[l])
                steps = b - a
                nem = (meta_s[:steps, j] & 0xFF).astype(np.int64)
                words = []
                for s in range(steps):
                    for w in range(int(nem[s])):
                        pair = cols[s * EPv + w // 2, j]
                        words.append((pair >> (16 * (w & 1))) & 0xFFFF)
                nat = encode_raw(g.prelude.model, vals[a:b][::-1],
                                 comps[a:b][::-1])
                assert np.array_equal(
                    np.array(words, np.uint16), nat.stream), \
                    f"lane {l}: stream words differ from native encode"
                assert int(fps[j]) == int(nat.final_state), \
                    f"lane {l}: final state differs"
        run = lambda: encode_blocks_auto(
            eparams, etables, tokens_d, tstart_d, tend_d, ecap, tstart,
            tend, tab_np)[3][:1]
    else:
        raise SystemExit(f"unknown mode {mode}")

    jax.block_until_ready(run())      # compile + warm
    jax.block_until_ready(run())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run())
        ts.append(time.time() - t0)
    sec = float(np.median(ts))
    print(json.dumps({"mode": mode, "reps": reps, "sec_per_rep": sec,
                      "ns_per_arc": sec / arcs * 1e9}))


if __name__ == "__main__":
    main()

"""Stage timing of the merged-emit post-pass on a real artifact.

Usage: probe_post_stages.py BASE [lanes]
Times (fresh process, median of reps, block_until_ready):
  kernel   decode_emit_pallas alone
  unpack   unpack_nib
  rank     _cumsum_tok(is_elem)
  scatter  the P-scale marker scatter
  extract  extract_node_tables (all of pass 1)
  fixup    fixup_dirty_compact
  post     _post_fused
  fused    _emit_e2e_fused (kernel + post, one program)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    base = sys.argv[1]
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WGT_JAX_CACHE", "/tmp/wgt_jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
    from webgraph_ans_tpu.ops import emit_post
    from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
    from webgraph_ans_tpu.ops.reconstruct_device import _cumsum_tok

    np.asarray(jnp.zeros(1))          # pin eager-sync relay mode

    g = ANSBvGraph.load(base)
    dec = TpuGraphDecoder(g)
    n = dec.num_nodes

    # drive to steady state (plan + rebalance + verified)
    for _ in range(3):
        s2d, st, dg = dec.decode_to_adjacency_device(num_lanes=L)
    jax.block_until_ready(s2d)
    pl = dec._plans[("emit", L)]
    mc = pl["post_meta"]
    val, xch, nib, cap = dec.decode_emit_raw(L, check=False)
    jax.block_until_ready(val)
    S, G = val.shape
    print(f"cap={cap} G={G} T={pl.get('T')} Dall={mc['Dall']} "
          f"rounds={mc['rounds']} ndirty={len(mc['order_np'])} "
          f"P={S*G/1e6:.1f}M", file=sys.stderr)

    lane_of = mc["lane_of_d"]

    def timeit(name, fn):
        jax.block_until_ready(fn())
        jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn())
            ts.append(time.time() - t0)
        print(f"{name:8s} {float(np.median(ts))*1e3:8.2f} ms")

    timeit("kernel", lambda: dec.decode_emit_raw(L, check=False)[0])

    unpack_j = jax.jit(functools.partial(emit_post.unpack_nib, S=S))
    timeit("unpack", lambda: unpack_j(nib))
    codes = unpack_j(nib)
    is_elem = jax.jit(lambda c: (c == 0) | (c == 1) | (c == 4))(codes)
    jax.block_until_ready(is_elem)

    rank_j = jax.jit(lambda m: _cumsum_tok(m.astype(jnp.int32)))
    timeit("rank", lambda: rank_j(is_elem))

    @jax.jit
    def scat(codes, xch):
        is_refinfo = ((codes == 3) | (codes == 7) | (codes == 8)
                      | (codes == 9))
        is_marker = (codes == 1) | is_refinfo | (codes == 5)
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, G), 0)
        idx = jnp.where(is_marker,
                        jax.lax.bitcast_convert_type(xch, jnp.int32), n)
        packed = (rows << 6)
        return jnp.zeros(n + 1, jnp.int32).at[idx.reshape(-1)].set(
            packed.reshape(-1), mode="drop")
    timeit("scatter", lambda: scat(codes, xch))

    ext_j = jax.jit(functools.partial(emit_post.extract_node_tables, n=n))
    timeit("extract", lambda: ext_j(val, xch, nib, lane_of))
    tabs = ext_j(val, xch, nib, lane_of)
    jax.block_until_ready(tabs["deg"])

    fix_j = jax.jit(functools.partial(
        emit_post.fixup_dirty_compact, roffs=mc["roffs"], Dall=mc["Dall"]))
    timeit("fixup", lambda: fix_j(val, nib, tabs["start_el"],
                                  tabs["deg"], tabs["span"], lane_of,
                                  mc["order_d"], mc["cpos_d"],
                                  mc["pdirty_d"], mc["parent_d"]))

    timeit("post", lambda: emit_post._post_fused(
        val, xch, nib, lane_of, mc["order_d"], mc["cpos_d"],
        mc["pdirty_d"], mc["parent_d"], n, mc["roffs"], mc["Dall"])[0])

    # steady-state post alone (on mark_deg channels)
    val2, xch2, nib2, _rows, _ok, _diag = __import__(
        "webgraph_ans_tpu.ops.emit_pallas",
        fromlist=["decode_emit_pallas"]).decode_emit_pallas(
        dec.params, pl["lut"], pl["slab"], pl["init"], dec.window,
        dec.min_interval, pl["cap"], T=pl.get("T"), mark_deg=True)
    Lr = len(pl["starts_np"])
    val2, xch2, nib2 = val2[:, :Lr], xch2[:, :Lr], nib2[:, :Lr]
    jax.block_until_ready(val2)
    timeit("steady", lambda: emit_post.post_steady(
        val2, xch2, lane_of, mc["mrow_d"], mc["kind_d"],
        mc["starts_flat_d"], mc["fx_rowf"], mc["fx_valid"],
        mc["fx_ispl"], mc["fx_pd"], mc["fx_elmask"], mc["fx_srcF"],
        mc["fx_srcC"], mc["fx_sortn"], mc["fx_dst"], mc["fx_destF"],
        mc["fx_offs"], mc["Dall"])[0])

    timeit("fused", lambda: dec.decode_to_adjacency_device(L)[0])


if __name__ == "__main__":
    main()

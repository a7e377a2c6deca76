"""Multi-chip / multi-host scale-out (jax.sharding.Mesh + shard_map).

The reference is single-threaded and single-machine (SURVEY.md section 2.3);
scale-out is a new capability of this framework. The parallel decomposition:

- decode: node-range blocks are independent entry points (the phase table),
  so lanes shard over a 'blocks' mesh axis (data parallel). Decoder LUTs and
  the u16 stream are replicated (broadcast over ICI once); every device runs
  the same lane-parallel FSM kernel on its shard, and results are gathered
  in node order.
- model building: the pass-1/2 symbol streams shard over the same axis
  ('sequence' parallelism over the token stream); per-device partial
  histograms are summed with psum, after which the (fidelity, radix) grid
  search runs replicated (it is tiny next to the histogram pass).

On a real pod slice the 'blocks' axis spans all chips over ICI; the same
code runs on an N-virtual-device CPU mesh for tests and dry runs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.decode_jax import (DecoderTables, decode_blocks, round_cap,
                              seed_rings)


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_decode_blocks(mesh: Mesh, params, tables: DecoderTables,
                          states, ptrs, starts, ends, ring,
                          window: int, min_interval: int, cap: int):
    """decode_blocks with the lane dimension sharded over the mesh's
    'blocks' axis; the decode buffer replicated (one ICI broadcast).
    Returns lane-sharded outputs."""
    axis = mesh.axis_names[0]
    rep = P()
    lane = P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, lane, lane, lane, lane, lane),
        out_specs=(P(None, axis), lane, lane),
        check_vma=False)
    def run(tables_, states_, ptrs_, starts_, ends_, ring_):
        return decode_blocks(params, tables_, states_, ptrs_,
                             starts_, ends_, ring_, window, min_interval, cap)

    return run(tables, states, ptrs, starts, ends, ring)


def sharded_seed_rings(mesh: Mesh, params, tables: DecoderTables,
                       seed_states, seed_ptrs, starts, window: int):
    axis = mesh.axis_names[0]
    rep = P()
    lane = P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, lane, lane, lane),
        out_specs=lane,
        check_vma=False)
    def run(tables_, ss, sp, st):
        return seed_rings(params, tables_, ss, sp, st, window)

    return run(tables, seed_states, seed_ptrs, starts)


def sharded_histogram(mesh: Mesh, symbols, components, num_bins: int):
    """Per-component histogram of a sharded (symbol, component) stream:
    local scatter-add + psum over the mesh axis (the TPU analog of the
    pass-1/2 histogram sink, reference:
    src/ans/model4encoder_builder.rs:67-78). Symbols above num_bins-1 are
    clipped into the top bin (callers histogram folded symbols, which are
    bounded). Returns a replicated [9, num_bins] count matrix."""
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False)
    def run(sym, comp):
        flat = comp.astype(jnp.int32) * num_bins + jnp.clip(
            sym.astype(jnp.int32), 0, num_bins - 1)
        local = jnp.zeros((9 * num_bins,), jnp.int32).at[flat].add(1)
        return jax.lax.psum(local.reshape(9, num_bins), axis)

    return run(symbols, components)


def sharded_emit_adjacency(mesh: Mesh, dec, num_lanes: int = 2048,
                           interpret: bool = False):
    """The MERGED-EMIT pipeline with the kernel's chunk axis sharded
    over the mesh's 'blocks' axis: each device runs decode_emit_pallas
    on its own chunks (its slab shard + register-file shard; the LUT is
    replicated — one ICI broadcast), and the channel outputs concatenate
    back into the exact single-chip lane layout, so the post-pass
    (emit_post.postprocess) runs unchanged on the gathered channels
    (GSPMD places it). Returns (succs2d, starts_flat, degs) in the
    decode_to_adjacency_device contract, bit-exact vs the single-chip
    path.

    `dec` is a TpuGraphDecoder; the plan forces the chunk count to a
    multiple of the mesh size so chunks shard evenly."""
    import os

    from ..ops import emit_post
    from ..ops.decode_jax import UNROLL
    from ..ops.emit_pallas import decode_emit_pallas

    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    pl = dec._emit_plan(num_lanes, chunk_multiple=ndev)
    if pl.get("init") is None:
        raise RuntimeError("sharded emit plan infeasible (VMEM budget)")
    cap = pl["cap"]
    T = pl.get("T", dec.EMIT_RING_T)
    interp = interpret or os.environ.get("WGT_PALLAS") == "interpret"
    params, window, mi = dec.params, dec.window, dec.min_interval

    while True:
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(None, axis), P(None, axis), P(None, axis),
                       P(axis), P(axis), P(None, axis)),
            check_vma=False)
        def run(lut_, slab_, init_):
            return decode_emit_pallas(params, lut_, slab_, init_, window,
                                      mi, cap, T=T, interpret=interp)

        val, xch, nib, rows, ok, diag = run(pl["lut"], pl["slab"],
                                            pl["init"])
        L = len(pl["starts_np"])
        if bool(np.all(np.asarray(ok[:L]))):
            pl["cap"] = cap
            break
        cap = -(-cap * 2 // UNROLL) * UNROLL

    val, xch, nib = val[:, :L], xch[:, :L], nib[:, :L]
    n = dec.num_nodes
    if "lane_of" not in pl:
        lane_of = np.zeros(n, np.int32)
        for li in range(L):
            lane_of[pl["starts_np"][li]:pl["ends_np"][li]] = li
        pl["lane_of"] = lane_of
    mc = pl.setdefault("post_meta", {})
    succs2d, starts_flat, degs, _tabs = emit_post.postprocess(
        val, xch, nib, pl["lane_of"], pl["starts_np"], n, meta_cache=mc)
    return succs2d, starts_flat, degs


class ShardedGraphDecoder:
    """Mesh-parallel variant of TpuGraphDecoder: lanes spread across all
    devices of the mesh, tables/stream replicated."""

    def __init__(self, graph, mesh: Mesh | None = None):
        from ..ops.graph_decode import TpuGraphDecoder

        self.single = TpuGraphDecoder(graph)
        self.mesh = mesh if mesh is not None else make_mesh()

    def decode_tokens(self, lanes_per_device: int = 32, cap: int | None = None):
        s = self.single
        n_dev = self.mesh.devices.size
        num_lanes = lanes_per_device * n_dev
        # pad_to keeps the lane count divisible by the mesh even after
        # encode-block boundaries are unioned in (padded lanes are empty)
        starts, ends = s._block_bounds(num_lanes, pad_to=n_dev)
        W = s.window
        host_states = np.asarray(s.states)
        host_ptrs = np.asarray(s.pointers)
        safe = np.minimum(starts, s.num_nodes - 1)

        if W > 0:
            pre = starts[:, None] - W + np.arange(W)[None, :]
            pre_cl = np.clip(pre, 0, s.num_nodes - 1)
            ring = sharded_seed_rings(
                self.mesh, s.params, s.tables,
                jnp.asarray(host_states[pre_cl]),
                jnp.asarray(host_ptrs[pre_cl]),
                jnp.asarray(starts), W)
        else:
            ring = jnp.zeros((len(starts), 1), jnp.int32)

        if cap is None:
            est = (2 * s.num_arcs + 3 * s.num_nodes) // max(len(starts), 1)
            cap = max(64, int(est * 1.3))
        cap = round_cap(s.params, cap)
        from ..ops.decode_jax import fetch_block_tokens
        while True:
            out, counts, ok = sharded_decode_blocks(
                self.mesh, s.params, s.tables,
                jnp.asarray(host_states[safe]),
                jnp.asarray(host_ptrs[safe]),
                jnp.asarray(starts), jnp.asarray(ends), ring,
                W, s.min_interval, cap)
            if bool(np.all(np.asarray(ok))):
                break
            cap *= 2
        return fetch_block_tokens(out, counts, cap)

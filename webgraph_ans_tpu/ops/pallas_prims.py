"""Mosaic-safe gather/select primitives for the Pallas decode kernel.

TPU Mosaic (v5e, 2026-08 toolchain) supports exactly two dynamic-gather
forms inside kernels: `take_along_axis(x, idx, axis=1)` (lane gather,
any height) and `take_along_axis(x, idx, axis=0)` with x of at most 8
sublanes (one vreg of sublanes). Cross-layout reshapes such as
[A,128] -> [G,1] crash the compiler when combined with gathers
(tools/exp_pallas_bisect*.py), so every primitive here stays in the
natural [rows, 128*k] tiling and composes gathers with where-trees:

- `tree_select_rows8`: pick the [8, W] sublane-group `gidx` (per-lane)
  out of a [NG*8, W] table via a log2(NG) where-tree — the dynamic
  "row-block" select that replaces unsupported tall sublane gathers.
- `gather8`: per-lane element from an [8, W] group (native sublane
  gather).
- `lut_gather`: arbitrary-height per-lane table lookup via the
  role-reversal trick: lane-gather the per-lane column FIRST
  (collapsing the lane dim), then tree_select_rows8 + gather8 over the
  height. No transposes.

All index vectors are [1, W] int32 rows (one vreg row per 128 lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bit(idx, b):
    """[1, W] bool mask of bit b of idx."""
    return (idx >> b) & 1 == 1


def tree_select_rows8(table, gidx, ngroups: int):
    """Selects, per lane, the 8-sublane group `gidx[0, c]` from
    `table` [NG*8, W]: returns [8, W] with column c = table rows
    gidx[0,c]*8 .. +8 at column c. NG is padded to a power of two with
    repeats of group 0 (callers guarantee gidx < ngroups)."""
    W = table.shape[1]
    nodes = [table[k * 8:(k + 1) * 8, :] for k in range(ngroups)]
    return _tree(nodes, gidx, (8, W))


def _tree(nodes, idx, shape):
    """where-tree select of nodes[idx] (idx < len(nodes)); pads to a
    power of two with the last node and collapses degenerate pairs, so
    non-pow2 counts cost only ~n wheres."""
    nodes = list(nodes)
    n = 1
    while n < len(nodes):
        n *= 2
    nodes = nodes + [nodes[-1]] * (n - len(nodes))
    b = 0
    while len(nodes) > 1:
        mask = None
        nxt = []
        for k in range(len(nodes) // 2):
            lo, hi = nodes[2 * k], nodes[2 * k + 1]
            if lo is hi:
                nxt.append(lo)
                continue
            if mask is None:
                mask = jnp.broadcast_to((idx >> b) & 1 == 1, shape)
            nxt.append(jnp.where(mask, hi, lo))
        nodes = nxt
        b += 1
    return nodes[0]


def gather8(group, sidx):
    """Per-lane sublane pick: group [8, W], sidx [1, W] in [0, 8) ->
    [1, W] with column c = group[sidx[0,c], c]."""
    W = group.shape[1]
    idx = jnp.broadcast_to(sidx & 7, (8, W))
    return jnp.take_along_axis(group, idx, axis=0)[0:1, :]


def dyn_row(table, idx, nrows: int):
    """Per-lane row pick from a [nrows_padded8, W] table: idx [1, W] in
    [0, nrows) -> [1, W]. tree-select the 8-row group, then sublane
    gather within it."""
    ng = -(-nrows // 8)
    grp = tree_select_rows8(table, idx >> 3, ng)
    return gather8(grp, idx)


def lut_gather(lut, idx, nrows: int):
    """Arbitrary-height per-lane table lookup. lut [H, 128*k] stores k
    parallel tables (banks): flat slot s of bank b lives at
    lut[s >> 7, 128*b + (s & 127)]. idx [1, 128] gives each lane's slot
    (< nrows*128, nrows <= H); returns [1, 128*k] with column
    128*b + c = bank b's value at slot idx[0, c].

    Role-reversal gather (no transpose): stage 1 lane-gathers column
    (idx & 127) within each bank — collapsing the lane dim so column c
    holds ALL rows of lane c's slot column — then stage 2 picks row
    (idx >> 7) via tree_select_rows8 + gather8 over the height."""
    H, W = lut.shape
    r = idx & 127
    q = idx >> 7
    # tpu.dynamic_gather needs a SINGLE source vreg along the gather
    # dimension: lane-gather each 128-lane bank separately.
    rb = jnp.broadcast_to(r, (H, 128))
    gas = [jnp.take_along_axis(lut[:, b * 128:(b + 1) * 128], rb, axis=1)
           for b in range(W // 128)]
    ga = gas[0] if len(gas) == 1 else jnp.concatenate(gas, axis=1)
    if W > 128:
        q = jnp.concatenate([q] * (W // 128), axis=1)
    return dyn_row(ga, q, nrows)


def select_tree(parts, idx):
    """N-way select among `parts` (same shape each) by idx (same or
    broadcastable shape) in [0, len(parts)): a where-tree (lax.select_n
    is not lowered by Mosaic)."""
    return _tree(parts, idx, parts[0].shape)

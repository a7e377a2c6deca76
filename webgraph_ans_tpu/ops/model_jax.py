"""TPU model construction: the (fidelity, radix) x frame-size grid search
over folded symbol distributions, vectorized over all candidates at once.

The reference runs the search serially per component (reference:
src/ans/model4encoder_builder.rs:80-271, the CPU-heavy part of compression).
Here every (params, frame) candidate becomes a lane: symbol folding is a
vectorized scatter-add, the exact frequency-rescaling recurrence
(reference: src/utils/data_utils.rs:15-39) runs as ONE lax.scan over sorted
symbols with all candidate lanes advancing in lockstep, and the approximate
folded-distribution cost (reference: builder.rs:297-327) accumulates inside
the same scan. Only the reference's tiny acceptance logic (builder.rs:
165-206) stays on the host, replicated exactly so the selected model — and
hence the compressed sizes — are identical to the serial builder's.

float64 is required for bit-identical rescaling; this module enables x64
locally for its computations.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ans.model import (
    ANSModel, ComponentModel, Histogram, MAXIMUM_FRAME_SIZE, MAX_RAW_SYMBOL,
    NUM_COMPONENTS, PARAMS_COMBINATIONS, THETA, fold_one, fold_symbols,
    _component_entropy,
)


def _fold_all_combos(syms: np.ndarray, counts: np.ndarray):
    """Folded histograms for every (fidelity, radix) combo: returns
    (folded [C, MAXB] int64, biggest [C] int64)."""
    C = len(PARAMS_COMBINATIONS)
    folded_idx = np.empty((C, len(syms)), dtype=np.int64)
    for ci, (f, r) in enumerate(PARAMS_COMBINATIONS):
        thr = 1 << (f + r - 1)
        below = syms < thr
        fi = np.empty(len(syms), dtype=np.int64)
        fi[below] = syms[below].astype(np.int64)
        if (~below).any():
            fi[~below] = fold_symbols(syms[~below], r, f)
        folded_idx[ci] = fi
    biggest = folded_idx.max(axis=1)
    maxb = int(biggest.max()) + 1
    folded = np.zeros((C, maxb), dtype=np.int64)
    for ci in range(C):
        np.add.at(folded[ci], folded_idx[ci], counts.astype(np.int64))
    return folded, biggest


def build_model_jax(histograms: list[Histogram],
                    max_frame_log2: int = 16) -> ANSModel:
    """Drop-in replacement for ans.model.build_model producing the identical
    model, with the heavy per-candidate scaling/cost sweep on the device."""
    with jax.enable_x64(True):
        return _build_model_jax_x64(histograms, max_frame_log2)


def _build_model_jax_x64(histograms: list[Histogram],
                         max_frame_log2: int = 16) -> ANSModel:
    original_costs = []
    totals = []
    for syms, counts in histograms:
        total = int(counts.sum()) if len(counts) else 0
        totals.append(total)
        original_costs.append(_component_entropy(counts, total) if total else 0.0)
    original_graph_cost = float(sum(original_costs))

    C = len(PARAMS_COMBINATIONS)
    frame_exps = np.arange(0, max_frame_log2 + 1)
    max_frame = 1 << max_frame_log2
    components: list[ComponentModel] = []

    for comp in range(NUM_COMPONENTS):
        syms, counts = histograms[comp]
        if len(syms) == 0:
            components.append(ComponentModel(np.zeros(0, dtype=np.uint16), 0, 2, 2))
            continue
        syms = syms.astype(np.uint64)
        counts = counts.astype(np.uint64)
        total = totals[comp]

        folded, biggest = _fold_all_combos(syms, counts)  # [C, MAXB]
        D = folded.shape[1]

        # sort order per combo: ascending frequency, ties by symbol index
        # (zero-frequency symbols forced last)
        nnz = (folded > 0).sum(axis=1).astype(np.int64)  # [C]
        sort_key = np.where(folded > 0, folded, np.iinfo(np.int64).max)
        order = np.argsort(sort_key, axis=1, kind="stable")  # [C, D]

        # fold-cost bits per (combo, symbol): folds(sym) * radix
        fold_bits = np.zeros((C, D), dtype=np.float64)
        sym_idx = np.arange(D)
        for ci, (f, r) in enumerate(PARAMS_COMBINATIONS):
            thr = 1 << (f + r - 1)
            off = ((1 << r) - 1) * (1 << (f - 1))
            folds = np.where(sym_idx < thr, 0, (sym_idx - thr) // off + 1)
            fold_bits[ci] = folds * r
        fold_bits_sorted = np.take_along_axis(fold_bits, order, axis=1)

        # candidate lanes = (combo, frame) pairs with m >= next_pow2(nnz)
        m0_exp = np.where(nnz > 1,
                          np.ceil(np.log2(np.maximum(nnz, 1))).astype(np.int64),
                          0)
        combo_l, exp_l = np.meshgrid(np.arange(C), frame_exps, indexing="ij")
        combo_l = combo_l.ravel()
        exp_l = exp_l.ravel()
        keep = exp_l >= m0_exp[combo_l]
        combo_l, exp_l = combo_l[keep], exp_l[keep]
        L = len(combo_l)
        m_l = (1 << exp_l.astype(np.int64))

        ok, cost, approx = _scan_lanes(
            jnp.asarray(folded[combo_l]),
            jnp.asarray(order[combo_l]),
            jnp.asarray(nnz[combo_l]),
            jnp.asarray(m_l),
            jnp.asarray(fold_bits_sorted[combo_l]),
            total,
        )
        ok = np.asarray(ok)
        cost = np.asarray(cost)

        # ---- exact reference acceptance logic (builder.rs:140-206) ----
        lane_of = {(int(c), int(e)): i for i, (c, e) in enumerate(zip(combo_l, exp_l))}
        best = None
        best_frame = None
        lowest_cost = math.inf
        for ci in range(C):
            for e in range(int(m0_exp[ci]), max_frame_log2 + 1):
                if (ci, e) not in lane_of:
                    break  # this combo needs a frame beyond the cap
                li = lane_of[(ci, e)]
                if not ok[li]:
                    continue
                m = 1 << e
                new_cost = cost[li]
                difference = new_cost - original_costs[comp]
                if original_graph_cost != 0.0:
                    ratio = (original_graph_cost + difference) / original_graph_cost
                else:
                    ratio = 1.0 if difference <= 0.0 else math.inf
                if ratio <= THETA:
                    if best_frame is None or m < best_frame:
                        lowest_cost = new_cost
                        best = li
                        best_frame = m
                elif m == max_frame:
                    if new_cost >= lowest_cost:
                        break
                    lowest_cost = new_cost
                    best = li
                    best_frame = m
                    break

        assert best is not None, (
            f"component {comp}: no foldable distribution fits a 2^16 frame")
        ci = int(combo_l[best])
        fidelity, radix = PARAMS_COMBINATIONS[ci]
        big = int(biggest[ci])
        # approx is aligned with the sort order; scatter back to symbol index
        dist = np.zeros(D, dtype=np.int64)
        dist[order[ci]] = np.asarray(approx[best])
        components.append(ComponentModel(
            dist[: big + 1].astype(np.uint16),
            int(exp_l[best]), radix, fidelity))

    return ANSModel(components)


@jax.jit
def _scan_lanes(folded_j, order_j, nnz_j, m_j, fold_bits_sorted, total):
    """[L]-lane lockstep scale_freqs + cost scan (see module docstring)."""
    L, D = folded_j.shape
    lanes = jnp.arange(L)
    f_sorted = folded_j[lanes[:, None], order_j]

    ratio = m_j.astype(jnp.float64) / total.astype(jnp.float64)
    n_f = nnz_j.astype(jnp.float64)

    def step(carry, xs):
        new_m, m_rem, ok, cost, i = carry
        f, fb = xs
        valid = i < nnz_j
        second_ratio = new_m.astype(jnp.float64) / m_rem.astype(jnp.float64)
        scale = ((n_f - i.astype(jnp.float64)) * ratio / n_f
                 + i.astype(jnp.float64) * second_ratio / n_f)
        approx_f = jnp.floor(0.5 + scale * f.astype(jnp.float64))
        approx = jnp.where(approx_f < 1.0, 1, approx_f.astype(jnp.int64))
        approx = jnp.where(valid, approx, 0)
        new_m = new_m - approx
        m_rem = jnp.where(valid, m_rem - f, m_rem)
        ok = ok & (new_m >= 0)
        p = approx.astype(jnp.float64) / m_j.astype(jnp.float64)
        contrib = jnp.where(
            valid,
            (-jnp.log2(jnp.where(approx > 0, p, 1.0)) + fb)
            * f.astype(jnp.float64), 0.0)
        i = i + 1
        return (new_m, m_rem, ok, cost + contrib, i), approx

    init = (m_j.astype(jnp.int64), jnp.full((L,), 0, jnp.int64) + total,
            jnp.ones((L,), bool), jnp.zeros((L,), jnp.float64),
            jnp.zeros((L,), jnp.int64))
    (new_m, _, ok, cost, _), approx = jax.lax.scan(
        step, init, (f_sorted.T, fold_bits_sorted.T), length=D)
    return ok, cost, jnp.swapaxes(approx, 0, 1)

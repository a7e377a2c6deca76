"""Pallas/Mosaic TPU encode kernel: the lane-parallel rANS encode loop
of encode_blocks (ops/encode_jax.py) as ONE on-chip kernel with
VMEM-resident tables and per-lane token segments.

Why this exists: the XLA while-loop encoder pays per-step op overhead +
HBM row gathers (~250 ms for cnr-2000's 1.9M tokens); this kernel keeps
everything on-chip, mirroring the decode kernel (ops/decode_pallas.py):

- per-lane TOKEN segments: lane l encodes tokens
  [tstart[l], tend[l]) in reverse; the wrapper pre-gathers each lane's
  tokens into a [smax, G] u32 value slab plus a [smax/8, G] packed
  component-nibble slab — the kernel never touches HBM for tokens.
- encode tables packed into two [H, 256] i32 banks
  (freq|cumul<<16, renorm bound) and (reciprocal M, shift), looked up
  with the same role-reversal lut_gather as decode.
- fold count without clz: folds = #{k >= 1 : sym >= 2^(fidelity +
  k*radix - 1)} (max_folds comparisons; Mosaic does not lower clz).
- 1D grid over 8-token step blocks; encoder registers persist across
  grid steps in VMEM scratch; emissions (packed 2-words-per-u32), the
  per-step meta word and the state trace stream out through step-mapped
  output blocks in the SAME layout as encode_blocks, so the host-side
  stream assembly (lane_encode_tokens) is unchanged.

The rANS encode semantics are a 1:1 port of encode_jax.encode_blocks
(reference: src/ans/encoder.rs:39-86; division via reciprocal
multiply-shift as studied in benches/benchmarks/fastdiv.rs) — the two
kernels are interchangeable and tested word-identical
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .encode_jax import LOWER_BOUND, MASK16, _emit_pairs
from .pallas_prims import gather8, lut_gather, tree_select_rows8

B = 16

# Scratch register rows.
(P_STATE, P_CUR, P_WCNT) = range(3)
NPREG = 3


def _pl():
    from jax.experimental import pallas as pl          # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu   # noqa: PLC0415
    return pl, pltpu


def build_pallas_enc_tables(tab_np: np.ndarray):
    """Packs the [entries, 4] u32 encode table into two [H, 256] i32
    banks: tabA = freq|cumul<<16 (bank 0) / renorm upper bound (bank 1),
    tabB = reciprocal magic M / shift. H is padded to a multiple of 8
    sublanes. Returns (tabA, tabB, nrows)."""
    tab = np.asarray(tab_np)
    entries = tab.shape[0]
    nrows = -(-entries // 128)
    h = -(-nrows // 8) * 8
    flat = np.zeros((4, h * 128), np.uint32)
    for c in range(4):
        flat[c, :entries] = tab[:, c]
    tabA = np.zeros((h, 256), np.uint32)
    tabB = np.zeros((h, 256), np.uint32)
    tabA[:, 0:128] = flat[0].reshape(h, 128)
    tabA[:, 128:256] = flat[1].reshape(h, 128)
    tabB[:, 0:128] = flat[2].reshape(h, 128)
    tabB[:, 128:256] = flat[3].reshape(h, 128)
    return (jnp.asarray(tabA.view(np.int32)),
            jnp.asarray(tabB.view(np.int32)), nrows)


# per-chunk slab VMEM budget (value slab + nibble slab, bytes). The
# Pallas pipeline streams one chunk's slabs HBM->VMEM at a time
# (double-buffered), so total token volume is bounded by HBM only —
# the chunking that decode_pallas has had since round 3 (VERDICT r04
# item 5 asked for the encode side).
SLAB_LIMIT = 6 << 20


def plan_token_slabs(tstart: np.ndarray, tend: np.ndarray):
    """Slab geometry: smax = power of two >= the longest lane's token
    count (pow2 keeps the where-trees cheap); lanes split contiguously
    into nch chunks of Gc (a multiple of 128) so one chunk's slabs fit
    the VMEM budget. Returns (smax, gpad, nch); nch = 0 when even a
    128-lane chunk cannot fit (fall back to the XLA kernel)."""
    lens = np.asarray(tend, np.int64) - np.asarray(tstart, np.int64)
    need = int(lens.max()) if len(lens) else 1
    # pow2 while cheap, then multiples of 64: one outlier-fat lane must
    # not double the slab past VMEM (the where-tree handles any
    # multiple-of-8 group count; repeats collapse in _tree)
    smax = 8
    while smax < need and smax < 1024:
        smax *= 2
    if smax < need:
        smax = -(-need // 64) * 64
    L = max(len(lens), 1)
    per_lane = smax * 4 + (smax // 8) * 4
    nch = 0
    for cand in range(1, L // 128 + 2):
        quantum = 128 * cand
        gpad_c = -(-L // quantum) * quantum
        gc = gpad_c // cand
        if per_lane * gc <= SLAB_LIMIT:
            return smax, gpad_c, cand
    return smax, -(-L // 128) * 128, 0


@functools.partial(jax.jit, static_argnames=("smax", "gpad", "nch"))
def build_token_slabs(tokens, tstart, tend, smax: int, gpad: int,
                      nch: int = 1):
    """Gathers each lane's token segment into the kernel slabs:
    vslab[c, j, l] = value of token tstart[c*Gc + l] + j (u32 -> i32
    bitcast), cslab[c, r, l] = components of tokens 8r..8r+7 packed 4
    bits each; lanes split chunk-major into nch groups of Gc."""
    T = tokens.shape[0]
    L = tstart.shape[0]
    gc = gpad // nch
    ts = jnp.zeros(gpad, jnp.int32).at[:L].set(tstart.astype(jnp.int32))
    j = jnp.arange(smax, dtype=jnp.int32)[:, None]
    idx = jnp.clip(ts[None, :] + j, 0, T - 1)
    vals = tokens[idx, 0]
    comps = (tokens[idx, 1] & 0xF).astype(jnp.uint32)
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, :, None]
    cpk = (comps.reshape(smax // 8, 8, gpad) << shifts).sum(
        axis=1, dtype=jnp.uint32)
    vslab = jax.lax.bitcast_convert_type(
        vals.astype(jnp.uint32), jnp.int32).reshape(
        smax, nch, gc).transpose(1, 0, 2)
    cslab = jax.lax.bitcast_convert_type(cpk, jnp.int32).reshape(
        smax // 8, nch, gc).transpose(1, 0, 2)
    return vslab, cslab


def make_enc_init_regs(tstart, tend, nch: int = 1):
    """Initial registers [nch, NPREG, A, 128] i32: state = LOWER_BOUND,
    cur = tokens remaining (cursor counts down; slab row cur-1 is the
    next token), wcnt = 0."""
    lens = (np.asarray(tend, np.int64) - np.asarray(tstart, np.int64))
    L = len(lens)
    quantum = 128 * nch
    gpad = -(-max(L, 1) // quantum) * quantum
    A = gpad // quantum
    regs = np.zeros((NPREG, gpad), np.int32)
    regs[P_STATE, :] = np.int32(LOWER_BOUND)
    regs[P_CUR, :L] = lens.astype(np.int32)
    return np.ascontiguousarray(
        regs.reshape(NPREG, nch, A, 128).transpose(1, 0, 2, 3))


def _per_comp_u32(comp_eq, params, field: int, shape):
    out = jnp.full(shape, np.uint32(params[0][field]), jnp.uint32)
    for c in range(1, 9):
        out = jnp.where(comp_eq[c], np.uint32(params[c][field]), out)
    return out


def _umulhi(a, b):
    """High 32 bits of a*b on u32 vregs (no 64-bit in Mosaic)."""
    a0 = a & MASK16
    a1 = a >> np.uint32(16)
    b0 = b & MASK16
    b1 = b >> np.uint32(16)
    p00 = a0 * b0
    mid = a1 * b0 + (p00 >> np.uint32(16))
    mid2 = a0 * b1 + (mid & MASK16)
    return a1 * b1 + (mid >> np.uint32(16)) + (mid2 >> np.uint32(16))


def _encode_token(params, tabA, tabB, nrows: int, vslab_ref, cslab_ref,
                  state, cur, max_folds: int):
    """One rANS encode step on [A, 128] registers (1:1 port of
    encode_jax.encode_blocks body; reference src/ans/encoder.rs:39-86).
    Returns (state, words list [mf+1] of u32 [A,128], nemit u32,
    comp i32)."""
    A = state.shape[0]
    smax = vslab_ref.shape[1]
    ngrp = smax // 8
    ngrp_c = max(smax // 64, 1)

    active = cur > 0
    idx = jnp.maximum(cur - 1, 0)

    # per-tile token reads: value from the u32 slab, component from the
    # packed nibble slab (row j>>3, nibble j&7)
    vals_t, comps_t = [], []
    for a in range(A):
        ia = idx[a:a + 1, :]
        vtile = vslab_ref[0, :, a * 128:(a + 1) * 128]
        grp = tree_select_rows8(vtile, ia >> 3, ngrp)
        vals_t.append(gather8(grp, ia))
        ctile = cslab_ref[0, :, a * 128:(a + 1) * 128]
        crow = ia >> 3
        cg = tree_select_rows8(ctile, crow >> 3, ngrp_c)
        cw = gather8(cg, crow)
        comps_t.append((cw >> ((ia & 7) * 4)) & 0xF)
    sym_in = jax.lax.bitcast_convert_type(
        jnp.concatenate(vals_t, axis=0), jnp.uint32)
    comp = jnp.concatenate(comps_t, axis=0)
    sym_in = jnp.where(active, sym_in, jnp.uint32(0))
    comp = jnp.where(active, comp, 0)

    comp_eq = {c: comp == c for c in range(1, 9)}
    shape = state.shape
    offset = _per_comp_u32(comp_eq, params, 0, shape)
    log_m = _per_comp_u32(comp_eq, params, 1, shape)
    radix = _per_comp_u32(comp_eq, params, 2, shape)
    fidelity = _per_comp_u32(comp_eq, params, 3, shape)
    fold_off = ((jnp.uint32(1) << radix) - jnp.uint32(1)) * \
        (jnp.uint32(1) << (fidelity - jnp.uint32(1)))
    radix_mask = (jnp.uint32(1) << radix) - jnp.uint32(1)

    # fold count without clz: folds >= k  <=>  sym >= 2^(fid + k*radix - 1).
    # The exponent exceeds 31 for large k on high-radix components (cnr's
    # model wraps at k >= 5 with radix 6) — a raw shift wraps mod 32 on
    # the VPU and overcounts folds; clamp to 31 and gate on the exponent
    # (values are u31, so a 2^31 threshold is never met — exact).
    folds = jnp.zeros(shape, jnp.uint32)
    for k in range(1, max_folds + 1):
        e = (fidelity + jnp.uint32(k) * radix - jnp.uint32(1)) \
            .astype(jnp.int32)
        kthr = jnp.uint32(1) << jnp.minimum(e, 31).astype(jnp.uint32)
        folds = folds + ((sym_in >= kthr) & (e < 32)).astype(jnp.uint32)

    nemit = jnp.zeros(shape, jnp.uint32)
    words = [jnp.zeros(shape, jnp.uint32) for _ in range(max_folds + 1)]
    sym = sym_in
    folds_left = folds
    for _ in range(max_folds):
        a = folds_left > 0
        need = a & ((state >> (jnp.uint32(32) - radix)) != 0)
        w = state & MASK16
        for i in range(max_folds + 1):
            words[i] = jnp.where(need & (nemit == i), w, words[i])
        nemit = nemit + need.astype(jnp.uint32)
        state = jnp.where(need, state >> np.uint32(B), state)
        state = jnp.where(a, (state << radix) + (sym & radix_mask), state)
        sym = jnp.where(a, sym >> radix, sym)
        folds_left = folds_left - a.astype(folds_left.dtype)
    sym = jnp.where(folds > 0, sym + fold_off * folds, sym_in)

    # two-bank table row per lane: (freq|cumul, upper) and (M, sh)
    eidx = (offset + sym).astype(jnp.int32)
    fcs, ups, Ms, shs = [], [], [], []
    for a in range(A):
        ia = eidx[a:a + 1, :]
        rA = lut_gather(tabA, ia, nrows)
        rB = lut_gather(tabB, ia, nrows)
        fcs.append(rA[:, 0:128])
        ups.append(rA[:, 128:256])
        Ms.append(rB[:, 0:128])
        shs.append(rB[:, 128:256])
    fc = jax.lax.bitcast_convert_type(jnp.concatenate(fcs, 0), jnp.uint32)
    upper = jax.lax.bitcast_convert_type(jnp.concatenate(ups, 0),
                                         jnp.uint32)
    M = jax.lax.bitcast_convert_type(jnp.concatenate(Ms, 0), jnp.uint32)
    sh = jax.lax.bitcast_convert_type(jnp.concatenate(shs, 0), jnp.uint32)
    freq = fc & MASK16
    cumul = fc >> np.uint32(16)

    need = active & (state > upper)   # upper = renorm bound MINUS ONE
    w = state & MASK16
    for i in range(max_folds + 1):
        words[i] = jnp.where(need & (nemit == i), w, words[i])
    nemit = nemit + need.astype(jnp.uint32)
    state = jnp.where(need, state >> np.uint32(B), state)

    # division-free state update (reference math: encoder.rs:72-77);
    # the shift fits i32 (sh <= 31)
    q = _umulhi(state, M) >> sh
    r = state - q * freq
    fix_lo = r.astype(jnp.int32) < 0
    q = jnp.where(fix_lo, q - 1, q)
    r = jnp.where(fix_lo, r + freq, r)
    fix_hi = r >= freq
    q = jnp.where(fix_hi, q + 1, q)
    r = jnp.where(fix_hi, r - freq, r)
    new_state = (q << log_m) + cumul + r
    state = jnp.where(active, new_state, state)
    nemit = jnp.where(active, nemit, jnp.uint32(0))
    return state, words, nemit, comp


@functools.partial(
    jax.jit,
    static_argnames=("params", "nrows", "cap", "interpret"))
def encode_blocks_pallas(params, tabA, tabB, nrows: int, vslab, cslab,
                         init_regs, cap: int, interpret: bool = False):
    """Lane-parallel rANS encode as one Pallas kernel. Same output
    contract as encode_jax.encode_blocks (for the first nch*G lanes):
    (emit [cap*EP + cap, nch*G] u32, states [cap, nch*G] u32,
    final_states [nch*G] u32, wtotals [nch*G] u32, ok [nch*G] bool).
    cap must be a multiple of 8.

    CHUNKED tokens: grid (nch, cap//8); chunk c encodes lanes
    [c*G, (c+1)*G) with its own [smax, G] slabs streamed HBM->VMEM by
    the Pallas pipeline — total token volume is bounded by HBM, not
    VMEM (the decode kernel's chunking, now on the encode side)."""
    pl, pltpu = _pl()
    UNROLL = 8
    assert cap % UNROLL == 0
    max_folds = params[9]
    EP = _emit_pairs(max_folds)
    nch, NR, A, _ = init_regs.shape
    G = A * 128
    smax = vslab.shape[1]

    def kernel(tabA_ref, tabB_ref, vslab_ref, cslab_ref, init_ref,
               pairs_ref, meta_ref, states_ref, fin_ref, regs_sc):
        pid = pl.program_id(1)

        @pl.when(pid == 0)
        def _init():
            regs_sc[:] = init_ref[0]

        tA = tabA_ref[:]
        tB = tabB_ref[:]

        def substep(sub, t):
            state_i, cur, wcnt_i = t
            state = jax.lax.bitcast_convert_type(state_i, jnp.uint32)
            wcnt = jax.lax.bitcast_convert_type(wcnt_i, jnp.uint32)
            active = cur > 0
            state, words, nemit, comp = _encode_token(
                params, tA, tB, nrows, vslab_ref, cslab_ref, state, cur,
                max_folds)
            for p in range(EP):
                pair = words[2 * p]
                if 2 * p + 1 <= max_folds:
                    pair = pair | (words[2 * p + 1] << np.uint32(16))
                pair = jnp.where(active, pair, jnp.uint32(0))
                pairs_ref[0, pl.ds(sub * EP + p, 1), :, :] = \
                    jax.lax.bitcast_convert_type(
                        pair, jnp.int32)[None, :, :]
            wcnt = wcnt + jnp.where(active, nemit, jnp.uint32(0))
            is_out = active & (comp == 0)
            meta = (jnp.where(active, nemit, jnp.uint32(0xFF))
                    | (is_out.astype(jnp.uint32) << np.uint32(8))
                    | (wcnt << np.uint32(9)))
            meta_ref[0, pl.ds(sub, 1), :, :] = \
                jax.lax.bitcast_convert_type(meta, jnp.int32)[None, :, :]
            states_ref[0, pl.ds(sub, 1), :, :] = \
                jax.lax.bitcast_convert_type(state, jnp.int32)[None, :, :]
            cur = jnp.where(active, cur - 1, cur)
            return (jax.lax.bitcast_convert_type(state, jnp.int32), cur,
                    jax.lax.bitcast_convert_type(wcnt, jnp.int32))

        t0 = (regs_sc[P_STATE, :, :], regs_sc[P_CUR, :, :],
              regs_sc[P_WCNT, :, :])
        t = jax.lax.fori_loop(0, UNROLL, substep, t0)
        regs_sc[P_STATE, :, :] = t[0]
        regs_sc[P_CUR, :, :] = t[1]
        regs_sc[P_WCNT, :, :] = t[2]
        fin_ref[0, 0, :, :] = t[0]
        fin_ref[0, 1, :, :] = t[1]
        fin_ref[0, 2, :, :] = t[2]

    pairs, meta, states, fin = pl.pallas_call(
        kernel,
        grid=(nch, cap // UNROLL),
        in_specs=[
            pl.BlockSpec(tabA.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabB.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, smax, G), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, smax // 8, G), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NR, A, 128), lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, UNROLL * EP, A, 128),
                         lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UNROLL, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UNROLL, A, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, A, 128), lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nch, cap * EP, A, 128), jnp.int32),
            jax.ShapeDtypeStruct((nch, cap, A, 128), jnp.int32),
            jax.ShapeDtypeStruct((nch, cap, A, 128), jnp.int32),
            jax.ShapeDtypeStruct((nch, 3, A, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NR, A, 128), jnp.int32)],
        interpret=interpret,
    )(tabA, tabB, vslab, cslab, init_regs)

    G_all = nch * G
    pairs_u = jax.lax.bitcast_convert_type(
        jnp.transpose(pairs, (1, 0, 2, 3)), jnp.uint32)
    meta_u = jax.lax.bitcast_convert_type(
        jnp.transpose(meta, (1, 0, 2, 3)), jnp.uint32)
    states_u = jax.lax.bitcast_convert_type(
        jnp.transpose(states, (1, 0, 2, 3)), jnp.uint32)
    emit = jnp.concatenate([pairs_u.reshape(cap * EP, G_all),
                            meta_u.reshape(cap, G_all)], axis=0)
    final_states = jax.lax.bitcast_convert_type(
        fin[:, 0], jnp.uint32).reshape(G_all)
    cur_end = fin[:, 1].reshape(G_all)
    wtotals = jax.lax.bitcast_convert_type(
        fin[:, 2], jnp.uint32).reshape(G_all)
    ok = cur_end <= 0
    return emit, states_u.reshape(cap, G_all), final_states, wtotals, ok

"""TPU lane-parallel rANS encoding.

The reference encodes with ONE serial encoder state over the reversed token
stream (reference: src/ans/encoder.rs:39-86 driven by
src/bvgraph/writers/bvgraph_encoder.rs:159-174). Here the token stream
splits at node boundaries into independent blocks, one per lane; each lane
runs the rANS encode loop (fold-push with renorm, division-free state
update) over its reversed range, and the per-block streams concatenate in
block order (last block first, matching the serial emission order). Every
node still gets a phase (state, stream pointer), so all decode paths —
lane-parallel sequential, random access — work unchanged; only the
single-state continuity across block boundaries is given up (each block
starts from the rANS lower bound, costing ~2 stream words per block).

Division is the classic reciprocal multiply-shift (the reference benches
exactly this in benches/benchmarks/fastdiv.rs but never integrates it; TPU
has no integer divide, so here it is load-bearing): per folded symbol s,
q = umulhi(state, M_s) >> sh_s with an exact-quotient correction step.

Per-token work follows the measured TPU rules (see ops/decode_jax.py):
one [T, 2]-row gather for (value, component), one [sym, 4]-row gather for
the symbol's encode entry, a single packed register carry, emissions packed
2-words-per-u32 into step-major rows.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ans.model import ANSModel
from .decode_jax import row_gather

B = 16
LOWER_BOUND = np.uint32(1 << 16)
MASK16 = np.uint32(0xFFFF)

# Register rows.
E_STATE, E_CUR, E_WCNT = range(3)
ENREG = 3


class EncoderTables(NamedTuple):
    """Per-folded-symbol encode entries, all components concatenated:
    row = [freq | cumul<<16, renorm upper bound, M (reciprocal magic),
    shift]. Indexed by component offset + folded symbol."""

    tab: jax.Array  # uint32 [entries, 4]


def _magic(freq: int):
    """Reciprocal magic for floor(x / freq) on x < 2^32 via
    (umulhi(x, M)) >> sh, exact to within +1 (a runtime correction step
    fixes the off-by-one; reference design study:
    benches/benchmarks/fastdiv.rs)."""
    if freq == 0:
        return 0, 0
    if freq == 1:
        # umulhi(x, 2^32-1) = x - 1 for x >= 1; the correction adds it back
        return 0xFFFFFFFF, 0
    if freq & (freq - 1) == 0:
        # power of two: umulhi(x, 2^31) = x >> 1, then shift the rest
        return 0x80000000, freq.bit_length() - 2
    l = freq.bit_length() - 1   # floor(log2(freq))
    M = ((1 << (32 + l)) + freq - 1) // freq  # ceil(2^(32+l)/freq) < 2^32
    assert M < 1 << 32
    return M, l


def build_encoder_tables(model: ANSModel):
    """Host-side encode table build. Returns (EncoderTables, params) with
    params = 9 x (offset, log_m, fold_threshold_log2ish...) static tuple:
    (offset, log_m, radix, fidelity) per component plus [9]=max_folds."""
    rows = []
    params = []
    base = 0
    max_folds = 0
    for c in model.components:
        params.append((base, int(c.log_m), int(c.radix), int(c.fidelity)))
        n = len(c.freqs)
        if n == 0:
            continue
        freqs = c.freqs.astype(np.int64)
        cumul = np.zeros(n, np.int64)
        np.cumsum(freqs[:-1], out=cumul[1:])
        k = 16 - c.log_m
        row = np.zeros((n, 4), np.uint32)
        row[:, 0] = (freqs & 0xFFFF) | ((cumul & 0xFFFF) << 16)
        # renorm bound stored MINUS ONE so it fits u32 even for frame-1
        # components (true bound (1<<(k+B))*freq <= 2^32 since
        # freq <= frame; the encode step tests state > bound-1, exact
        # for every case incl. the never-shrink bound == 2^32).
        # freq == 0 rows are never encoded; keep bound-1 = 0.
        bound = (1 << (k + B)) * freqs
        row[:, 1] = np.maximum(bound - 1, 0) & 0xFFFFFFFF
        for s in range(n):
            M, sh = _magic(int(freqs[s]))
            row[s, 2] = M
            row[s, 3] = sh
        rows.append(row)
        # folds for the largest symbol this table can represent
        thr = c.folding_threshold
        off = c.folding_offset
        if n > thr:
            max_folds = max(max_folds, int((n - 1 - thr) // off + 1))
        base += n
    tab = np.concatenate(rows) if rows else np.zeros((1, 4), np.uint32)
    params.append(max_folds)
    return EncoderTables(tab=jnp.asarray(tab)), tuple(params), tab


def _enc_const(comp, params, field: int):
    out = jnp.full(comp.shape, np.uint32(params[0][field]), jnp.uint32)
    for c in range(1, 9):
        out = jnp.where(comp == c, np.uint32(params[c][field]), out)
    return out


def _umulhi(a, b):
    """High 32 bits of the u32 x u32 product, via 16-bit partials."""
    a0 = a & MASK16
    a1 = a >> np.uint32(16)
    b0 = b & MASK16
    b1 = b >> np.uint32(16)
    p00 = a0 * b0
    mid = a1 * b0 + (p00 >> np.uint32(16))       # < 2^32, no overflow
    mid2 = a0 * b1 + (mid & MASK16)              # < 2^32
    return a1 * b1 + (mid >> np.uint32(16)) + (mid2 >> np.uint32(16))


# Emission slots per token: one optional renorm word per fold push plus one
# before the rANS update. Words pack 2-per-u32; EMIT_PAIRS rows per step.
def _emit_pairs(max_folds: int) -> int:
    return (max_folds + 2) // 2


@functools.partial(jax.jit, static_argnames=("params", "cap"))
def encode_blocks(params, tables: EncoderTables, tokens, tstart, tend,
                  cap: int):
    """Lane-parallel rANS encode. Lane l encodes tokens
    tokens[tstart[l] .. tend[l]-1] in REVERSE (LIFO), exactly like the
    serial flush (reference: bvgraph_encoder.rs:159-174).

    tokens: uint32 [T, 2] rows = (folded-input value, component).
    Returns (emit [cap * EMIT_PAIRS + cap, L] u32, states [cap, L] u32,
    counts...): see lane_encode_tokens for the host-side unpack. Layout:
    rows [s*EP, (s+1)*EP) hold step s's emitted words packed 2-per-u32
    low-word-first; row capEP + s holds {emit_count (8b) | is_outdeg (1b)
    << 8 | wcnt_after (23b << 9)} per lane; states[s] = state after step s.
    ok[l] when the lane finished within cap steps."""
    max_folds = params[9]
    EP = _emit_pairs(max_folds)
    L = tstart.shape[0]
    i32 = jnp.int32

    regs = jnp.zeros((ENREG, L), i32)
    regs = regs.at[E_STATE].set(
        jax.lax.bitcast_convert_type(jnp.full((L,), LOWER_BOUND), i32))
    regs = regs.at[E_CUR].set(tend.astype(i32))  # cursor: next index is cur-1
    ends = tstart.astype(i32)
    emit = jnp.zeros((cap * EP + cap, L), jnp.uint32)
    states = jnp.zeros((cap, L), jnp.uint32)

    def cond(carry):
        step, regs, emit, states = carry
        return (step < cap) & jnp.any(regs[E_CUR] > ends)

    def body(carry):
        step, regs, emit, states = carry
        cur = regs[E_CUR]
        active = cur > ends
        idx = jnp.maximum(cur - 1, 0)
        row = row_gather(tokens, idx)           # [L, 2] one row gather
        sym_in = jnp.where(active, row[:, 0], 0)
        comp = jnp.where(active, row[:, 1], 0)

        offset = _enc_const(comp, params, 0)
        log_m = _enc_const(comp, params, 1)
        radix = _enc_const(comp, params, 2)
        fidelity = _enc_const(comp, params, 3)
        thr = jnp.uint32(1) << (fidelity + radix - jnp.uint32(1))
        fold_off = ((jnp.uint32(1) << radix) - jnp.uint32(1)) * \
            (jnp.uint32(1) << (fidelity - jnp.uint32(1)))
        radix_mask = (jnp.uint32(1) << radix) - jnp.uint32(1)

        state = jax.lax.bitcast_convert_type(regs[E_STATE], jnp.uint32)

        # fold: number of radix chunks to push (reference: encoder.rs:44-58)
        bl = jnp.uint32(32) - jax.lax.clz(jnp.maximum(sym_in, 1).astype(i32)) \
            .astype(jnp.uint32)
        folds = jnp.where(sym_in >= thr, (bl - fidelity) // radix, 0)

        nemit = jnp.zeros((L,), jnp.uint32)
        words = [jnp.zeros((L,), jnp.uint32) for _ in range(max_folds + 1)]
        sym = sym_in
        folds_left = folds
        for _ in range(max_folds):
            a = folds_left > 0
            # renorm before push: emit 16 LSBs if the top radix bits are used
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

        # [L, 4] one row DMA per lane per token (flat-gather form; see
        # decode_jax.row_gather for why plain row indexing is avoided)
        erow = row_gather(tables.tab, (offset + sym).astype(jnp.int32))
        fc = erow[:, 0]
        freq = fc & MASK16
        cumul = fc >> np.uint32(16)
        upper = erow[:, 1]        # renorm bound MINUS ONE (see build)
        M = erow[:, 2]
        sh = erow[:, 3]

        need = active & (state > upper)
        w = state & MASK16
        for i in range(max_folds + 1):
            words[i] = jnp.where(need & (nemit == i), w, words[i])
        nemit = nemit + need.astype(jnp.uint32)
        state = jnp.where(need, state >> np.uint32(B), state)

        # division-free state update (reference math: encoder.rs:72-77)
        q = _umulhi(state, M) >> sh
        r = state - q * freq
        fix_lo = (r.astype(i32) < 0)
        q = jnp.where(fix_lo, q - 1, q)
        r = jnp.where(fix_lo, r + freq, r)
        fix_hi = r >= freq
        q = jnp.where(fix_hi, q + 1, q)
        r = jnp.where(fix_hi, r - freq, r)
        new_state = (q << log_m) + cumul + r
        state = jnp.where(active, new_state, state)

        # write emissions (packed 2 words per u32, low word first)
        for p in range(EP):
            pair = words[2 * p]
            if 2 * p + 1 <= max_folds:
                pair = pair | (words[2 * p + 1] << np.uint32(16))
            emit = emit.at[step * EP + p, :].set(
                jnp.where(active, pair, 0))
        wcnt = jax.lax.bitcast_convert_type(regs[E_WCNT], jnp.uint32) + \
            jnp.where(active, nemit, 0)
        is_out = active & (comp == 0)
        meta = (jnp.where(active, nemit, jnp.uint32(0xFF))
                | (is_out.astype(jnp.uint32) << np.uint32(8))
                | (wcnt << np.uint32(9)))
        emit = emit.at[cap * EP + step, :].set(meta)
        states = states.at[step, :].set(state)

        regs = jnp.stack([
            jax.lax.bitcast_convert_type(state, i32),
            jnp.where(active, cur - 1, cur),
            jax.lax.bitcast_convert_type(wcnt, i32),
        ], axis=0)
        return step + 1, regs, emit, states

    step, regs, emit, states = jax.lax.while_loop(
        cond, body, (jnp.zeros((), i32), regs, emit, states))
    ok = regs[E_CUR] <= ends
    final_states = jax.lax.bitcast_convert_type(regs[E_STATE], jnp.uint32)
    wtotals = jax.lax.bitcast_convert_type(regs[E_WCNT], jnp.uint32)
    return emit, states, final_states, wtotals, ok


def encode_plan(model: ANSModel, values: np.ndarray, comps: np.ndarray,
                num_blocks: int = 512):
    """Device-ready encode inputs: tables/params, token array, and
    token-balanced block bounds at node starts. Split out of
    lane_encode_tokens so callers (bench, servers) can re-run the
    encode_blocks kernel steady-state against a prepared plan."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    comps = np.ascontiguousarray(comps, dtype=np.uint8)
    T = len(values)
    if np.any(values >> 31):
        raise ValueError("token values must fit in uint31 for the TPU encoder")

    tables, params, tab_np = build_encoder_tables(model)

    # block boundaries at node starts, balanced in TOKEN space
    node_starts = np.nonzero(comps == 0)[0]
    n_nodes = len(node_starts)
    Bn = min(num_blocks, max(n_nodes, 1))
    targets_tok = (np.arange(Bn, dtype=np.int64) * T) // max(Bn, 1)
    if n_nodes:
        picks = np.minimum(np.searchsorted(node_starts, targets_tok),
                           n_nodes - 1)
    else:
        picks = np.zeros(1, np.int64)
    picks = np.unique(picks)
    block_nodes = picks.astype(np.int64)
    tstart = (node_starts[block_nodes].astype(np.int32) if n_nodes
              else np.zeros(1, np.int32))
    tend = np.empty_like(tstart)
    tend[:-1] = tstart[1:]
    tend[-1] = T

    tokens = np.stack([values.astype(np.uint32),
                       comps.astype(np.uint32)], axis=1)
    cap = max(int((tend - tstart).max()) if len(tstart) else 1, 1)
    cap = -(-cap // 8) * 8   # Pallas grid granularity; XLA exits early
    return (params, tables, jnp.asarray(tokens), jnp.asarray(tstart),
            jnp.asarray(tend), cap, tstart, tend, block_nodes, tab_np)


def lane_encode_tokens(model: ANSModel, values: np.ndarray,
                       comps: np.ndarray, num_blocks: int = 512,
                       window: int = 7):
    """Host orchestration: encodes the forward-order token stream with
    `num_blocks` independent lanes split at token-balanced node
    boundaries (every decode lane's lockstep step count equals its token
    count, so token balance is what keeps the lane-parallel decoder
    busy; references may cross block boundaries — all decoders seed
    their context from the phase table / carry the window across
    blocks). Returns (stream u16, states u32 reverse-node-order,
    pointers u64 reverse-node-order, final_state, blocks) — the same
    artifact contract as the serial native encode (native/src/ans.hpp
    BufferSink::encode), plus the prelude block entry table
    (start_nodes, entry_states, entry_ptrs)."""
    del window  # block starts no longer restricted to reference-safe nodes
    (params, tables, tokens_d, tstart_d, tend_d, cap, tstart, tend,
     block_nodes, tab_np) = encode_plan(model, values, comps, num_blocks)
    max_folds = params[9]
    EP = _emit_pairs(max_folds)
    T = len(values)

    emit, states, final_states, wtotals, ok = encode_blocks_auto(
        params, tables, tokens_d, tstart_d, tend_d, cap, tstart, tend,
        tab_np)
    assert bool(np.asarray(ok).all())
    wtot = np.asarray(wtotals)
    if len(wtot) and int(wtot.max()) >= (1 << 23):
        # the per-step meta word packs the cumulative emitted word count
        # into 23 bits (wcnt << 9); beyond that, phase pointers would wrap
        raise ValueError(
            "a lane emitted >= 2^23 stream words; use more encode blocks "
            "(num_blocks) so per-lane output stays under 16 MiB")
    emit = np.asarray(emit)
    states = np.asarray(states)
    final_states = np.asarray(final_states)

    meta = emit[cap * EP:]                       # [cap, Bn]
    Bn = len(tstart)
    steps_per_lane = (tend - tstart).astype(np.int64)
    live = np.arange(cap)[:, None] < steps_per_lane[None, :]  # [cap, Bn]
    nemit = np.where(live, meta & 0xFF, 0).astype(np.int64)
    is_out = live & (((meta >> 8) & 1).astype(bool))
    wcnt_after = (meta >> 9).astype(np.int64)

    # ---- fully vectorized stream assembly ----
    # global order: serial emission processes the LAST block first
    lane_totals = nemit.sum(axis=0)
    offsets = np.zeros(Bn, np.int64)  # global word offset of each lane
    offsets[:-1] = np.cumsum(lane_totals[::-1])[::-1][1:]
    total_words = int(lane_totals.sum())
    # destination of word j of step s in lane l:
    #   offsets[l] + (exclusive cumsum of nemit over steps)[s, l] + j
    pos = np.cumsum(nemit, axis=0) - nemit + offsets[None, :]
    stream = np.zeros(total_words, np.uint16)
    for p in range(EP):
        pairs = emit[:cap * EP][p::EP]           # rows s*EP+p -> [cap, Bn]
        m0 = nemit > 2 * p
        stream[(pos + 2 * p)[m0]] = (pairs & 0xFFFF).astype(np.uint16)[m0]
        m1 = nemit > 2 * p + 1
        stream[(pos + 2 * p + 1)[m1]] = (pairs >> 16).astype(np.uint16)[m1]

    # ---- phases (reverse global node order = lanes last-to-first, steps
    # ascending within each lane) ----
    sel = is_out[:, ::-1].T                      # [Bn(desc), cap]
    states_out = states[:, ::-1].T[sel]
    pointers_out = (wcnt_after + offsets[None, :])[:, ::-1].T[sel] \
        .astype(np.uint64)
    final_state = int(final_states[0]) if len(tstart) else int(LOWER_BOUND)
    blocks = (block_nodes.astype(np.uint32),
              final_states.astype(np.uint32),
              (offsets + lane_totals).astype(np.uint64))
    return (stream, states_out.astype(np.uint32), pointers_out, final_state,
            blocks)


def encode_blocks_auto(params, tables: EncoderTables, tokens, tstart_d,
                       tend_d, cap: int, tstart=None, tend=None,
                       tab_np=None):
    """Runs the Pallas encode kernel (ops/encode_pallas.py) when the
    backend supports it; the XLA while-loop kernel otherwise. Token
    slabs larger than the per-chunk VMEM budget stream chunked through
    the Pallas grid (encode_pallas.plan_token_slabs) — total token
    volume is bounded by HBM. Same output contract (emit, states,
    final_states, wtotals, ok), trimmed to the real lane count."""
    import os

    use = tab_np is not None and tstart is not None
    env = os.environ.get("WGT_PALLAS", "")
    if env == "0":
        use = False
    elif env not in ("1", "interpret") and \
            jax.default_backend() not in ("tpu", "axon"):
        use = False
    if use:
        from . import encode_pallas as ep

        smax, gpad, nch = ep.plan_token_slabs(tstart, tend)
        if nch == 0:
            use = False   # one fat lane exceeds even a 128-lane chunk
    if not use:
        return encode_blocks(params, tables, tokens, tstart_d, tend_d, cap)
    L = len(tstart)
    tabA, tabB, nrows = ep.build_pallas_enc_tables(tab_np)
    vslab, cslab = ep.build_token_slabs(tokens, tstart_d, tend_d, smax,
                                        gpad, nch)
    init = jnp.asarray(ep.make_enc_init_regs(tstart, tend, nch))
    emit, states, final_states, wtotals, ok = ep.encode_blocks_pallas(
        params, tabA, tabB, nrows, vslab, cslab, init, cap,
        interpret=env == "interpret")
    return (emit[:, :L], states[:, :L], final_states[:L], wtotals[:L],
            ok[:L])

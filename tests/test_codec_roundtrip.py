"""Tier-2: pure codec round trips, no graph involved — mirrors the
reference's tests/compressor_tests.rs (dummy sequence, folding path, 1M Zipf,
interleaved components with different frame sizes). Also cross-validates the
native codec against the pure-Python executable spec."""

import numpy as np
import pytest

from webgraph_ans_tpu.ans.codec import decode_raw, encode_raw, model_from_sequences
from webgraph_ans_tpu.ans.reference_codec import PyANSDecoder, PyANSEncoder

from conftest import zipf_symbols

OUTDEGREE = 0
RESIDUAL = 8


def roundtrip(seqs: dict[int, np.ndarray]):
    """Encodes all sequences interleaved round-robin, decodes LIFO, checks equality."""
    model = model_from_sequences(seqs)
    values, comps = [], []
    iters = {c: list(map(int, v)) for c, v in seqs.items()}
    idx = 0
    while any(iters.values()):
        for c in sorted(iters):
            if idx < len(iters[c]):
                values.append(iters[c][idx])
                comps.append(c)
        idx += 1
        if all(idx >= len(v) for v in iters.values()):
            break
    values = np.array(values, dtype=np.uint64)
    comps = np.array(comps, dtype=np.uint8)
    enc = encode_raw(model, values, comps)
    decoded = decode_raw(model, enc.stream, enc.final_state, comps[::-1])
    np.testing.assert_array_equal(decoded[::-1], values)
    return model, enc


def test_single_dummy_sequence():
    # reference: compressor_tests.rs:15-43
    roundtrip({OUTDEGREE: np.array([1, 1, 1, 2, 2, 2, 3, 3, 4, 5], dtype=np.uint64)})


def test_dummy_sequence_with_folding():
    # reference: compressor_tests.rs:46-76
    roundtrip({OUTDEGREE: np.array([1000, 1000, 2000], dtype=np.uint64)})


def test_large_symbols_roundtrip():
    syms = np.array([1, (1 << 40) + 3, 17, (1 << 47), 2, 5], dtype=np.uint64)
    roundtrip({OUTDEGREE: syms})


@pytest.mark.parametrize("s", [1.2, 1.5, 2.0])
def test_zipf_sequence(s):
    # reference: compressor_tests.rs:79-109 (SYMBOL_LIST_LENGTH=1_000_000)
    syms = zipf_symbols(1_000_000, s, seed=0)
    roundtrip({OUTDEGREE: syms})


def test_interleaved_components():
    # reference: compressor_tests.rs:112-152
    roundtrip({
        OUTDEGREE: zipf_symbols(20_000, 1.3, seed=1),
        RESIDUAL: zipf_symbols(20_000, 1.7, seed=2),
    })


def test_three_shuffled_components():
    # reference: compressor_tests.rs:155-214 (different frame sizes per component)
    rng = np.random.default_rng(3)
    seqs = {
        0: zipf_symbols(30_000, 1.2, seed=4),
        4: rng.integers(1, 8, size=30_000).astype(np.uint64),
        8: zipf_symbols(30_000, 2.0, seed=5),
    }
    model = model_from_sequences(seqs)
    order = rng.permutation(np.repeat([0, 4, 8], 30_000))
    cursors = {c: 0 for c in seqs}
    values = np.empty(len(order), dtype=np.uint64)
    for i, c in enumerate(order):
        values[i] = seqs[c][cursors[c]]
        cursors[c] += 1
    enc = encode_raw(model, values, order.astype(np.uint8))
    decoded = decode_raw(model, enc.stream, enc.final_state, order[::-1].astype(np.uint8))
    np.testing.assert_array_equal(decoded[::-1], values)


def test_native_matches_python_spec():
    """The native codec and the pure-Python executable spec must produce
    identical streams, states and decodes."""
    seqs = {OUTDEGREE: zipf_symbols(3000, 1.4, seed=9),
            RESIDUAL: zipf_symbols(3000, 1.8, seed=10)}
    model = model_from_sequences(seqs)
    values = np.concatenate([seqs[OUTDEGREE], seqs[RESIDUAL]])
    comps = np.concatenate([np.zeros(3000, np.uint8), np.full(3000, 8, np.uint8)])

    enc = encode_raw(model, values, comps)

    pyenc = PyANSEncoder(model)
    for v, c in zip(values, comps):
        pyenc.encode(int(v), int(c))
    assert pyenc.state == enc.final_state
    np.testing.assert_array_equal(np.array(pyenc.stream, dtype=np.uint16), enc.stream)

    pydec = PyANSDecoder(model, enc.stream, enc.final_state)
    decoded = np.array([pydec.decode(int(c)) for c in comps[::-1]], dtype=np.uint64)
    np.testing.assert_array_equal(decoded[::-1], values)


def test_phase_midstream_entry():
    """Phases captured at OUTDEGREE symbols are valid decode entry points
    (the property the random-access format relies on)."""
    rng = np.random.default_rng(11)
    # groups of (outdegree, residuals...) like a miniature graph
    values, comps = [], []
    groups = []
    for _ in range(200):
        deg = int(rng.integers(1, 6))
        res = rng.integers(1, 1000, size=deg).astype(np.uint64)
        groups.append((deg, res))
        values.append(deg)
        comps.append(OUTDEGREE)
        values.extend(map(int, res))
        comps.extend([RESIDUAL] * deg)
    seqs = {
        OUTDEGREE: np.array([g[0] for g in groups], dtype=np.uint64),
        RESIDUAL: np.concatenate([g[1] for g in groups]),
    }
    model = model_from_sequences(seqs)
    # encode in REVERSE symbol order so that phases mark forward group starts
    enc = encode_raw(model, np.array(values[::-1], dtype=np.uint64),
                     np.array(comps[::-1], dtype=np.uint8))
    # phases come out in encode order = reverse group order
    assert len(enc.states) == len(groups)
    for j, (deg, res) in enumerate(groups):
        phase_idx = len(groups) - 1 - j
        dec_comps = [OUTDEGREE] + [RESIDUAL] * deg
        out = decode_raw(
            model,
            enc.stream[: enc.pointers[phase_idx]],
            int(enc.states[phase_idx]),
            np.array(dec_comps, dtype=np.uint8),
        )
        assert out[0] == deg
        np.testing.assert_array_equal(out[1:], res)


def test_frame1_component_interleave_roundtrip():
    """Regression: a component whose model collapses to a single symbol
    (frame size 1, log_m = 0) must cost zero bits and NEVER renormalize
    (reference component_model4encoder.rs:28-35 keeps the upperbound in
    u64: (1<<32)*freq). A u32 bound once wrapped, shrank the state below
    the decoder's lower bound, and desynced any model with a frame-1
    component (found via a w=16 graph whose INTERVAL_COUNT stream was
    all zeros)."""
    import numpy as np
    from webgraph_ans_tpu.ans.codec import (decode_raw, encode_raw,
                                            model_from_sequences)

    rng = np.random.default_rng(77)
    # comp 4: constant stream -> frame-1 model; comps 1/7/8: mixed
    seqs = {
        1: rng.integers(0, 8, 500).astype(np.uint64),
        4: np.zeros(300, np.uint64),
        7: rng.zipf(1.8, 400).astype(np.uint64) % (1 << 20),
        8: rng.zipf(1.5, 800).astype(np.uint64) % (1 << 16),
    }
    model = model_from_sequences(seqs)
    assert any(len(c.freqs) == 1 and c.log_m == 0
               for c in model.components), "fixture lost the frame-1 case"
    order = rng.permutation(
        np.concatenate([np.full(len(v), c) for c, v in seqs.items()]))
    picks = {c: 0 for c in seqs}
    vals, comps = [], []
    for c in order:
        c = int(c)
        vals.append(seqs[c][picks[c]])
        picks[c] += 1
        comps.append(c)
    vals = np.array(vals, np.uint64)
    comps = np.array(comps, np.uint8)
    enc = encode_raw(model, vals[::-1], comps[::-1])
    back = decode_raw(model, enc.stream, enc.final_state, comps)
    np.testing.assert_array_equal(back, vals)

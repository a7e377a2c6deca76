"""Pure-Python reference encoder (ans/pyencoder.py) vs the native encoder:
same model + same token stream must produce the identical stream/state."""

import numpy as np

from webgraph_ans_tpu.ans.codec import encode_raw, model_from_sequences
from webgraph_ans_tpu.ans.pyencoder import PyANSEncoder, encode_graph_py
from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
from webgraph_ans_tpu.ans.prelude import Prelude

from conftest import zipf_symbols


def test_pyencoder_matches_native():
    rng = np.random.default_rng(5)
    n = 2000
    comps = rng.integers(0, 9, size=n).astype(np.uint8)
    vals = zipf_symbols(n, 1.4, seed=8, max_val=1 << 24)
    model = model_from_sequences({c: vals[comps == c] for c in range(9)})
    native = encode_raw(model, vals, comps)

    enc = PyANSEncoder(model)
    for v, c in zip(vals.tolist(), comps.tolist()):
        enc.encode(int(v), int(c))
    np.testing.assert_array_equal(
        np.array(enc.stream, np.uint16), native.stream)
    assert enc.state == native.final_state


def test_encode_graph_py_decodable():
    """The self-contained no-reference graph encode (used by the driver
    dry run) must decode with the native sequential decoder."""
    rng = np.random.default_rng(2)
    lists = []
    for i in range(80):
        d = int(rng.integers(0, 6))
        lists.append(sorted(rng.choice(80, size=d, replace=False).tolist()))
    model, stream, states, pointers, final = encode_graph_py(lists, 7, 2)
    p = Prelude(model=model, stream=stream, state=final, num_nodes=len(lists),
                num_arcs=sum(len(x) for x in lists), compression_window=7,
                min_interval_length=2)
    dec = ANSBvGraphSeq(p).decode_all()
    assert dec.to_lists() == lists

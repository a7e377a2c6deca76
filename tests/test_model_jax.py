"""TPU model grid search must select the identical model to the host/native
builder (same frames, params, and scaled frequencies)."""

import numpy as np
import pytest

from webgraph_ans_tpu.ans.codec import model_from_sequences
from webgraph_ans_tpu.ans.model import build_model
from webgraph_ans_tpu.bvgraph.store import _run_histogram_pass
from webgraph_ans_tpu.bvgraph import estimators
from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.ops.model_jax import build_model_jax

from conftest import zipf_symbols


def _hist_from_sequences(seqs):
    hists = []
    for comp in range(9):
        if comp in seqs and len(seqs[comp]):
            s, c = np.unique(np.asarray(seqs[comp], np.uint64), return_counts=True)
            hists.append((s.astype(np.uint64), c.astype(np.uint64)))
        else:
            hists.append((np.zeros(0, np.uint64), np.zeros(0, np.uint64)))
    return hists


def _assert_models_equal(a, b):
    for i, (ca, cb) in enumerate(zip(a.components, b.components)):
        assert (ca.log_m, ca.radix, ca.fidelity) == (cb.log_m, cb.radix, cb.fidelity), \
            f"component {i} params differ"
        np.testing.assert_array_equal(ca.freqs, cb.freqs,
                                      err_msg=f"component {i} freqs differ")


def test_model_jax_zipf():
    seqs = {c: zipf_symbols(20000, 1.2 + 0.1 * c, seed=c, max_val=1 << 26)
            for c in range(9)}
    hists = _hist_from_sequences(seqs)
    _assert_models_equal(build_model(hists), build_model_jax(hists))


def test_model_jax_sparse_components():
    seqs = {0: np.array([5, 5, 5, 7], np.uint64),
            8: zipf_symbols(5000, 1.5, seed=1)}
    hists = _hist_from_sequences(seqs)
    _assert_models_equal(build_model(hists), build_model_jax(hists))


def test_model_jax_single_symbol():
    seqs = {0: np.full(100, 3, np.uint64), 4: np.array([1], np.uint64)}
    hists = _hist_from_sequences(seqs)
    _assert_models_equal(build_model(hists), build_model_jax(hists))


def test_model_jax_graph_histograms(dummy_graph):
    hists = _run_histogram_pass(dummy_graph, 7, 3, 2, estimators.LOG2,
                                estimators.empty_tables())
    _assert_models_equal(build_model(hists), build_model_jax(hists))


@pytest.mark.slow
def test_model_jax_cnr2000(cnr2000):
    adj, _ = cnr2000
    hists = _run_histogram_pass(adj, 7, 3, 2, estimators.LOG2,
                                estimators.empty_tables())
    _assert_models_equal(build_model(hists), build_model_jax(hists))

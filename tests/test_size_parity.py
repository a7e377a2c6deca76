"""Size-parity evidence vs the reference pipeline (VERDICT r01 item 6).

The reference repo publishes no cnr-2000 sizes (its results tables are
LAW-scale graphs only), and its Rust toolchain is not available here, so
exact same-binary comparison is impossible. The parity argument is a
chain of bit-level equivalences, each tested elsewhere in this suite:

- the BvComp walk makes the same reference/interval/residual decisions
  under the same estimator (native histogram pass == dump_tokens ground
  truth, tests/test_pipeline.py);
- the model builder reproduces the reference's model exactly
  (tests/test_model_builder.py vs reference builder semantics,
  src/ans/models/model4encoder_builder.rs);
- the rANS encoder emits bit-identical streams for identical token
  sequences (tests/test_pyencoder.py, tests/test_tpu_encode.py vs
  reference encoder.rs).

Therefore the serial `.ans` STREAM equals what the reference emits for
the same parameters; only the serialized-model container differs (ours
is smaller). This test LOCKS the resulting artifact sizes so any
regression in model choice, BvComp decisions, or encoder emission shows
up as a byte-count change, and asserts the headline compression-ratio
claim (beats BVGraph by the reference's ~5-11% margin,
reference README results tables).
"""

import os
import tempfile

import pytest

from webgraph_ans_tpu.bvgraph.store import store

BASE = os.path.join(os.path.dirname(__file__), "data", "cnr-2000",
                    "cnr-2000")

# golden artifact sizes (bytes) for the default pipeline (-w 7 -c 3 -l 2)
GOLDEN_MF12 = 1053108
GOLDEN_MF16 = 1078516
CNR_ARCS = 3216152
BVGRAPH_BITS_PER_LINK = 2.897  # cnr-2000.graph, webgraph default params


@pytest.mark.parametrize("mf,golden", [(12, GOLDEN_MF12), (16, GOLDEN_MF16)])
def test_cnr2000_size_lock(mf, golden):
    out = os.path.join(tempfile.mkdtemp(prefix="wgt_size_"), "cnr")
    store(BASE, out, max_frame_log2=mf)
    size = os.path.getsize(out + ".ans")
    assert size == golden, (
        f"serial .ans size changed: {size} != {golden} (max_frame_log2="
        f"{mf}); compression pipeline no longer matches the locked "
        "reference-equivalent output")
    bits_per_link = size * 8 / CNR_ARCS
    # the reference reports -5..-11% vs BVGraph across its corpus
    assert bits_per_link < BVGRAPH_BITS_PER_LINK * 0.95


# high-compression golden sizes (-w 16 -c 2000000000 -l 4; reference
# script.py:24). The safe-break variant is this framework's format
# extension for parallel hc decode (reference floor at every 128th node
# + element-aware early breaks in dense regions): +2.3% over the
# unconstrained hc stream, still far below BVGraph.
GOLDEN_HC = 876978
GOLDEN_HC_BRK128 = 897446


@pytest.mark.slow
@pytest.mark.parametrize("brk,golden", [(0, GOLDEN_HC),
                                        (128, GOLDEN_HC_BRK128)])
def test_cnr2000_hc_size_lock(brk, golden):
    out = os.path.join(tempfile.mkdtemp(prefix="wgt_size_"), "cnr-hc")
    store(BASE, out, compression_window=16, max_ref_count=2_000_000_000,
          min_interval_length=4, safe_break_interval=brk)
    size = os.path.getsize(out + ".ans")
    assert size == golden, (
        f"hc .ans size changed: {size} != {golden} "
        f"(safe_break_interval={brk})")
    assert size * 8 / CNR_ARCS < BVGRAPH_BITS_PER_LINK * 0.80

import os

# JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU pod hardware. Must be set before jax imports.
# Force an 8-virtual-device CPU mesh even if the environment points at real
# TPU hardware (e.g. JAX_PLATFORMS=axon, where a sitecustomize imports jax at
# interpreter startup, so env vars are too late — use jax.config instead):
# tests must be deterministic and exercise the multi-device code paths;
# bench.py is what runs on the real chip.
if os.environ.get("WGT_TEST_PLATFORM", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import Adjacency, load_bvgraph

CNR = os.path.join(os.path.dirname(__file__), "data", "cnr-2000", "cnr-2000")


@pytest.fixture(scope="session")
def cnr2000():
    adj, props = load_bvgraph(CNR)
    return adj, props


@pytest.fixture(scope="session")
def dummy_graph():
    # The reference's 6-node executable spec (tests/test_bvgraph.rs:24-101).
    return Adjacency.from_lists([[2, 3], [5], [], [], [0], []])


def zipf_symbols(n: int, s: float, seed: int, max_val: int = 1 << 30) -> np.ndarray:
    """Seeded Zipf sampler bounded to [1, max_val], standing in for power-law
    gap distributions (reference: tests/utils/mod.rs:17-26)."""
    rng = np.random.default_rng(seed)
    vals = rng.zipf(s, size=n).astype(np.uint64)
    return np.minimum(vals, max_val)

"""Test config: force CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

# jax is pre-imported in this environment (axon), so env vars alone are too
# late; set the config directly before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, num_nodes, avg_degree, power_law=False):
    """Random COO edge list, deduplicated (multi-edges are legal in the
    framework but inexpressible in the dense [N, N] test oracles)."""
    num_edges = int(num_nodes * avg_degree)
    src = rng.integers(0, num_nodes, num_edges)
    if power_law:
        # skew destinations: a few hubs with large in-degree to exercise
        # multi-bin + mega-row splitting
        z = rng.zipf(1.6, num_edges)
        dst = np.minimum(z - 1, num_nodes - 1)
    else:
        dst = rng.integers(0, num_nodes, num_edges)
    uniq = np.unique(np.stack([src, dst], 1), axis=0)
    return uniq[:, 0].astype(np.int64), uniq[:, 1].astype(np.int64)

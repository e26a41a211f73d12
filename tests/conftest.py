"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
are exercised without TPU hardware (`xla_force_host_platform_device_count`
— the standard JAX trick; see SURVEY.md §4). This must run before jax
initializes its backends, hence the env mutation at import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments force a TPU platform via sitecustomize config updates
# that override the env var; re-assert CPU through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_graph():
    from gnn_tpu.data.synthetic import make_powerlaw_graph
    return make_powerlaw_graph(num_nodes=2000, avg_degree=12, num_feats=32,
                               num_classes=7, seed=0)


@pytest.fixture(scope="session")
def homophilous_graph():
    from gnn_tpu.data.synthetic import make_powerlaw_graph
    return make_powerlaw_graph(num_nodes=3000, avg_degree=14,
                               num_feats=32, num_classes=7, seed=0,
                               homophily=0.7)


@pytest.fixture(scope="session")
def multilabel_graph():
    from gnn_tpu.data.synthetic import make_powerlaw_graph
    return make_powerlaw_graph(num_nodes=1000, avg_degree=10, num_feats=16,
                               num_classes=5, seed=1, multilabel=True)

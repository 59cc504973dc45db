"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware (the standard JAX
trick; SURVEY §4 'multi-host' testing note)."""

import os

# Force CPU: the session env pins JAX to the TPU tunnel ("axon"), which would
# run eager test code remotely (slow) and with TPU matmul precision (bf16
# inputs) that breaks the golden allclose gates.  NOTE this environment's JAX
# build ignores the JAX_PLATFORMS env var (the axon plugin wins platform
# selection), so the config API must be used before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two test tiers: anything not marked ``full`` is ``smoke`` (the <90 s
    dev loop); the driver's gate runs everything."""
    for item in items:
        if item.get_closest_marker("full") is None:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    import jax

    backend = jax.default_backend()
    assert backend == "cpu", (
        f"tests must run on the virtual CPU mesh, got backend={backend!r} "
        f"(JAX initialized before conftest could set JAX_PLATFORMS?)"
    )

from incagg_gnn_tpu.graph.datasets import make_sbm  # noqa: E402


@pytest.fixture(scope="session")
def sbm_tiny():
    data, in_c, out_c = make_sbm(num_nodes=400, num_classes=4, num_features=16,
                                 avg_degree=8.0, seed=1)
    return data, in_c, out_c


@pytest.fixture(scope="session")
def sbm_small():
    data, in_c, out_c = make_sbm(num_nodes=2000, num_classes=8, num_features=32,
                                 avg_degree=10.0, seed=2)
    return data, in_c, out_c


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# If the axon TPU-tunnel plugin was registered by sitecustomize (it hooks in
# whenever PALLAS_AXON_POOL_IPS is set), deregister it: its relay serializes
# across processes (minutes-long init under contention) and degrades matmul
# precision even for the "cpu" platform. Tests must run on the local CPU
# backend only.
if os.environ.get("_AXON_REGISTERED"):
    import jax
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # axon.register imports jax at interpreter start, so jax captured
    # JAX_PLATFORMS from the pre-conftest environment ("axon,cpu"); the
    # os.environ write above is then too late. Force the config directly.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

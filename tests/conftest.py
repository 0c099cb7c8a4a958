"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Mirrors SURVEY.md §4(d): mesh/sharding tests run on
`--xla_force_host_platform_device_count=8` with JAX_PLATFORMS=cpu, so no
TPU slice is needed to validate multi-chip code paths.
"""

import os

# Force CPU even if the session env points at a TPU platform: unit tests
# validate numerics (full f32) and virtual-mesh sharding, not TPU perf.
os.environ["JAX_PLATFORMS"] = "cpu"
# The CPU test run is NOT the relay, even when the session env carries
# the relay marker — relay-gated behavior (prefetch disable, canvas-LRU
# sizing, parked-cell skip) must default to the non-relay path here;
# tests that exercise the relay gates set the marker / monkeypatch
# is_axon_relay explicitly (test_compiled_fused.py, test_continuous.py).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var above may be captured too late — force the platform via config
# (effective as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    platforms = {d.platform for d in jax.devices()}
    assert platforms == {"cpu"}, f"tests must run on CPU, got {platforms}"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def cpu_mesh():
    from vstar_tpu.core.mesh import make_mesh
    return make_mesh((2, 2, 2))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)

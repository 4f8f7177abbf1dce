"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against a virtual 8-device CPU mesh instead (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_configure(config):
    """Re-exec once with the axon TPU plugin disabled.

    The environment ships JAX_PLATFORMS=axon (TPU tunnel) as the global
    default and a sitecustomize that registers the axon PJRT plugin in
    every interpreter — which can stall even CPU work when the tunnel is
    unhealthy, and silently routes "CPU" tests through the tunnel. Tests
    must run on local CPU with 8 virtual devices, so on first entry we
    re-exec the interpreter with the axon site stripped. Capture is
    suspended first so the child inherits the real stdout/stderr fds.
    """
    if os.environ.get("_VOTENET_TPU_TEST_REEXEC") == "1":
        return
    env = dict(os.environ)
    env["_VOTENET_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the axon sitecustomize
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if "axon" not in p
    )
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

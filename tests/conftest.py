"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
to expose 8 devices (the driver separately dry-runs the multi-chip path via
__graft_entry__.dryrun_multichip). Env vars must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env forces 'axon' (TPU): override
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start, before this file runs, so
# the env var alone is too late — force the platform through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

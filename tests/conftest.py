"""Test configuration.

Tests run JAX on a virtual 8-device CPU mesh so multi-chip sharding code is
exercised without TPU hardware (the driver separately dry-runs the multichip
path; bench.py runs on the real chip).
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import uuid

import pytest


@pytest.fixture
def unique_direction():
    """A unique frame-bus direction name so parallel tests never collide."""
    return f"test_{uuid.uuid4().hex[:12]}"

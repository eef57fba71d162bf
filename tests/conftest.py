"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; the JAX-idiomatic substitute is a
host-platform device farm (``--xla_force_host_platform_device_count``), which
exercises real sharding/collective code paths on one machine.
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

# The container's sitecustomize force-registers a remote TPU platform with a
# slow tunnel handshake; pin tests to the local CPU backend.
jax.config.update("jax_platforms", "cpu")

# Make the reference implementation importable for cross-impl parity tests.
_REFERENCE_PATH = "/root/reference"
if os.path.isdir(_REFERENCE_PATH) and _REFERENCE_PATH not in sys.path:
    sys.path.append(_REFERENCE_PATH)

import pytest  # noqa: E402


def has_reference() -> bool:
    try:
        import minigrid  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference gym-minigrid not importable"
)

"""Test harness: force an 8-virtual-device CPU platform and float64.

The TPU solvers are platform-agnostic traced code; tests run them on CPU
(with x64 for tight-tolerance oracles) and validate multi-chip sharding on
the virtual mesh.  The driver's bench runs on the real chip.
"""

import os

# Must be set before the XLA CPU client initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np
    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    return Mesh(devs, ("dp", "tp"))

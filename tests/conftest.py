"""Test configuration: force CPU with a virtual 8-device platform.

Multi-device sharding tests run on simulated CPU devices
(``--xla_force_host_platform_device_count=8``) — the standard way to test
pjit/mesh code without real TPU chips (SURVEY.md §4). The config.update
call overrides the environment's ``JAX_PLATFORMS=axon`` (the tunneled TPU)
so the suite is hermetic and fast.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixture_data():
    """The reference test fixture (test/datatest.jld2 → npz): x (1000, 5),
    θ (1000, 1) with θ ∈ {−1, 2}."""
    path = os.path.join(os.path.dirname(__file__), "fixtures", "datatest.npz")
    dat = np.load(path)
    return dat["x"], dat["theta"]

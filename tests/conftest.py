"""Test harness config: force CPU JAX with a virtual 8-device mesh so that
multi-chip sharding tests run anywhere (the driver validates real TPU
separately)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFDATA = pathlib.Path("/root/reference/demofiles")


@pytest.fixture(scope="session")
def rinex_path():
    p = REFDATA / "nist1860.18n"
    if not p.exists():
        pytest.skip("reference RINEX fixture not available")
    return str(p)


@pytest.fixture(scope="session")
def handoff_path():
    p = REFDATA / "handoff_params_usrp6.csv"
    if not p.exists():
        pytest.skip("reference handoff fixture not available")
    return str(p)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

"""Test harness config: force CPU JAX with a virtual 8-device mesh so that
multi-chip sharding tests run anywhere (the driver validates real TPU
separately)."""

import os

# jax is pre-imported at interpreter startup in this environment, so env vars
# are too late; force the CPU backend through the config API instead (before
# any backend is initialized).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

# Large FFT compiles are slow; cache compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/navlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

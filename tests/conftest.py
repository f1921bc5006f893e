"""Test harness: CPU backend with an 8-device virtual mesh and float64.

Multi-chip sharding is validated without real chips via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 "multi-host tests
on a CPU mesh"); float64 lets the kernels be compared to the Octave/C++
reference math at full precision.
"""

import os

# Force the CPU backend: the session environment pins JAX_PLATFORMS to the
# tunneled TPU ("axon"), which must not be grabbed by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"
# Disable the on-disk replica-bank cache ("" = off): tests build many
# distinct banks and would otherwise litter ~/.cache with ~300 MB entries
# (the dedicated cache test overrides this with a tmp dir).
os.environ["TWSTFT_BANK_CACHE"] = ""

import jax  # noqa: E402

# The axon bootstrap (sitecustomize) overrides jax_platforms to
# "axon,cpu" at interpreter start; force plain CPU after the fact.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from amaranth_twstft_tpu.config import SignalConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> SignalConfig:
    """A scaled-down signal keeping every structural ratio of production:
    2 samples/chip, 1000-chip code -> L=2000 samples/code, 50 codes/s."""
    return SignalConfig(
        fs=1e5,
        chip_rate=5e4,
        code_len=1000,
        bit_len=10,
        taps=9,  # not necessarily maximal for 10 bits; fine for fixtures
    )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)

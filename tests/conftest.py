"""Test harness config: CPU backend with 8 virtual devices (the standard
JAX fake-multi-device technique, survey §4) and float64 enabled for
parity-mode testing. Must run before the first jax import."""

import os

# The container profile pins JAX_PLATFORMS=axon (the TPU tunnel), and the
# axon plugin ignores env overrides — force CPU through the config API
# before any backend is initialized. XLA_FLAGS must still be set before
# the jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig
from apvast_tpu.utils.rir import synthetic_rirs


@pytest.fixture(scope="session")
def small_scene():
    """A fast scene: 4 srcs, 3 mics, 120-tap RIRs, small block."""
    rir_a = synthetic_rirs(120, 4, 3, seed=1)
    rir_b = synthetic_rirs(120, 4, 3, seed=2)
    config = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=128,
        filter_length=16,
        modeling_delay=5,
        reference_index_a=1,
        reference_index_b=2,
        num_eigenvectors=6,
        mu=1.0,
        statistics_buffer_length=160,
        sampling_rate=8000,
        perceptual=False,
    )
    return config, rir_a, rir_b


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The session environment pre-initializes JAX on the TPU backend via a
sitecustomize hook *before* any conftest code runs, so setting env vars here
is too late. Instead: clear the already-initialized backends, then flip the
platform/device-count configs so the next resolution lands on an 8-device
CPU — the TPU-equivalent of a fake backend for multi-device sharding tests
(SURVEY.md section 4 implication).
"""

import jax
from jax.extend import backend as _jexb

_jexb.clear_backends()
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

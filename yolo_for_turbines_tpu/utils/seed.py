"""Seeding (reference: code/utils.py:850-860).

JAX is functionally random (explicit PRNG keys), so unlike the reference
there is no hidden device RNG state to pin; this seeds numpy for the host
data pipeline and returns a root jax key for parameter init.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 424242):
    """Seed host RNGs; returns a jax.random.PRNGKey(seed)."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)

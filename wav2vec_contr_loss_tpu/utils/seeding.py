"""Seeding helpers.

JAX randomness is explicit (threaded PRNG keys), so unlike the reference
(reference: stage1_utils.py:14-18 seeding four global generators) only the
host-side numpy/python state needs pinning — device randomness is derived
from `jax.random.PRNGKey(seed)` at the call sites.
"""

from __future__ import annotations

import random

import numpy as np

__all__ = ["set_seed"]


def set_seed(seed: int) -> np.random.Generator:
    """Seed host RNGs; returns a fresh np Generator for pipeline use."""
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)

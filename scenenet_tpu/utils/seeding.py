"""Deterministic seeding (reference ``utils/scripts_utils.py:32-37``).

JAX is functionally seeded (explicit PRNG keys); this seeds the host-side
numpy/python RNGs used for init draws, splits and shuffles.
"""

from __future__ import annotations

import random

import numpy as np


def fix_randomness(seed: int = 0) -> np.random.Generator:
    np.random.seed(seed)
    random.seed(seed)
    return np.random.default_rng(seed)

"""Seed discipline.

The reference calls Dassl's ``set_random_seed`` (reference train.py:155-157)
to seed python/numpy/torch.  Here the model path is pure-functional JAX, so
the only ambient RNG state is python/numpy used by the data pipeline
(few-shot sampling, shuffling, augmentation); JAX keys are threaded
explicitly.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def new_rng(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)

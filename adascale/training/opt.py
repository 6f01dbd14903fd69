"""Training utilities (reference training/opt.py:19-57, TPU-flavored).

``batch_to_device``/cudnn toggles have no analogue: device placement is
handled by jit shardings (adascale.parallel), and determinism is the default
under XLA. Seeding covers python/numpy/JAX PRNG with the reference's default
seeds.
"""
from __future__ import annotations

import random
from typing import Tuple

import jax
import numpy as np


def setup_seeds(
    random_seed: int = 13370,
    numpy_seed: int = 1337,
    jax_seed: int = 133,
) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key
    (reference training/opt.py:40-49; torch_seed -> jax_seed)."""
    random.seed(random_seed)
    np.random.seed(numpy_seed)
    return jax.random.PRNGKey(jax_seed)


def calculate_iterable_dataset_num_samples(batch_size: int, num_batches: int) -> int:
    return batch_size * num_batches

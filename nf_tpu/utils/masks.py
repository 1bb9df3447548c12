"""Binary mask builders (reference ``normflows/utils/masks.py:4,20,35``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_alternating_binary_mask(features, even=True, dtype=jnp.float32):
    """Alternating 1010.../0101... mask of length ``features``."""
    idx = jnp.arange(features)
    start = 0 if even else 1
    return ((idx % 2) == (start % 2)).astype(dtype)


def create_mid_split_binary_mask(features, dtype=jnp.float32):
    """Ones on the first ceil(features/2) entries, zeros after."""
    midpoint = features // 2 if features % 2 == 0 else features // 2 + 1
    return (jnp.arange(features) < midpoint).astype(dtype)


def create_random_binary_mask(features, key, dtype=jnp.float32):
    """Random mask with ceil(features/2) ones."""
    num_ones = features // 2 if features % 2 == 0 else features // 2 + 1
    perm = jax.random.permutation(key, features)
    mask = jnp.zeros(features, dtype)
    return mask.at[perm[:num_ones]].set(1.0)

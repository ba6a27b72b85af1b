"""Uniform-ball point sampling for the target-network input.

Reproduces the behaviour of the reference ``utils/points.py``:

* ``generate_points_from_uniform_distribution`` (points.py:8-13): rejection
  sampling of uniform points in the open unit ball. Under ``jit`` rejection
  loops are not traceable, so we offer two fixed-shape equivalents that give
  the *same distribution*:
    - ``"exact"`` (default): radius ``u^(1/3)`` times a uniformly random
      direction — exactly uniform in the ball, no waste.
    - ``"rejection"``: oversample 3x in [-1, 1]^3 and stably select the first
      N in-ball points (the reference's procedure with a fixed draw count;
      P(fewer than N of 3N land inside) is ~0 for N >= 64).
* ``progressive_normalize`` (points.py:20-32): during the first
  ``max_epoch`` epochs, points with norm below ``coef = linspace(0, 1,
  max_epoch)[epoch-1]`` are pushed out onto the sphere of radius ``coef``.
  ``epoch`` is a traced scalar so changing it never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_uniform_ball(key: jax.Array, num_points: int, dim: int = 3, *, method: str = "exact", dtype=jnp.float32) -> jax.Array:
    """Sample ``num_points`` points uniformly from the open unit ball."""
    if method == "exact":
        kd, kr = jax.random.split(key)
        direction = jax.random.normal(kd, (num_points, dim), dtype=dtype)
        direction = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
        radius = jax.random.uniform(kr, (num_points, 1), dtype=dtype) ** (1.0 / dim)
        return direction * radius
    if method == "rejection":
        oversample = 3 * num_points
        pts = jax.random.uniform(key, (oversample, dim), dtype=dtype, minval=-1.0, maxval=1.0)
        outside = jnp.linalg.norm(pts, axis=1) >= 1.0
        # Stable sort on the out-of-ball flag keeps in-ball points in draw
        # order, matching the reference's "first N accepted" semantics.
        order = jnp.argsort(outside, stable=True)
        return pts[order[:num_points]]
    raise ValueError(f"unknown ball-sampling method: {method!r}")


def sample_uniform_ball_batch(
    key: jax.Array, batch: int, num_points: int, dim: int = 3, *, method: str = "exact", dtype=jnp.float32
) -> jax.Array:
    """Batched ball sampling -> (batch, num_points, dim).

    Each batch element gets an independent point set — the TPU-native
    replacement for the reference's per-sample CPU sampling + H2D copy loop
    (full_model.py:70-74).
    """
    if method == "exact":
        kd, kr = jax.random.split(key)
        direction = jax.random.normal(kd, (batch, num_points, dim), dtype=dtype)
        direction = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
        radius = jax.random.uniform(kr, (batch, num_points, 1), dtype=dtype) ** (1.0 / dim)
        return direction * radius
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_uniform_ball(k, num_points, dim, method=method, dtype=dtype))(keys)


def progressive_normalize(points: jax.Array, epoch: jax.Array, max_epoch: int) -> jax.Array:
    """Push points with norm < coef onto the sphere of radius coef.

    ``coef = linspace(0, 1, max_epoch)[epoch - 1]`` for ``epoch <= max_epoch``
    else 1 (reference utils/points.py:20-32). ``epoch`` may be traced.
    """
    epoch = jnp.asarray(epoch, dtype=points.dtype)
    denom = max(max_epoch - 1, 1)
    coef = jnp.where(epoch <= max_epoch, (epoch - 1.0) / denom, 1.0)
    norms = jnp.linalg.norm(points, axis=-1, keepdims=True)
    inside = norms < coef
    pushed = coef * points / jnp.maximum(norms, 1e-12)
    return jnp.where(inside, pushed, points)


def generate_target_network_input(
    config: dict,
    key: jax.Array,
    epoch: jax.Array,
    num_points: int,
    *,
    method: str = "exact",
) -> jax.Array:
    """Config-driven sampler matching reference ``generate_points`` (points.py:16-36).

    ``config`` is the model's ``target_network_input`` section:
    ``{"normalization": {"enable": bool, "type": "progressive", "epoch": E}}``.
    """
    pts = sample_uniform_ball(key, num_points, method=method)
    norm_cfg = config.get("normalization", {})
    if norm_cfg.get("enable") and norm_cfg.get("type") == "progressive":
        pts = progressive_normalize(pts, epoch, int(norm_cfg["epoch"]))
    return pts


def generate_target_network_input_batch(
    config: dict,
    key: jax.Array,
    epoch: jax.Array,
    batch: int,
    num_points: int,
    *,
    method: str = "exact",
) -> jax.Array:
    """Batched config-driven sampler -> (batch, num_points, 3)."""
    pts = sample_uniform_ball_batch(key, batch, num_points, method=method)
    norm_cfg = config.get("normalization", {})
    if norm_cfg.get("enable") and norm_cfg.get("type") == "progressive":
        pts = progressive_normalize(pts, epoch, int(norm_cfg["epoch"]))
    return pts

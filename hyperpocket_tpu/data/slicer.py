"""Random-plane point-cloud slicer (the "pocket" generator).

Reproduces reference ``datasets/utils/dataset_generator.py:4-39``: draw a
plane through three uniform [0,1)^3 points, repeat until exactly
``target_partition_points`` points fall on one side; return (existing,
missing) with the exact-size side first. Host-side numpy — preprocessing is
offline by design; the device path stays fixed-shape (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np


class HyperPlane:
    def __init__(self, params: np.ndarray, bias: float):
        self.params = params
        self.bias = bias

    def check_point(self, points: np.ndarray) -> np.ndarray:
        return np.sign(points @ self.params + self.bias)

    @staticmethod
    def from_3_points(points: np.ndarray) -> "HyperPlane":
        normal = np.cross(points[1] - points[0], points[2] - points[0])
        return HyperPlane(normal, np.dot(normal, points[0]))

    @staticmethod
    def random(rng: np.random.Generator | None = None) -> "HyperPlane":
        draw = rng.random((3, 3)) if rng is not None else np.random.rand(3, 3)
        return HyperPlane.from_3_points(draw)

    def __repr__(self):
        return f"HyperPlane(A={self.params[0]}, B={self.params[1]}, C={self.params[2]}, D={self.bias})"


def slice_point_cloud_device(
    points,
    key,
    target_partition_points: int = 1024,
):
    """Jittable device-side plane slicer -> (existing, missing), both fixed-shape.

    Device analogue of :func:`slice_point_cloud` (BASELINE.json north star:
    "dataset pocket-splitting ... moves into a device-side preprocessing
    path"): a ``lax.while_loop`` redraws random planes until one side holds
    exactly ``target_partition_points`` points; a stable argsort on the side
    flag then partitions without any ragged shapes. Semantics mirror the
    reference's rejection loop (dataset_generator.py:29-39): plane through
    three U[0,1)^3 points, side test ``sign(p.n + bias) > 0``, and the
    exact-count side is returned first.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    points = jnp.asarray(points)
    n = points.shape[0]
    target = target_partition_points

    def draw(key):
        key, sub = jax.random.split(key)
        three = jax.random.uniform(sub, (3, 3), points.dtype)
        normal = jnp.cross(three[1] - three[0], three[2] - three[0])
        bias = jnp.dot(normal, three[0])
        under = jnp.sign(points @ normal + bias) > 0
        return key, under, jnp.sum(under)

    def cond(state):
        _, _, n_under = state
        return jnp.logical_and(n_under != target, (n - n_under) != target)

    def body(state):
        key, _, _ = state
        return draw(key)

    key, under, n_under = lax.while_loop(cond, body, draw(key))
    # put the exact-count side first (reference returns it as `existing`)
    first_is_under = n_under == target
    flag = jnp.where(first_is_under, under, ~under)
    order = jnp.argsort(~flag, stable=True)  # flagged points first, in order
    shuffled = points[order]
    return shuffled[:target], shuffled[target:]


def slice_point_cloud(
    points: np.ndarray,
    target_partition_points: int = 1024,
    rng: np.random.Generator | None = None,
    max_tries: int = 100_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Rejection-sample planes until one side has exactly the target count.

    Note the reference's acceptance test is on *bias* ``> 0`` vs ``not > 0``;
    sign(0) points land on the "above" side, matching
    dataset_generator.py:31-39.
    """
    for _ in range(max_tries):
        under = HyperPlane.random(rng).check_point(points) > 0
        n_under = int(under.sum())
        if n_under == target_partition_points:
            return points[under], points[~under]
        if len(points) - n_under == target_partition_points:
            return points[~under], points[under]
    raise RuntimeError(
        f"no plane produced an exact {target_partition_points}-point side in {max_tries} tries"
    )

"""Target network: a tiny per-sample MLP decoded from a flat weight vector.

Matches reference ``model/target_network.py:6-45``: channels
``3 -> layer_out_channels... -> 3``; each layer's weights are sliced from the
flat vector as a row-major (out, in) matrix followed (if use_bias) by the
bias; hidden layers use ReLU, the output layer is linear.

TPU-first: the reference instantiates B separate nn.Modules in a Python loop
(full_model.py:70-74) — the #1 perf sin. Here the decode is a *function* of
``(flat_weights, points)`` and the batch dimension is handled by ``vmap``,
turning the whole decode into a chain of batched einsums on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _layer_shapes(layer_out_channels: list[int]) -> list[tuple[int, int]]:
    ch = [3] + list(layer_out_channels) + [3]
    return [(ch[i], ch[i - 1]) for i in range(1, len(ch))]  # (out, in), torch layout


def target_network_forward(
    flat_weights: jax.Array,
    points: jax.Array,
    layer_out_channels: list[int],
    use_bias: bool = True,
) -> jax.Array:
    """Decode one cloud: flat_weights (W,), points (N, 3) -> (N, 3).

    Slicing order mirrors TargetNetwork._get_layer_data
    (target_network.py:40-45): weight block then bias block per layer.
    """
    shapes = _layer_shapes(layer_out_channels)
    x = points
    offset = 0
    for li, (out_ch, in_ch) in enumerate(shapes):
        w = flat_weights[offset : offset + out_ch * in_ch].reshape(out_ch, in_ch)
        offset += out_ch * in_ch
        x = x @ w.T
        if use_bias:
            x = x + flat_weights[offset : offset + out_ch]
            offset += out_ch
        if li < len(shapes) - 1:
            x = jax.nn.relu(x)
    if offset != flat_weights.shape[0]:
        raise ValueError(
            f"flat weight vector not fully consumed: used {offset} of {flat_weights.shape[0]}"
        )
    return x


def batched_target_network_forward(
    flat_weights: jax.Array,
    points: jax.Array,
    layer_out_channels: list[int],
    use_bias: bool = True,
) -> jax.Array:
    """Batched decode: (B, W) x (B, N, 3) -> (B, N, 3), one vmap'd einsum chain."""
    fn = lambda w, p: target_network_forward(w, p, layer_out_channels, use_bias)
    return jax.vmap(fn)(flat_weights, points)

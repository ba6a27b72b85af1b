"""Hypernetwork: latent -> flat weight vector of the per-sample target network.

Architecture matches reference ``model/hyper_network.py:6-43``: an MLP trunk
``Z -> 64 -> 128 -> 512 -> 1024 -> 2048`` (ReLU between layers, none after the
last) followed by one Linear head per target-network layer, emitting that
layer's flattened weights (and bias); head outputs are concatenated in layer
order.

``freeze_layers_learning`` replicates the reference quirk: frozen heads are
kept as a plain Python list in torch, so they (a) keep torch's *default*
Linear init (never touched by ``weights_init``) and (b) are excluded from the
optimizer (model/hyper_network.py:37-39, full_model.py's ``parameters``).
Here frozen heads are initialised with ``torch_default_linear`` and wrapped in
``lax.stop_gradient`` during the forward pass.

TPU-first: the heads are mathematically one big Linear ``2048 -> sum(sizes)``;
we fuse them into a single weight matrix at init so the forward pass is one
MXU matmul instead of len(layers) small ones. Per-head slices remain
addressable via ``head_slices`` for tests/introspection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hyperpocket_tpu.models.initializers import apply_dense, dense_params, torch_default_linear

_TRUNK_SIZES = (64, 128, 512, 1024, 2048)


def target_layer_sizes(layer_out_channels: list[int], use_bias: bool) -> list[int]:
    """Per-layer flattened parameter counts, in the reference's head order.

    Channels run ``[3] + layer_out_channels + [3]``; layer x consumes
    ``(in + use_bias) * out`` values (model/hyper_network.py:13-14,32-35).
    """
    ch = [3] + list(layer_out_channels) + [3]
    bias = int(use_bias)
    return [(ch[i - 1] + bias) * ch[i] for i in range(1, len(ch))]


def target_weight_count(layer_out_channels: list[int], use_bias: bool) -> int:
    return sum(target_layer_sizes(layer_out_channels, use_bias))


def init_hyper_network(
    key: jax.Array,
    input_size: int,
    layer_out_channels: list[int],
    *,
    use_bias: bool = True,
    target_network_use_bias: bool = True,
    freeze_heads: bool = False,
    dtype=jnp.float32,
) -> dict:
    sizes = target_layer_sizes(layer_out_channels, target_network_use_bias)
    keys = jax.random.split(key, len(_TRUNK_SIZES) + len(sizes))
    dims = (input_size,) + _TRUNK_SIZES
    trunk = [dense_params(keys[i], dims[i], dims[i + 1], use_bias, dtype) for i in range(len(_TRUNK_SIZES))]
    head_ws, head_bs = [], []
    for i, size in enumerate(sizes):
        if freeze_heads:
            w, b = torch_default_linear(keys[len(_TRUNK_SIZES) + i], 2048, size, dtype)
        else:
            p = dense_params(keys[len(_TRUNK_SIZES) + i], 2048, size, True, dtype)
            w, b = p["w"], p["b"]
        head_ws.append(w)
        head_bs.append(b)
    # Fuse heads into one (2048, sum(sizes)) matmul.
    heads = {"w": jnp.concatenate(head_ws, axis=1), "b": jnp.concatenate(head_bs, axis=0)}
    return {"trunk": trunk, "heads": heads}


def head_slices(layer_out_channels: list[int], use_bias: bool) -> list[slice]:
    sizes = target_layer_sizes(layer_out_channels, use_bias)
    out, start = [], 0
    for s in sizes:
        out.append(slice(start, start + s))
        start += s
    return out


def hyper_network_forward(params: dict, latent: jax.Array, *, freeze_heads: bool = False,
                          stop_head_weight_grad: bool = False,
                          head_delta: jax.Array | None = None,
                          return_trunk: bool = False):
    """latent (B, Z) -> flat target-network weights (B, sum(sizes)).

    ``stop_head_weight_grad`` + ``head_delta`` + ``return_trunk`` are the
    fused-head-Adam taps (ops/pallas_head_adam.py): W's AD gradient is cut
    (its dW would only be materialised then re-read by the optimizer), a
    zero ``delta`` added to the head output yields the cotangent d_flat
    instead, and the trunk activations ``h`` come back so the fused kernel
    can form dW = h^T d_flat tile-wise. The head BIAS keeps its normal AD
    path (its gradient is tiny).
    """
    h = latent
    n = len(params["trunk"])
    for i, layer in enumerate(params["trunk"]):
        h = apply_dense(layer, h)
        if i < n - 1:
            h = jax.nn.relu(h)
    heads = params["heads"]
    if freeze_heads:
        heads = lax.stop_gradient(heads)
    elif stop_head_weight_grad:
        heads = {**heads, "w": lax.stop_gradient(heads["w"])}
    flat = apply_dense(heads, h)
    if head_delta is not None:
        flat = flat + head_delta.astype(flat.dtype)
    return (flat, h) if return_trunk else flat

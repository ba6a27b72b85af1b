"""PointNet-style encoder.

Architecture matches reference ``model/encoder.py:5-53``:
five pointwise conv layers 3->64->128->256->512->512 (ReLU between, none
after the last), global max-pool over points, FC 512->512 + ReLU, then a
``mu`` head and (VAE only) a ``std`` head.

TPU-first: a Conv1d with kernel size 1 *is* a per-point Dense, so the whole
conv stack is a chain of (B, N, C) matmuls that XLA maps straight onto the
MXU — no im2col, no layout shuffles. Inputs are the natural (B, N, 3).

VAE semantics replicate the reference quirk exactly: the ``std`` head output
is treated as log-sigma, reparameterisation is ``eps * exp(raw) + mu``
(encoder.py:38-41), and the *third* return value is ``sigma = exp(raw)``
(encoder.py:43-51) — downstream KLD consumes that value as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyperpocket_tpu.models.initializers import apply_dense, dense_params

_CONV_CHANNELS = (3, 64, 128, 256, 512, 512)


def init_encoder(key: jax.Array, output_size: int, use_bias: bool = True, dtype=jnp.float32) -> dict:
    """Initialise encoder params (post-weights_init state of the reference)."""
    keys = jax.random.split(key, len(_CONV_CHANNELS) + 2)
    conv = [
        dense_params(keys[i], _CONV_CHANNELS[i], _CONV_CHANNELS[i + 1], use_bias, dtype)
        for i in range(len(_CONV_CHANNELS) - 1)
    ]
    # fc / mu / std always have biases in the reference (encoder.py:31-37)
    fc = dense_params(keys[-3], 512, 512, True, dtype)
    mu = dense_params(keys[-2], 512, output_size, True, dtype)
    std = dense_params(keys[-1], 512, output_size, True, dtype)
    return {"conv": conv, "fc": fc, "mu": mu, "std": std}


def _trunk(params: dict, x: jax.Array, *, fast: bool = False) -> jax.Array:
    """x (B, N, 3) -> pooled features (B, 512).

    ``fast=True`` (inference paths only) dispatches the conv stack +
    max-pool to the fused Pallas kernel (ops/pallas_encoder.py): weights and
    one row tile stay resident in VMEM, so the (B, N, 512) activations never
    touch HBM. The training path keeps this XLA chain so autodiff sees a
    plain differentiable graph.
    """
    # the fused kernel pays off only in bf16, where the XLA chain is
    # HBM-bound; fp32-highest is MXU-pass-bound and fusion measured neutral
    if fast and x.dtype == jnp.bfloat16 and x.shape[1] % 8 == 0:
        from hyperpocket_tpu.ops.pallas_encoder import trunk_pooled

        pooled = trunk_pooled(
            params["conv"], x, interpret=jax.default_backend() != "tpu"
        )
    else:
        h = x
        n_layers = len(params["conv"])
        for i, layer in enumerate(params["conv"]):
            h = apply_dense(layer, h)
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        pooled = jnp.max(h, axis=1)  # global max over points (encoder.py:44)
    return jax.nn.relu(apply_dense(params["fc"], pooled))


def reparameterize(key: jax.Array, mu: jax.Array, raw_std: jax.Array) -> jax.Array:
    """z = eps * exp(raw_std) + mu (reference encoder.py:38-41).

    eps is always drawn in fp32 then cast: bf16 normal sampling would draw
    *different* values (not rounded fp32 ones), making the mixed-precision
    mode non-comparable to fp32 under the same key.
    """
    eps = jax.random.normal(key, mu.shape, jnp.float32).astype(mu.dtype)
    return eps * jnp.exp(raw_std) + mu


def encoder_forward(params: dict, x: jax.Array, *, is_vae: bool,
                    key: jax.Array | None = None, fast: bool = False):
    """Forward pass.

    Returns ``mu`` (B, Z) when not VAE; else ``(z, mu, sigma)`` where
    ``sigma = exp(std_head(x))`` — mirroring the reference's return of
    ``torch.exp(logvar)`` as the third value (encoder.py:47-51).
    ``fast`` selects the fused no-grad trunk kernel (inference only).
    """
    logit = _trunk(params, x, fast=fast)
    mu = apply_dense(params["mu"], logit)
    if not is_vae:
        return mu
    raw_std = apply_dense(params["std"], logit)
    if key is None:
        raise ValueError("VAE encoder forward requires a PRNG key")
    z = reparameterize(key, mu, raw_std)
    return z, mu, jnp.exp(raw_std)

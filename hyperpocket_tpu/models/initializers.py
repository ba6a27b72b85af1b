"""Weight initialisers matching the reference's torch init semantics.

* ``xavier_relu``: xavier-uniform with ReLU gain sqrt(2) and zero biases —
  what ``core/setup.py:63-77`` (weights_init) applies to every Conv/Linear.
* ``torch_default_linear``: torch's default ``nn.Linear`` reset
  (kaiming-uniform a=sqrt(5) for weights -> U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
  same bound for biases) — the init that the *frozen* hypernetwork heads keep
  in the reference, because plain-list heads are invisible to
  ``model.apply(weights_init)`` (model/hyper_network.py:32-39).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_relu_weight(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> jax.Array:
    """U(-a, a) with a = gain * sqrt(6 / (fan_in + fan_out)), gain = sqrt(2).

    Returned shape is (fan_in, fan_out): we store weights input-major so the
    forward pass is ``x @ w`` (torch stores (out, in) and transposes).
    """
    gain = math.sqrt(2.0)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound)


def torch_default_linear(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """(weight (fan_in, fan_out), bias (fan_out,)) with torch nn.Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), dtype=dtype, minval=-bound, maxval=bound)
    return w, b


def dense_params(key: jax.Array, fan_in: int, fan_out: int, use_bias: bool, dtype=jnp.float32) -> dict:
    """Xavier-relu weight + zero bias (the post-weights_init state)."""
    p = {"w": xavier_relu_weight(key, fan_in, fan_out, dtype)}
    if use_bias:
        p["b"] = jnp.zeros((fan_out,), dtype)
    return p


def apply_dense(p: dict, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y

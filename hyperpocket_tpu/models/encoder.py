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


def _conv_stack(conv_params: list, x: jax.Array) -> jax.Array:
    """The five pointwise layers (ReLU between, none after the last)."""
    h = x
    n_layers = len(conv_params)
    for i, layer in enumerate(conv_params):
        h = apply_dense(layer, h)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h


@jax.custom_vjp
def _conv_pooled_sparse(conv_params: list, x: jax.Array) -> jax.Array:
    """conv stack + max-pool with a sparse-backward custom VJP.

    Identical primal to ``max(_conv_stack(...), axis=1)``. The backward
    exploits that the global max-pool routes cotangents to at most C_out
    (=512) of the N points per cloud: it gathers those "virtual rows" (one
    per output channel, via the pool's argmax), recomputes the stack on them
    only, and backprops C_out rows instead of N — ~2x fewer backward matmul
    FLOPs at N=1024 and ZERO saved activations (nothing (B, N, C)-sized is
    held for the backward). Gather/scatter ride the MXU as one-hot
    contractions (TPU row gathers serialize; see ops/chamfer.py).

    Tie semantics: cotangents route to the FIRST argmax row — matching
    torch's max backward (the reference trains through torch.max,
    model/encoder.py:44); plain jnp.max splits ties evenly instead. Ties
    have measure zero on real clouds.
    """
    return jnp.max(_conv_stack(conv_params, x), axis=1)


def _cps_fwd(conv_params, x):
    h = _conv_stack(conv_params, x)
    return jnp.max(h, axis=1), (conv_params, x, jnp.argmax(h, axis=1).astype(jnp.int32))


def _cps_bwd(res, dpooled):
    conv_params, x, amax = res
    n = x.shape[1]
    n_layers = len(conv_params)
    onehot = jax.nn.one_hot(amax, n, dtype=x.dtype)  # (B, C_out, N)
    x_v = jnp.einsum("bcn,bnd->bcd", onehot, x)  # virtual rows (B, C_out, 3)
    # Recompute the stack on the virtual rows — same ops in the same order,
    # so activations (and bf16 roundings, hence relu masks) match the primal.
    pre, hs, h = [], [x_v], x_v
    for i, layer in enumerate(conv_params):
        a = apply_dense(layer, h)
        pre.append(a)
        h = jax.nn.relu(a) if i < n_layers - 1 else a
        hs.append(h)
    grads: list = [None] * n_layers
    # Last layer (no ReLU after): virtual row c carries cotangent only in
    # channel c — the diagonal structure collapses its dW/dh to elementwise
    # forms instead of (C_out x C_out)-dense contractions.
    w_last = conv_params[-1]["w"]  # (C_in, C_out)
    g_last = {"w": jnp.einsum("bci,bc->ic", hs[-2], dpooled)}
    if "b" in conv_params[-1]:
        g_last["b"] = jnp.sum(dpooled, axis=0)
    grads[-1] = g_last
    dh = dpooled[:, :, None] * w_last.T[None, :, :]  # (B, C_out, C_in)
    for i in range(n_layers - 2, -1, -1):
        dh = dh * (pre[i] > 0).astype(dh.dtype)  # ReLU mask after layer i
        g = {"w": jnp.einsum("brk,brc->kc", hs[i], dh)}
        if "b" in conv_params[i]:
            g["b"] = jnp.sum(dh, axis=(0, 1))
        grads[i] = g
        dh = jnp.einsum("brc,kc->brk", dh, conv_params[i]["w"])
    dx = jnp.einsum("bcn,bcd->bnd", onehot, dh)  # scatter-add virtual rows
    return grads, dx


_conv_pooled_sparse.defvjp(_cps_fwd, _cps_bwd)


@jax.custom_vjp
def _conv_pooled_sparse_fused(conv_params: list, x: jax.Array) -> jax.Array:
    """Flash-style trunk: fused Pallas forward + the sparse XLA backward.

    Same contract as ``_conv_pooled_sparse`` but the forward runs the fused
    trunk kernel (ops/pallas_encoder.py) so no (B, N, C) activation touches
    HBM; the kernel emits the pool's first-argmax for the backward's
    virtual-row routing. bf16-only (the kernel runs single-pass bf16 MXU
    dots; kernel-vs-XLA outputs agree to bf16 rounding, not bitwise, so this
    is gated to the bf16 compute mode whose convergence tolerance already
    absorbs rounding-level reroutes).
    """
    from hyperpocket_tpu.ops.pallas_encoder import trunk_pooled

    return trunk_pooled(conv_params, x, interpret=jax.default_backend() != "tpu")


def _cpsf_fwd(conv_params, x):
    from hyperpocket_tpu.ops.pallas_encoder import trunk_pooled_argmax

    pooled, amax = trunk_pooled_argmax(
        conv_params, x, interpret=jax.default_backend() != "tpu"
    )
    return pooled, (conv_params, x, amax)


_conv_pooled_sparse_fused.defvjp(_cpsf_fwd, _cps_bwd)


def _fused_train_fwd_enabled() -> bool:
    """Opt-in via HPCD_TRUNK_FUSED_FWD=1 (read at trace time).

    MEASURED NEUTRAL, so off by default: at B=64 N=1024 bf16 on a quiet v5e
    the fused forward saved only 0.054 ms of the 2.49 ms forward and the full
    step was 7.19 vs 7.14 ms (util_scripts/train_step_ab.py, interleaved
    in-process windows) — the XLA trunk chain at training shapes is already
    near its traffic floor and the argmax bookkeeping eats the fusion win.
    Kept (with tests) as the measured answer to the flash-style trunk-pair
    candidate; enabling also trades exact primal/recompute agreement for
    bf16-rounding-level agreement (see _conv_pooled_sparse_fused)."""
    import os

    return os.environ.get("HPCD_TRUNK_FUSED_FWD") == "1"


def _trunk(params: dict, x: jax.Array, *, fast: bool = False) -> jax.Array:
    """x (B, N, 3) -> pooled features (B, 512).

    ``fast=True`` (inference paths only) dispatches the conv stack +
    max-pool to the fused Pallas kernel (ops/pallas_encoder.py): weights and
    one row tile stay resident in VMEM, so the (B, N, 512) activations never
    touch HBM. The training path uses the sparse-backward VJP when the cloud
    has at least 2x C_out points (below that the virtual-row detour does not
    pay), else the plain differentiable chain.
    """
    # the fused kernel pays off only in bf16, where the XLA chain is
    # HBM-bound; fp32-highest is MXU-pass-bound and fusion measured neutral
    if fast and x.dtype == jnp.bfloat16 and x.shape[1] % 8 == 0:
        from hyperpocket_tpu.ops.pallas_encoder import trunk_pooled

        pooled = trunk_pooled(
            params["conv"], x, interpret=jax.default_backend() != "tpu"
        )
    elif x.shape[1] >= 2 * params["conv"][-1]["w"].shape[1]:
        if (x.dtype == jnp.bfloat16 and x.shape[1] % 8 == 0
                and _fused_train_fwd_enabled()):
            pooled = _conv_pooled_sparse_fused(params["conv"], x)
        else:
            pooled = _conv_pooled_sparse(params["conv"], x)
    else:
        pooled = jnp.max(_conv_stack(params["conv"], x), axis=1)  # encoder.py:44
    return jax.nn.relu(apply_dense(params["fc"], pooled))


def reparameterize(key: jax.Array | None, mu: jax.Array, raw_std: jax.Array,
                   eps: jax.Array | None = None) -> jax.Array:
    """z = eps * exp(raw_std) + mu (reference encoder.py:38-41).

    eps is always drawn in fp32 then cast: bf16 normal sampling would draw
    *different* values (not rounded fp32 ones), making the mixed-precision
    mode non-comparable to fp32 under the same key. An explicit ``eps``
    overrides the draw — the deterministic-injection hook used by the
    cross-framework trajectory-parity tests.
    """
    if eps is None:
        eps = jax.random.normal(key, mu.shape, jnp.float32)
    eps = jnp.asarray(eps).astype(mu.dtype)
    return eps * jnp.exp(raw_std) + mu


def encoder_forward(params: dict, x: jax.Array, *, is_vae: bool,
                    key: jax.Array | None = None, fast: bool = False,
                    eps: jax.Array | None = None):
    """Forward pass.

    Returns ``mu`` (B, Z) when not VAE; else ``(z, mu, sigma)`` where
    ``sigma = exp(std_head(x))`` — mirroring the reference's return of
    ``torch.exp(logvar)`` as the third value (encoder.py:47-51).
    ``fast`` selects the fused no-grad trunk kernel (inference only);
    ``eps`` injects the reparameterisation noise deterministically.
    """
    logit = _trunk(params, x, fast=fast)
    mu = apply_dense(params["mu"], logit)
    if not is_vae:
        return mu
    raw_std = apply_dense(params["std"], logit)
    if key is None and eps is None:
        raise ValueError("VAE encoder forward requires a PRNG key or explicit eps")
    z = reparameterize(key, mu, raw_std, eps=eps)
    return z, mu, jnp.exp(raw_std)

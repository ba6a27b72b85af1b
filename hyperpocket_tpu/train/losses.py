"""Training losses, replicated from the reference epoch loop.

* ``reconstruction_loss``: ``loss_coef * ChamferLoss(gt, rec)`` — the torch
  code wraps this in ``torch.mean`` but the Chamfer is already a scalar sum
  over batch and points, so the mean is a no-op (core/epoch_loops.py:25-26).
* ``kld_loss``: replicates core/epoch_loops.py:28-31 *exactly, quirk
  included*: the value the model hands over as "logvar" is actually
  ``sigma = exp(std_head)`` (model/encoder.py:43-51), and the epoch loop
  computes ``0.5 * sum(exp(sigma) + mu^2 - 1 - sigma) / batch`` on it. This
  is not the textbook Gaussian KLD, but it is the reference's training
  objective — we copy the math, not the names (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyperpocket_tpu.ops.pallas_nn import chamfer_loss_auto


def reconstruction_loss(gt: jax.Array, rec: jax.Array, loss_coef: float = 0.05) -> jax.Array:
    return loss_coef * chamfer_loss_auto(gt, rec)


def kld_loss(mu: jax.Array, sigma: jax.Array, batch_size: int) -> jax.Array:
    return 0.5 * jnp.sum(jnp.exp(sigma) + jnp.square(mu) - 1.0 - sigma) / batch_size

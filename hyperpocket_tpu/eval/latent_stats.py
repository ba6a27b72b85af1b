"""Empirical latent prior for generative experiments (framework extension).

The reference's generative experiments draw the missing-half code from an
isotropic ``N(mean, std)`` (core/experiments.py:40,86 — ``fixed.std`` is
0.13 in its 3D-EPN configs, which matches the per-dim spread of a trained
posterior's mu). But the training objective's KLD quirk
(core/epoch_loops.py:28-31, replicated in ``train/losses.py``) collapses
``sigma`` toward 0, so the learned codes live on a *correlated* shell —
isotropic draws land off that manifold and decode toward the blob prior
mean (measured in ``results/dress_rehearsal_r4/QUALITY.md``).

``fit_latent_gaussian`` encodes a corpus of missing halves and fits a full
covariance Gaussian to the resulting ``mu`` codes; sampling from it stays
on the learned manifold. This is an opt-in extension — every reference
experiment defaults to the reference's isotropic draw (PARITY.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LatentGaussian",
    "encode_missing_mus",
    "fit_latent_gaussian",
    "load_latent_gaussian",
    "save_latent_gaussian",
]


@dataclass(frozen=True)
class LatentGaussian:
    """Full-covariance Gaussian over the missing-half latent code."""

    mean: np.ndarray        # (Z,)
    scale_tril: np.ndarray  # (Z, Z) lower Cholesky of the covariance

    @property
    def dim(self) -> int:
        return int(self.mean.shape[0])

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        """(n, Z) draws: mean + eps @ scale_tril.T (jit-friendly)."""
        eps = jax.random.normal(key, (n, self.dim), jnp.float32)
        return jnp.asarray(self.mean) + eps @ jnp.asarray(self.scale_tril).T


def save_latent_gaussian(lg: LatentGaussian, path: str) -> None:
    """npz sidecar for serving (mean + covariance Cholesky)."""
    np.savez(path, mean=lg.mean, scale_tril=lg.scale_tril)


def load_latent_gaussian(path: str) -> LatentGaussian:
    with np.load(path) as z:
        return LatentGaussian(mean=np.asarray(z["mean"], np.float32),
                              scale_tril=np.asarray(z["scale_tril"], np.float32))


def encode_missing_mus(model, params, clouds: np.ndarray,
                       batch_size: int = 64) -> np.ndarray:
    """Encode missing-half clouds (N, M, 3) -> posterior means (N, Z).

    Batched through one jitted encoder call per full block; the ragged tail
    is padded to the block shape so exactly one shape compiles.
    """
    from hyperpocket_tpu.models.encoder import encoder_forward

    clouds = np.asarray(clouds, dtype=np.float32)
    n = clouds.shape[0]

    @jax.jit
    def mus(batch):
        _, mu, _ = encoder_forward(
            params["random_encoder"], batch, is_vae=True,
            key=jax.random.key(0), fast=True,
        )
        return mu

    out = []
    for start in range(0, n, batch_size):
        block = clouds[start : start + batch_size]
        pad = batch_size - block.shape[0]
        if pad:
            block = np.concatenate([block, np.repeat(block[-1:], pad, axis=0)])
        got = np.asarray(jax.device_get(mus(jnp.asarray(block))))
        out.append(got[: batch_size - pad] if pad else got)
    return np.concatenate(out, axis=0)


def collect_val_missing_halves(val_dict, max_items: int = 1024) -> np.ndarray:
    """Stack up to ``max_items`` REAL missing halves from the val datasets,
    split evenly across categories (3D-EPN/Completion3D test items carry a
    scalar placeholder at index 1; those are filtered out).

    Shared by ``run_experiments``'s ``experiments.latent_prior`` handling and
    ``serving fit-prior`` so the two fitting paths cannot drift. Raises
    ``ValueError`` when no item qualifies (Completion3D has the placeholder
    on every split)."""
    halves = []
    for ds in val_dict.values():
        take = min(len(ds), max(1, max_items // max(len(val_dict), 1)))
        halves.extend(np.asarray(ds[i][1], dtype=np.float32) for i in range(take))
    halves = [h for h in halves if h.ndim == 2]
    if not halves:
        raise ValueError(
            "latent prior: no val items with real missing halves to fit on "
            "(Completion3D has placeholders everywhere)"
        )
    return np.stack(halves)


def fit_latent_gaussian(model, params, missing_clouds: np.ndarray,
                        batch_size: int = 64,
                        shrinkage: float = 0.05) -> LatentGaussian:
    """Fit the empirical Gaussian of posterior means over ``missing_clouds``.

    ``shrinkage`` blends the sample covariance toward its diagonal
    (Ledoit-Wolf-style constant) so the Cholesky stays well-conditioned when
    the corpus is small relative to the latent dim.
    """
    mus = encode_missing_mus(model, params, missing_clouds, batch_size)
    mean = mus.mean(axis=0)
    centered = mus - mean
    denom = max(mus.shape[0] - 1, 1)
    cov = centered.T @ centered / denom
    diag = np.diag(np.diag(cov))
    cov = (1.0 - shrinkage) * cov + shrinkage * diag
    # jitter for strict positive-definiteness (rank-deficient tiny corpora)
    cov += np.eye(cov.shape[0], dtype=cov.dtype) * (1e-6 * float(np.trace(cov)) / cov.shape[0] + 1e-12)
    scale_tril = np.linalg.cholesky(cov)
    return LatentGaussian(mean=mean.astype(np.float32),
                          scale_tril=scale_tril.astype(np.float32))

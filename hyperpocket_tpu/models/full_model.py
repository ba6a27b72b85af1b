"""FullModel: mode resolution, latent fusion, hypernet -> batched decode.

Reproduces reference ``model/full_model.py``:

* mode resolution from encoder output sizes (full_model.py:29-42):
  both > 0 -> HyperPocket (VAE random encoder on *missing* + deterministic
  real encoder on *existing*); only random -> HyperCloud (VAE on existing);
  only real -> HyperRec.
* config completion (full_model.py:16-24): hypernetwork input size =
  random_size + real_size; target-network shape propagated.
* forward (full_model.py:54-80): latent -> hypernetwork -> per-sample target
  network over freshly sampled ball points. Training returns
  ``(reconstruction, sigma, mu)`` where sigma is the encoder's third output
  (``exp(std_head)``); eval returns reconstruction only.

TPU-first: the per-sample Python loop of the reference is replaced by
``sample_uniform_ball_batch`` + ``batched_target_network_forward`` (vmap),
so the decode is one fused batched einsum chain; everything is jittable with
``epoch`` traced. Clouds use the natural (B, N, 3) layout throughout (the
reference shuttles (B, 3, N); transposition happens only at artifact edges).

Mixed precision: ``compute_dtype="bfloat16"`` casts params + activations to
bf16 inside ``apply`` (MXU-native), while master params, the sampled ball
points' math, and everything returned to the loss path stay fp32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from hyperpocket_tpu.models.encoder import encoder_forward, init_encoder
from hyperpocket_tpu.models.hyper_network import (
    hyper_network_forward,
    init_hyper_network,
    target_weight_count,
)
from hyperpocket_tpu.models.target_network import batched_target_network_forward
from hyperpocket_tpu.ops.sampling import generate_target_network_input_batch

MODE_HYPER_POCKET = "hyper_pocket"
MODE_HYPER_REC = "hyper_rec"
MODE_HYPER_CLOUD = "hyper_cloud"


@dataclass(frozen=True)
class FullModel:
    """Static model description + pure init/apply functions.

    Build from a reference-schema config dict (``settings/*.json`` section
    ``full_model``) via :meth:`from_config`.
    """

    random_encoder_output_size: int
    real_encoder_output_size: int
    encoder_use_bias: bool
    hyper_use_bias: bool
    target_layer_out_channels: tuple[int, ...]
    target_use_bias: bool
    freeze_heads: bool
    target_network_input: dict = field(hash=False)
    ball_method: str = "exact"
    compute_dtype: str = "float32"

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "FullModel":
        random_size = int(config["random_encoder"]["output_size"])
        real_size = int(config["real_encoder"]["output_size"])
        if random_size <= 0 and real_size <= 0:
            raise ValueError("at least one encoder should have non zero output")
        return cls(
            random_encoder_output_size=random_size,
            real_encoder_output_size=real_size,
            encoder_use_bias=bool(config["random_encoder"].get("use_bias", True)),
            hyper_use_bias=bool(config["hyper_network"].get("use_bias", True)),
            target_layer_out_channels=tuple(config["target_network"]["layer_out_channels"]),
            target_use_bias=bool(config["target_network"]["use_bias"]),
            freeze_heads=bool(config["target_network"].get("freeze_layers_learning", False)),
            target_network_input=dict(config["target_network_input"]),
            ball_method=str(config.get("ball_method", "exact")),
            compute_dtype=str(config.get("compute_dtype", "float32")),
        )

    # ------------------------------------------------------------------
    @property
    def mode(self) -> str:
        if self.random_encoder_output_size > 0 and self.real_encoder_output_size > 0:
            return MODE_HYPER_POCKET
        if self.random_encoder_output_size > 0:
            return MODE_HYPER_CLOUD
        return MODE_HYPER_REC

    @property
    def has_generativity(self) -> bool:
        """Only HyperPocket trains with the KLD term (full_model.py:120-121)."""
        return self.mode == MODE_HYPER_POCKET

    def get_noise_size(self) -> int:
        return self.random_encoder_output_size

    @property
    def latent_size(self) -> int:
        return self.random_encoder_output_size + self.real_encoder_output_size

    @property
    def flat_weight_count(self) -> int:
        return target_weight_count(list(self.target_layer_out_channels), self.target_use_bias)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k_rand, k_real, k_hyper = jax.random.split(key, 3)
        params: dict = {}
        if self.random_encoder_output_size > 0:
            params["random_encoder"] = init_encoder(
                k_rand, self.random_encoder_output_size, self.encoder_use_bias, dtype
            )
        if self.real_encoder_output_size > 0:
            params["real_encoder"] = init_encoder(
                k_real, self.real_encoder_output_size, self.encoder_use_bias, dtype
            )
        params["hyper_network"] = init_hyper_network(
            k_hyper,
            self.latent_size,
            list(self.target_layer_out_channels),
            use_bias=self.hyper_use_bias,
            target_network_use_bias=self.target_use_bias,
            freeze_heads=self.freeze_heads,
            dtype=dtype,
        )
        return params

    def serving_params(self, params: dict) -> dict:
        """Pre-cast floating param leaves to ``compute_dtype`` for serving.

        ``apply`` casts the fp32 master params at use, which re-reads the
        full fp32 tree from HBM on EVERY call (the (2048, 19011) head alone
        is 156 MB). For inference serving, cast once and reuse: ``apply``'s
        at-use cast becomes a no-op on already-``compute_dtype`` leaves, and
        the numerics are identical (same single fp32->bf16 rounding).
        Training must keep the fp32 master copy (optimizer state contract).
        """
        cd = jnp.dtype(self.compute_dtype)
        if cd == jnp.dtype(jnp.float32):
            return params
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, cd)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params,
        )

    # ------------------------------------------------------------------
    def _get_latent(self, params, existing, missing, key, training, noise, eps=None):
        """Mode-specific latent composition (full_model.py:98-152).

        Inference (``not training``) dispatches the encoder trunks to the
        fused Pallas kernel — no gradients flow there, and the headline
        completion path is encoder-dominated. ``eps`` injects the VAE
        reparameterisation noise deterministically (parity tests).
        """
        mode = self.mode
        fast = not training
        if mode == MODE_HYPER_POCKET:
            if training:
                z, mu, sigma = encoder_forward(
                    params["random_encoder"], missing, is_vae=True, key=key, eps=eps
                )
                real_mu = encoder_forward(params["real_encoder"], existing, is_vae=False)
                return jnp.concatenate([z, real_mu], axis=1), mu, sigma
            if noise is None:
                _, random_mu, _ = encoder_forward(
                    params["random_encoder"], missing, is_vae=True, key=key, fast=fast,
                    eps=eps,
                )
            else:
                random_mu = noise
            real_mu = encoder_forward(
                params["real_encoder"], existing, is_vae=False, fast=fast
            )
            return jnp.concatenate([random_mu, real_mu], axis=1), None, None
        if mode == MODE_HYPER_REC:
            return (
                encoder_forward(params["real_encoder"], existing, is_vae=False, fast=fast),
                None,
                None,
            )
        # HyperCloud: the VAE encoder runs on *existing* (full_model.py:136-148)
        if training:
            return encoder_forward(
                params["random_encoder"], existing, is_vae=True, key=key, eps=eps
            )
        if noise is None:
            _, random_mu, _ = encoder_forward(
                params["random_encoder"], existing, is_vae=True, key=key, fast=fast,
                eps=eps,
            )
            return random_mu, None, None
        return noise, None, None

    def encode(
        self,
        params: dict,
        existing: jax.Array,
        missing: jax.Array | None,
        key: jax.Array,
        *,
        training: bool = True,
        noise: jax.Array | None = None,
    ):
        """(latent (B, Z), flat target-network weights (B, W)).

        The introspection hook the reference's t-SNE experiment obtains by
        editing FullModel.forward's return (core/experiments.py:250-255).
        """
        latent, _, _ = self._get_latent(params, existing, missing, key, training, noise)
        flat_weights = hyper_network_forward(
            params["hyper_network"], latent, freeze_heads=self.freeze_heads
        )
        return latent, flat_weights

    def apply(
        self,
        params: dict,
        existing: jax.Array,
        missing: jax.Array | None,
        key: jax.Array,
        epoch: jax.Array,
        *,
        num_output_points: int = 2048,
        training: bool = True,
        noise: jax.Array | None = None,
        vae_eps: jax.Array | None = None,
        ball_points: jax.Array | None = None,
        head_delta: jax.Array | None = None,
        return_trunk: bool = False,
    ):
        """Forward pass.

        existing/missing: (B, N, 3) clouds. Training returns
        ``(reconstruction (B, num_output_points, 3), mu, sigma)`` — in that
        order — else just the reconstruction. ``sigma`` is ``exp(std_head)``
        exactly as the reference's third encoder output (the reference
        returns (rec, sigma, mu); we use (rec, mu, sigma) — kld_loss takes
        (mu, sigma)).

        ``vae_eps`` (B, Z_rand) / ``ball_points`` (B, num_output_points, 3)
        replace the two stochastic draws with caller-provided values — the
        deterministic-injection hooks that let the trajectory-parity tests
        feed IDENTICAL randomness to this model and the reference's torch
        stack (which draws per-sample on the host, full_model.py:70-74).
        """
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.dtype(jnp.float32):
            # Mixed precision: master params stay fp32 (the optimizer and the
            # loss path never see bf16); casts happen at use, so grads flow
            # back to fp32 through the cast's VJP. Outputs are upcast below.
            def cast(a):
                if a is not None and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                    return jnp.asarray(a, cd)
                return a

            params = jax.tree_util.tree_map(cast, params)
            existing = cast(existing)
            missing = cast(missing)
            noise = cast(noise)

        k_enc, k_pts = jax.random.split(key)
        latent, mu, sigma = self._get_latent(
            params, existing, missing, k_enc, training, noise, eps=vae_eps
        )
        # head_delta/return_trunk: fused-head-Adam taps (see
        # hyper_network_forward); production forwards leave them unset
        fused_tap = head_delta is not None or return_trunk
        hn_out = hyper_network_forward(
            params["hyper_network"], latent, freeze_heads=self.freeze_heads,
            stop_head_weight_grad=fused_tap and not self.freeze_heads,
            head_delta=head_delta, return_trunk=return_trunk,
        )
        flat_weights, trunk_h = hn_out if return_trunk else (hn_out, None)
        batch = existing.shape[0]
        if ball_points is not None:
            pts = jnp.asarray(ball_points)
        else:
            pts = generate_target_network_input_batch(
                self.target_network_input,
                k_pts,
                epoch,
                batch,
                num_output_points,
                method=self.ball_method,
            )
        # The decode stays on the vmap'd XLA chain in BOTH modes: a fused
        # Pallas decode (ops/pallas_decoder.py) measured SLOWER (1.05-1.44 ms
        # vs 0.66-0.76 at B=256 bf16) — XLA's batched GEMM pipelines the MXU
        # across samples, which per-sample dependent chains in a kernel
        # cannot. See the negative-results note in that module.
        reconstruction = batched_target_network_forward(
            flat_weights, pts.astype(cd), list(self.target_layer_out_channels), self.target_use_bias
        )
        # loss-path dtype: sub-fp32 compute modes (bf16/fp16) hand fp32 to
        # the loss; fp32/fp64 stay as computed (fp64 is the trajectory-parity
        # debugging mode — downcasting would defeat it)
        out_dtype = cd if jnp.finfo(cd).bits >= 32 else jnp.dtype(jnp.float32)
        reconstruction = reconstruction.astype(out_dtype)
        if training:
            if mu is not None:
                mu = mu.astype(out_dtype)
            if sigma is not None:
                sigma = sigma.astype(out_dtype)
            if return_trunk:
                return reconstruction, mu, sigma, trunk_h
            return reconstruction, mu, sigma
        if return_trunk:
            return reconstruction, trunk_h
        return reconstruction

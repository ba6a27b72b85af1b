"""Parity against the reference's ACTUAL torch code (imported read-only).

The other test files validate against oracles we transcribed; these tests
execute the reference implementation itself (mounted at /root/reference)
with OUR parameters loaded, so a transcription error in our oracles cannot
hide a real mismatch. Covers the full deterministic chain:
encoder -> latent -> hypernetwork -> target network decode, plus the
ChamferLoss module and the KLD expression from the reference epoch loop.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    # append (not prepend): the reference also ships top-level packages like
    # `util_scripts` that must not shadow ours for the other test modules
    sys.path.append(REF)

from hyperpocket_tpu.models import (  # noqa: E402
    FullModel,
    batched_target_network_forward,
    encoder_forward,
    hyper_network_forward,
)
from hyperpocket_tpu.models.hyper_network import head_slices, target_layer_sizes  # noqa: E402
from hyperpocket_tpu.ops.chamfer import chamfer_loss  # noqa: E402
from hyperpocket_tpu.train.losses import kld_loss  # noqa: E402

OUT_CH = [32, 64, 128, 64]
ENC_CFG = {"output_size": 32, "use_bias": True, "relu_slope": 0.2}
TN_CFG = {"use_bias": True, "relu_slope": 0.2, "freeze_layers_learning": False,
          "layer_out_channels": OUT_CH}


def _ref_encoder_with_params(params, is_vae):
    from model.encoder import Encoder

    enc = Encoder({"output_size": params["mu"]["w"].shape[1], "use_bias": True,
                   "relu_slope": 0.2}, is_vae=is_vae)
    state = {}
    for i, layer in enumerate(params["conv"]):
        state[f"conv.{2 * i}.weight"] = torch.from_numpy(
            np.asarray(layer["w"]).T.copy()
        ).unsqueeze(-1)
        state[f"conv.{2 * i}.bias"] = torch.from_numpy(np.asarray(layer["b"]))
    state["fc.0.weight"] = torch.from_numpy(np.asarray(params["fc"]["w"]).T.copy())
    state["fc.0.bias"] = torch.from_numpy(np.asarray(params["fc"]["b"]))
    for name in ("mu", "std"):
        state[f"{name}_layer.weight"] = torch.from_numpy(np.asarray(params[name]["w"]).T.copy())
        state[f"{name}_layer.bias"] = torch.from_numpy(np.asarray(params[name]["b"]))
    enc.load_state_dict(state)
    enc.eval()
    return enc


def test_encoder_against_reference_module():
    from hyperpocket_tpu.models.encoder import init_encoder

    params = init_encoder(jax.random.key(0), output_size=32)
    enc = _ref_encoder_with_params(params, is_vae=False)
    x = np.random.default_rng(0).standard_normal((4, 256, 3)).astype(np.float32)
    ref = enc(torch.from_numpy(x).transpose(1, 2)).detach().numpy()
    ours = np.asarray(encoder_forward(params, jnp.asarray(x), is_vae=False))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_hypernetwork_against_reference_module():
    from model.hyper_network import HyperNetwork

    from hyperpocket_tpu.models.hyper_network import init_hyper_network

    z = 24
    params = init_hyper_network(jax.random.key(1), input_size=z, layer_out_channels=OUT_CH)
    ref_net = HyperNetwork({"input_size": z, "use_bias": True, "relu_slope": 0.2,
                            "target_network_layer_out_channels": OUT_CH,
                            "target_network_use_bias": True,
                            "target_network_freeze_layers_learning": False})
    state = {}
    for i, layer in enumerate(params["trunk"]):
        state[f"model.{2 * i}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T.copy())
        state[f"model.{2 * i}.bias"] = torch.from_numpy(np.asarray(layer["b"]))
    # split our fused heads back into the reference's per-layer heads
    slices = head_slices(OUT_CH, True)
    heads_w = np.asarray(params["heads"]["w"])
    heads_b = np.asarray(params["heads"]["b"])
    for i, sl in enumerate(slices):
        state[f"output.{i}.weight"] = torch.from_numpy(heads_w[:, sl].T.copy())
        state[f"output.{i}.bias"] = torch.from_numpy(heads_b[sl])
    ref_net.load_state_dict(state)
    ref_net.eval()

    latent = np.random.default_rng(1).standard_normal((3, z)).astype(np.float32)
    ref = ref_net(torch.from_numpy(latent)).detach().numpy()
    ours = np.asarray(hyper_network_forward(params, jnp.asarray(latent)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_target_network_against_reference_module():
    from model.target_network import TargetNetwork

    rng = np.random.default_rng(2)
    flat = (rng.standard_normal(sum(target_layer_sizes(OUT_CH, True))) * 0.1).astype(np.float32)
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    ref_net = TargetNetwork(TN_CFG, torch.from_numpy(flat))
    ref = ref_net(torch.from_numpy(pts)).detach().numpy()
    ours = np.asarray(batched_target_network_forward(
        jnp.asarray(flat)[None], jnp.asarray(pts)[None], OUT_CH, True
    ))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_chain_against_reference_modules():
    """existing -> real-encoder mu (+fixed noise) -> hypernet -> target net,
    decoding the SAME sampled points through both stacks."""
    cfg = {
        "random_encoder": dict(ENC_CFG), "real_encoder": dict(ENC_CFG),
        "hyper_network": {"use_bias": True, "relu_slope": 0.2},
        "target_network": dict(TN_CFG),
        "target_network_input": {"constant": False,
                                 "normalization": {"enable": False, "type": "progressive",
                                                   "epoch": 100}},
    }
    model = FullModel.from_config(cfg)
    params = model.init(jax.random.key(3))

    rng = np.random.default_rng(3)
    existing = rng.standard_normal((2, 128, 3)).astype(np.float32) * 0.3
    noise = (rng.standard_normal((2, 32)) * 0.1).astype(np.float32)
    pts = rng.standard_normal((64, 3)).astype(np.float32) * 0.3

    # ours: latent = [noise, real_mu] -> flat weights -> decode fixed points
    latent, flat = model.encode(params, jnp.asarray(existing), None, jax.random.key(4),
                                training=False, noise=jnp.asarray(noise))
    ours = np.asarray(batched_target_network_forward(
        flat, jnp.broadcast_to(jnp.asarray(pts), (2, 64, 3)), OUT_CH, True
    ))

    # reference stack with the same weights
    from model.target_network import TargetNetwork

    real_enc = _ref_encoder_with_params(params["real_encoder"], is_vae=False)
    real_mu = real_enc(torch.from_numpy(existing).transpose(1, 2))
    ref_latent = torch.cat([torch.from_numpy(noise), real_mu], dim=1)
    np.testing.assert_allclose(np.asarray(latent), ref_latent.detach().numpy(), atol=2e-4)

    from model.hyper_network import HyperNetwork

    ref_hyper = HyperNetwork({"input_size": 64, "use_bias": True, "relu_slope": 0.2,
                              "target_network_layer_out_channels": OUT_CH,
                              "target_network_use_bias": True,
                              "target_network_freeze_layers_learning": False})
    state = {}
    for i, layer in enumerate(params["hyper_network"]["trunk"]):
        state[f"model.{2 * i}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T.copy())
        state[f"model.{2 * i}.bias"] = torch.from_numpy(np.asarray(layer["b"]))
    heads_w = np.asarray(params["hyper_network"]["heads"]["w"])
    heads_b = np.asarray(params["hyper_network"]["heads"]["b"])
    for i, sl in enumerate(head_slices(OUT_CH, True)):
        state[f"output.{i}.weight"] = torch.from_numpy(heads_w[:, sl].T.copy())
        state[f"output.{i}.bias"] = torch.from_numpy(heads_b[sl])
    ref_hyper.load_state_dict(state)
    ref_hyper.eval()
    ref_flat = ref_hyper(ref_latent)

    for j in range(2):
        ref_net = TargetNetwork(TN_CFG, ref_flat[j])
        ref_out = ref_net(torch.from_numpy(pts)).detach().numpy()
        np.testing.assert_allclose(ours[j], ref_out, atol=5e-3)


def test_chamfer_against_reference_module():
    from losses.champfer_loss import ChamferLoss

    rng = np.random.default_rng(4)
    gts = (rng.standard_normal((3, 128, 3)) * 0.3).astype(np.float32)
    preds = (rng.standard_normal((3, 96, 3)) * 0.3).astype(np.float32)
    ref = float(ChamferLoss()(torch.from_numpy(gts), torch.from_numpy(preds)))
    ours = float(chamfer_loss(jnp.asarray(gts), jnp.asarray(preds)))
    assert abs(ours - ref) / max(abs(ref), 1e-6) < 1e-5


def test_kld_against_reference_expression():
    """The exact expression from core/epoch_loops.py:28-31, evaluated in torch."""
    rng = np.random.default_rng(5)
    mu = rng.standard_normal((4, 16)).astype(np.float32)
    sigma = np.exp(rng.standard_normal((4, 16)).astype(np.float32) * 0.2)
    t_logvar = torch.from_numpy(sigma)  # the model's third output, names aside
    t_mu = torch.from_numpy(mu)
    ref = 0.5 * (torch.exp(t_logvar) + torch.square(t_mu) - 1 - t_logvar).sum()
    ref = float(torch.div(ref, 4))
    ours = float(kld_loss(jnp.asarray(mu), jnp.asarray(sigma), 4))
    assert abs(ours - ref) / max(abs(ref), 1e-6) < 1e-5

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


def _encoder_state_dict(params):
    """Our encoder pytree -> the reference Encoder's state_dict layout."""
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
    return state


def _hyper_state_dict(params, out_ch, use_bias=True):
    """Our fused-heads hypernetwork pytree -> reference HyperNetwork state_dict."""
    state = {}
    for i, layer in enumerate(params["trunk"]):
        state[f"model.{2 * i}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T.copy())
        state[f"model.{2 * i}.bias"] = torch.from_numpy(np.asarray(layer["b"]))
    heads_w = np.asarray(params["heads"]["w"])
    heads_b = np.asarray(params["heads"]["b"])
    for i, sl in enumerate(head_slices(out_ch, use_bias)):
        state[f"output.{i}.weight"] = torch.from_numpy(heads_w[:, sl].T.copy())
        state[f"output.{i}.bias"] = torch.from_numpy(heads_b[sl])
    return state


def _ref_encoder_with_params(params, is_vae):
    from model.encoder import Encoder

    enc = Encoder({"output_size": params["mu"]["w"].shape[1], "use_bias": True,
                   "relu_slope": 0.2}, is_vae=is_vae)
    enc.load_state_dict(_encoder_state_dict(params))
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


# --------------------------------------------------------------------------
# Trajectory parity: N full optimizer steps of the reference's LIVE training
# loop (core/epoch_loops.py:8-46 driven verbatim, torch.optim.Adam built
# exactly as core/main.py:62-66) vs our Trainer.train_epoch, from IDENTICAL
# initial weights, batches, VAE eps and ball points. Randomness is injected
# on both sides: monkeypatched ``generate_points``/``reparameterize`` on the
# torch side, the ``injection_provider`` hook on ours.
#
# Two tiers:
#  * fp64 — the measured proof of algorithmic parity (loss composition,
#    gradient chain, optax-vs-torch Adam semantics): trajectories must agree
#    to ~1e-12; asserted at <=1e-9 per-step relative, plus a final-params
#    bound. Any semantic divergence (eps placement, bias correction, coupled
#    decay, a reduction bug) would blow through this by orders of magnitude.
#  * fp32 — the production dtype. Adam's first-step update is lr*sign(g), so
#    elements whose gradient is at the fp32 reduction-order noise floor take
#    opposite-sign lr-sized updates and the trajectories diverge chaotically
#    (measured: step-1 ~1e-5 rel growing to ~7e-3 by step 10 — a property of
#    fp32 Adam, not of either implementation; the fp64 tier proves that). We
#    assert the step-0 loss (pure forward+loss parity, <=1e-6) and a bounded
#    divergence envelope.

_TRAJ_B, _TRAJ_K = 4, 10
_TRAJ_N_EX, _TRAJ_N_GT, _TRAJ_Z = 128, 256, 32
_TRAJ_OUT = [32, 64, 128, 64]
_TRAJ_LR = 1e-4


def _traj_data(seed=11):
    K, B, Z, N_GT = _TRAJ_K, _TRAJ_B, _TRAJ_Z, _TRAJ_N_GT
    rng = np.random.default_rng(seed)
    existing = (rng.standard_normal((K, B, _TRAJ_N_EX, 3)) * 0.3).astype(np.float32)
    missing = (rng.standard_normal((K, B, _TRAJ_N_EX, 3)) * 0.3).astype(np.float32)
    gt = (rng.standard_normal((K, B, N_GT, 3)) * 0.3).astype(np.float32)
    eps = rng.standard_normal((K, B, Z)).astype(np.float32)
    # ball points (any in-ball set works — both sides get the same values)
    dirs = rng.standard_normal((K, B, N_GT, 3)).astype(np.float32)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    radii = rng.uniform(size=(K, B, N_GT, 1)).astype(np.float32) ** (1 / 3)
    balls = (dirs * radii).astype(np.float32)
    return existing, missing, gt, eps, balls


def _traj_config(tmp_path, **training_extra):
    cfg = {
        "mode": "training",
        "dataset": {"name": "shapenet", "path": str(tmp_path), "classes": ["chair"]},
        "training": {
            "optimizer": {"type": "Adam", "hyperparams": {"lr": _TRAJ_LR,
                                                          "weight_decay": 0,
                                                          "betas": [0.9, 0.999],
                                                          "amsgrad": False}},
            "lr_scheduler": {"type": "StepLR", "hyperparams": {"step_size": 3000,
                                                               "gamma": 0.1}},
            "dataloader": {
                "train": {"batch_size": _TRAJ_B, "shuffle": False, "num_workers": 0,
                          "drop_last": True},
                "val": {"batch_size": _TRAJ_B, "shuffle": False, "num_workers": 0},
            },
            "loss_coef": 0.05, "max_epoch": 1,
            **training_extra,
        },
        "full_model": {
            "random_encoder": {"output_size": _TRAJ_Z, "use_bias": True, "relu_slope": 0.2},
            "real_encoder": {"output_size": _TRAJ_Z, "use_bias": True, "relu_slope": 0.2},
            "hyper_network": {"use_bias": True, "relu_slope": 0.2},
            "target_network": {"use_bias": True, "relu_slope": 0.2,
                               "freeze_layers_learning": False,
                               "layer_out_channels": _TRAJ_OUT},
            "target_network_input": {"constant": False,
                                     "normalization": {"enable": False,
                                                       "type": "progressive",
                                                       "epoch": 100}},
        },
        "setup": {"seed": 77, "gpu_id": 0},
        "results_root": str(tmp_path / "results"),
    }
    return cfg


def _run_our_trajectory(tmp_path, data, **training_extra):
    """Build a Trainer on an in-memory dataset, inject randomness, run one
    epoch of K steps. Returns (params0, per-step (K,3) losses, final params)."""
    from hyperpocket_tpu.train.trainer import Trainer

    existing, missing, gt, eps, balls = data
    K, B = _TRAJ_K, _TRAJ_B
    items = [
        (existing[k, b], missing[k, b], gt[k, b], "chair")
        for k in range(K) for b in range(B)
    ]
    config = _traj_config(tmp_path, **training_extra)
    trainer = Trainer(config, datasets=(items, {"chair": items[:B]}, {}), use_mesh=False)
    params0 = jax.device_get(trainer.params)  # snapshot BEFORE donation
    trainer.injection_provider = lambda epoch, i: {
        "vae_eps": eps[i], "ball_points": balls[i]
    }
    trainer.train_epoch(1)
    assert trainer.last_step_losses.shape == (K, 3)
    return params0, trainer.last_step_losses, jax.device_get(trainer.params)


def _run_ref_trajectory(params0, data, monkeypatch, *, double):
    """Drive the reference's literal train_epoch with params0 loaded and the
    same injected randomness. Returns (ref module, per-step (K,3) losses)."""
    # the torch default dtype governs BOTH the module construction (a double
    # run must not round our fp64 params through fp32 modules in
    # load_state_dict) and full_model.py:68's reconstruction buffer
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64 if double else torch.float32)
    try:
        return _run_ref_trajectory_inner(params0, data, monkeypatch, double=double)
    finally:
        torch.set_default_dtype(prev_default)


def _run_ref_trajectory_inner(params0, data, monkeypatch, *, double):
    from collections import deque

    from core.epoch_loops import train_epoch as ref_train_epoch
    from losses.champfer_loss import ChamferLoss
    from model.full_model import FullModel as RefFullModel

    existing, missing, gt, eps, balls = data
    K, B, N_GT, OUT = _TRAJ_K, _TRAJ_B, _TRAJ_N_GT, _TRAJ_OUT
    ref_cfg = {
        "random_encoder": {"output_size": _TRAJ_Z, "use_bias": True, "relu_slope": 0.2},
        "real_encoder": {"output_size": _TRAJ_Z, "use_bias": True, "relu_slope": 0.2},
        "hyper_network": {"use_bias": True, "relu_slope": 0.2},
        "target_network": {"use_bias": True, "relu_slope": 0.2,
                           "freeze_layers_learning": False,
                           "layer_out_channels": OUT},
        "target_network_input": {"constant": False,
                                 "normalization": {"enable": False,
                                                   "type": "progressive", "epoch": 100}},
    }
    ref = RefFullModel(ref_cfg)
    ref.random_encoder.load_state_dict(_encoder_state_dict(params0["random_encoder"]))
    ref.real_encoder.load_state_dict(_encoder_state_dict(params0["real_encoder"]))
    ref.hyper_network.load_state_dict(_hyper_state_dict(params0["hyper_network"], OUT))
    if double:
        ref.double()

    def t(a):
        out = torch.from_numpy(np.asarray(a).copy())
        return out.double() if double else out

    eps_q = deque(t(eps[k]) for k in range(K))
    ref.random_encoder.reparameterize = (
        lambda mu, logvar: eps_q.popleft() * torch.exp(logvar) + mu
    )
    ball_q = deque(t(balls[k, b]) for k in range(K) for b in range(B))

    def fake_generate_points(config, epoch, size):
        assert tuple(size) == (N_GT, 3)
        return ball_q.popleft()

    monkeypatch.setattr("model.full_model.generate_points", fake_generate_points)

    records = []
    ref.register_forward_hook(
        lambda m, i, out: records.append(tuple(x.detach().clone() for x in out))
    )

    # the exact optimizer construction of core/main.py:62-66
    opt = torch.optim.Adam(ref.parameters(), lr=_TRAJ_LR, weight_decay=0,
                           betas=(0.9, 0.999), amsgrad=False)
    loader = [(t(existing[k]), t(missing[k]), t(gt[k]), ["chair"] * B) for k in range(K)]
    ref_train_epoch(1, ref, opt, loader, torch.device("cpu"), ChamferLoss(),
                    loss_coef=0.05)
    assert len(records) == K and not ball_q and not eps_q

    # per-step losses, recomputed from the hook captures with the literal
    # expressions of core/epoch_loops.py:25-31 (the loop's own accumulators
    # are corrupted by its loss-aggregation bug, SURVEY §3.1)
    chamfer = ChamferLoss()
    ref_steps = []
    for k, (rec, logvar, mu) in enumerate(records):
        loss_r = torch.mean(0.05 * chamfer(t(gt[k]), rec.permute(0, 2, 1)))
        loss_kld = 0.5 * (torch.exp(logvar) + torch.square(mu) - 1 - logvar).sum() / B
        ref_steps.append([float(loss_r + loss_kld), float(loss_r), float(loss_kld)])
    return ref, np.asarray(ref_steps)


def test_training_trajectory_fp64_exact(tmp_path, monkeypatch):
    """fp64 both sides: the <=1e-5 BASELINE.md budget measured over 10 full
    optimizer steps, with ~4 orders of magnitude to spare."""
    data = _traj_data()
    with jax.enable_x64(True):
        params0, ours, params_final = _run_our_trajectory(
            tmp_path, data, param_dtype="float64", compute_dtype="float64"
        )
        ref, ref_steps = _run_ref_trajectory(params0, data, monkeypatch, double=True)

    rel = np.abs(ours[:, 0] - ref_steps[:, 0]) / np.abs(ref_steps[:, 0])
    assert rel.max() <= 1e-9, f"per-step Loss_ALL rel diff {rel}"
    rel_r = np.abs(ours[:, 1] - ref_steps[:, 1]) / np.abs(ref_steps[:, 1])
    assert rel_r.max() <= 1e-9, f"per-step Loss_R rel diff {rel_r}"

    # final params: our pytree mapped through the same state-dict layout
    final_state = {}
    for prefix, sd in (
        ("random_encoder", _encoder_state_dict(params_final["random_encoder"])),
        ("real_encoder", _encoder_state_dict(params_final["real_encoder"])),
        ("hyper_network", _hyper_state_dict(params_final["hyper_network"], _TRAJ_OUT)),
    ):
        for name, tt in sd.items():
            final_state[f"{prefix}.{name}"] = tt.double()
    ref_state = {f"random_encoder.{k}": v for k, v in ref.random_encoder.state_dict().items()}
    ref_state |= {f"real_encoder.{k}": v for k, v in ref.real_encoder.state_dict().items()}
    ref_state |= {f"hyper_network.{k}": v for k, v in ref.hyper_network.state_dict().items()}
    assert final_state.keys() == ref_state.keys()
    worst = max(float((final_state[k] - ref_state[k]).abs().max()) for k in ref_state)
    # after 10 Adam steps at lr=1e-4 the budget for pure reduction-order
    # noise is ~1e-12; a semantic optimizer difference would be ~lr-sized
    assert worst <= 1e-9, f"final param max-abs-diff {worst}"


def test_training_trajectory_fp32_envelope(tmp_path, monkeypatch):
    """fp32 (production dtype): forward+loss parity at step 0, bounded Adam
    chaos thereafter (see block comment above for the mechanism; the fp64
    tier is the algorithmic-parity proof)."""
    data = _traj_data()
    params0, ours, _ = _run_our_trajectory(tmp_path, data)
    _, ref_steps = _run_ref_trajectory(params0, data, monkeypatch, double=False)

    rel = np.abs(ours[:, 0] - ref_steps[:, 0]) / np.abs(ref_steps[:, 0])
    assert rel[0] <= 1e-6, f"step-0 (pre-update) Loss_ALL rel diff {rel[0]}"
    assert rel.max() <= 2e-2, f"fp32 divergence envelope exceeded: {rel}"
    # both trajectories must actually train (loss drops the same way)
    assert ours[-1, 0] < ours[0, 0] and ref_steps[-1, 0] < ref_steps[0, 0]


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

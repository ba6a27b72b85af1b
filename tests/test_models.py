"""Model-layer parity vs torch oracles transcribing the reference math.

The torch modules below re-derive the reference architecture
(model/encoder.py, model/hyper_network.py, model/target_network.py) so we can
load OUR params into them and demand identical forward values.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from hyperpocket_tpu.models import (
    FullModel,
    batched_target_network_forward,
    encoder_forward,
    hyper_network_forward,
    init_encoder,
    init_hyper_network,
    target_network_forward,
    target_weight_count,
)
from hyperpocket_tpu.models.hyper_network import head_slices, target_layer_sizes

OUT_CH = [8, 16, 8]


def build_torch_encoder(params, output_size):
    enc = nn.Sequential()
    convs = nn.ModuleList()
    for layer in params["conv"]:
        w = np.asarray(layer["w"])  # (in, out)
        conv = nn.Conv1d(w.shape[0], w.shape[1], 1, bias="b" in layer)
        conv.weight.data = torch.from_numpy(w.T.copy()).unsqueeze(-1)
        if "b" in layer:
            conv.bias.data = torch.from_numpy(np.asarray(layer["b"]))
        convs.append(conv)

    def lin(p):
        w = np.asarray(p["w"])
        m = nn.Linear(w.shape[0], w.shape[1])
        m.weight.data = torch.from_numpy(w.T.copy())
        m.bias.data = torch.from_numpy(np.asarray(p["b"]))
        return m

    fc, mu, std = lin(params["fc"]), lin(params["mu"]), lin(params["std"])

    def forward(x_bn3):
        h = torch.from_numpy(x_bn3).transpose(1, 2)  # (B, 3, N)
        for i, c in enumerate(convs):
            h = c(h)
            if i < len(convs) - 1:
                h = torch.relu(h)
        pooled = h.max(dim=2)[0]
        logit = torch.relu(fc(pooled))
        return mu(logit), std(logit)

    return forward


def test_encoder_matches_torch_oracle():
    key = jax.random.key(0)
    params = init_encoder(key, output_size=32)
    x = np.random.default_rng(0).standard_normal((4, 256, 3)).astype(np.float32)
    ours_mu = encoder_forward(params, jnp.asarray(x), is_vae=False)
    t_mu, _ = build_torch_encoder(params, 32)(x)
    np.testing.assert_allclose(np.asarray(ours_mu), t_mu.detach().numpy(), atol=1e-4)


def test_encoder_vae_sigma_is_exp_of_std_head():
    key = jax.random.key(1)
    params = init_encoder(key, output_size=16)
    x = np.random.default_rng(1).standard_normal((2, 128, 3)).astype(np.float32)
    z, mu, sigma = encoder_forward(params, jnp.asarray(x), is_vae=True, key=jax.random.key(2))
    t_mu, t_std = build_torch_encoder(params, 16)(x)
    np.testing.assert_allclose(np.asarray(mu), t_mu.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sigma), np.exp(t_std.detach().numpy()), atol=1e-4)
    assert z.shape == mu.shape


def test_hyper_network_matches_fused_heads():
    key = jax.random.key(3)
    params = init_hyper_network(key, input_size=24, layer_out_channels=OUT_CH)
    latent = np.random.default_rng(2).standard_normal((3, 24)).astype(np.float32)

    out = np.asarray(hyper_network_forward(params, jnp.asarray(latent)))
    assert out.shape == (3, target_weight_count(OUT_CH, True))

    # torch oracle of the trunk + fused head
    h = torch.from_numpy(latent)
    for i, layer in enumerate(params["trunk"]):
        h = h @ torch.from_numpy(np.asarray(layer["w"]))
        h = h + torch.from_numpy(np.asarray(layer["b"]))
        if i < len(params["trunk"]) - 1:
            h = torch.relu(h)
    ref = h @ torch.from_numpy(np.asarray(params["heads"]["w"])) + torch.from_numpy(
        np.asarray(params["heads"]["b"])
    )
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-4)


def torch_target_network(flat, pts, out_ch, use_bias=True):
    """Transcription of reference TargetNetwork slicing + forward."""
    flat = torch.from_numpy(flat)
    x = torch.from_numpy(pts)
    ch = [3] + out_ch + [3]
    off = 0
    for i in range(1, len(ch)):
        w = flat[off : off + ch[i] * ch[i - 1]].view(ch[i], ch[i - 1])
        off += ch[i] * ch[i - 1]
        x = torch.mm(x, w.T)
        if use_bias:
            x = x + flat[off : off + ch[i]]
            off += ch[i]
        if i < len(ch) - 1:
            x = torch.relu(x)
    assert off == flat.shape[0]
    return x.numpy()


def test_target_network_matches_torch_slicing():
    rng = np.random.default_rng(5)
    w = rng.standard_normal(target_weight_count(OUT_CH, True)).astype(np.float32) * 0.1
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    ours = np.asarray(target_network_forward(jnp.asarray(w), jnp.asarray(pts), OUT_CH, True))
    ref = torch_target_network(w, pts, OUT_CH, True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_target_network_no_bias():
    rng = np.random.default_rng(6)
    w = rng.standard_normal(target_weight_count(OUT_CH, False)).astype(np.float32) * 0.1
    pts = rng.standard_normal((32, 3)).astype(np.float32)
    ours = np.asarray(target_network_forward(jnp.asarray(w), jnp.asarray(pts), OUT_CH, False))
    ref = torch_target_network(w, pts, OUT_CH, False)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_batched_decode_equals_per_sample_loop():
    rng = np.random.default_rng(7)
    b = 5
    w = rng.standard_normal((b, target_weight_count(OUT_CH, True))).astype(np.float32) * 0.1
    pts = rng.standard_normal((b, 48, 3)).astype(np.float32)
    batched = np.asarray(
        batched_target_network_forward(jnp.asarray(w), jnp.asarray(pts), OUT_CH, True)
    )
    for j in range(b):
        single = np.asarray(target_network_forward(jnp.asarray(w[j]), jnp.asarray(pts[j]), OUT_CH, True))
        np.testing.assert_allclose(batched[j], single, atol=1e-5)


def test_head_slices_cover_weight_vector():
    sizes = target_layer_sizes(OUT_CH, True)
    slices = head_slices(OUT_CH, True)
    assert slices[0].start == 0
    assert slices[-1].stop == sum(sizes)
    # reference sizes: (3+1)*8, (8+1)*16, (16+1)*8, (8+1)*3
    assert sizes == [32, 144, 136, 27]


def test_xavier_relu_bounds():
    params = init_encoder(jax.random.key(9), output_size=64)
    w = np.asarray(params["conv"][0]["w"])  # (3, 64)
    bound = math.sqrt(2.0) * math.sqrt(6.0 / (3 + 64))
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range
    assert np.all(np.asarray(params["conv"][0]["b"]) == 0)


CFG = {
    "random_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
    "real_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
    "hyper_network": {"use_bias": True, "relu_slope": 0.2},
    "target_network": {
        "use_bias": True,
        "relu_slope": 0.2,
        "freeze_layers_learning": False,
        "layer_out_channels": OUT_CH,
    },
    "target_network_input": {
        "constant": False,
        "normalization": {"enable": True, "type": "progressive", "epoch": 100},
    },
}


def _cfg(random_size, real_size, freeze=False):
    import copy

    cfg = copy.deepcopy(CFG)
    cfg["random_encoder"]["output_size"] = random_size
    cfg["real_encoder"]["output_size"] = real_size
    cfg["target_network"]["freeze_layers_learning"] = freeze
    return cfg


def test_mode_resolution():
    assert FullModel.from_config(_cfg(16, 16)).mode == "hyper_pocket"
    assert FullModel.from_config(_cfg(16, 0)).mode == "hyper_cloud"
    assert FullModel.from_config(_cfg(0, 16)).mode == "hyper_rec"
    with pytest.raises(ValueError):
        FullModel.from_config(_cfg(0, 0))
    assert FullModel.from_config(_cfg(16, 16)).has_generativity
    assert not FullModel.from_config(_cfg(16, 0)).has_generativity


def test_full_model_forward_shapes_and_determinism():
    model = FullModel.from_config(_cfg(16, 16))
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(11)
    existing = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))
    missing = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))

    rec, mu, sigma = model.apply(
        params, existing, missing, jax.random.key(1), jnp.asarray(5.0), num_output_points=128
    )
    assert rec.shape == (3, 128, 3)
    assert mu.shape == sigma.shape == (3, 16)
    assert np.all(np.asarray(sigma) > 0)

    rec2, _, _ = model.apply(
        params, existing, missing, jax.random.key(1), jnp.asarray(5.0), num_output_points=128
    )
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))


def test_full_model_eval_with_noise():
    model = FullModel.from_config(_cfg(16, 16))
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(12)
    existing = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32) * 0.1)
    rec = model.apply(
        params,
        existing,
        None,
        jax.random.key(1),
        jnp.asarray(5.0),
        num_output_points=128,
        training=False,
        noise=noise,
    )
    assert rec.shape == (2, 128, 3)


def test_full_model_jits_with_traced_epoch():
    model = FullModel.from_config(_cfg(8, 8))
    params = model.init(jax.random.key(0))
    traces = []

    def fwd(params, existing, missing, key, epoch):
        traces.append(1)
        return model.apply(params, existing, missing, key, epoch, num_output_points=64)

    jfwd = jax.jit(fwd)
    rng = np.random.default_rng(13)
    e = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    jfwd(params, e, m, jax.random.key(0), jnp.asarray(1.0))
    jfwd(params, e, m, jax.random.key(1), jnp.asarray(50.0))
    assert len(traces) == 1


def test_frozen_heads_receive_no_gradient():
    model = FullModel.from_config(_cfg(8, 8, freeze=True))
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(14)
    e = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))

    def loss(p):
        rec, _, _ = model.apply(p, e, m, jax.random.key(1), jnp.asarray(5.0), num_output_points=64)
        return jnp.sum((rec - gt) ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["hyper_network"]["heads"]["w"]).max()) == 0.0
    assert float(jnp.abs(grads["hyper_network"]["trunk"][0]["w"]).max()) > 0.0


def test_bf16_compute_mode_outputs_fp32_and_tracks_fp32_model():
    """compute_dtype=bfloat16: outputs are fp32, close to the fp32 model;
    gradients stay fp32 (mixed precision with fp32 master params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpocket_tpu.models import FullModel
    from hyperpocket_tpu.train.losses import kld_loss, reconstruction_loss

    cfg = {
        "random_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
        "real_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
        "hyper_network": {"use_bias": True, "relu_slope": 0.2},
        "target_network": {"use_bias": True, "relu_slope": 0.2,
                           "freeze_layers_learning": False,
                           "layer_out_channels": [8, 16, 8]},
        "target_network_input": {"constant": False,
                                 "normalization": {"enable": True, "type": "progressive",
                                                   "epoch": 100}},
    }
    m32 = FullModel.from_config(cfg)
    m16 = FullModel.from_config({**cfg, "compute_dtype": "bfloat16"})
    params = m32.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    existing = jnp.asarray(rng.standard_normal((4, 32, 3)), jnp.float32) * 0.3
    missing = jnp.asarray(rng.standard_normal((4, 32, 3)), jnp.float32) * 0.3
    key, ep = jax.random.key(1), jnp.asarray(5.0)

    r32, mu32, sg32 = m32.apply(params, existing, missing, key, ep, num_output_points=64)
    r16, mu16, sg16 = m16.apply(params, existing, missing, key, ep, num_output_points=64)
    assert r16.dtype == jnp.float32 and mu16.dtype == jnp.float32 and sg16.dtype == jnp.float32
    # same RNG keys -> same ball points and eps; only matmul precision differs
    assert float(jnp.max(jnp.abs(r16 - r32))) < 0.1 * float(jnp.max(jnp.abs(r32))) + 0.05
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32), atol=0.05)

    def loss_fn(p):
        rec, mu, sigma = m16.apply(p, existing, missing, key, ep, num_output_points=64)
        return reconstruction_loss(existing, rec, 0.05) + kld_loss(mu, sigma, 4)

    grads = jax.grad(loss_fn)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


class TestSparsePoolVJP:
    """The virtual-row trunk backward must match plain autodiff exactly
    (away from max ties, where ours follows torch's first-argmax routing)."""

    def _grads(self, fn, conv, x, seed=7):
        cot = jnp.asarray(
            np.random.default_rng(seed).standard_normal((x.shape[0], 512)), jnp.float32
        )
        def loss(conv, x):
            return jnp.sum(fn(conv, x) * cot.astype(x.dtype))
        return jax.grad(loss, argnums=(0, 1))(conv, x)

    def test_matches_dense_autodiff_fp32(self):
        from hyperpocket_tpu.models.encoder import (
            _conv_pooled_sparse, _conv_stack, init_encoder,
        )

        params = init_encoder(jax.random.key(0), 128)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 1040, 3)), jnp.float32
        )
        dense = lambda c, x: jnp.max(_conv_stack(c, x), axis=1)
        g_ref = self._grads(dense, params["conv"], x)
        g_sparse = self._grads(_conv_pooled_sparse, params["conv"], x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5
            ),
            g_ref, g_sparse,
        )

    def test_matches_dense_autodiff_bf16(self):
        from hyperpocket_tpu.models.encoder import (
            _conv_pooled_sparse, _conv_stack, init_encoder,
        )

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), init_encoder(jax.random.key(2), 128)
        )
        x = (jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 1024, 3)), jnp.float32
        ) * 0.3).astype(jnp.bfloat16)

        # bf16 rounding makes max TIES common, and jnp.max splits tie
        # gradients evenly while the sparse VJP routes them to the first
        # argmax (torch semantics) — so the dense reference must route the
        # same way: pool through a stop-gradient one-hot of the argmax.
        def dense_first(c, x):
            h = _conv_stack(c, x)
            onehot = jax.lax.stop_gradient(
                jax.nn.one_hot(jnp.argmax(h, axis=1), h.shape[1], dtype=h.dtype)
            )  # (B, C, N)
            return jnp.einsum("bcn,bnc->bc", onehot, h)

        g_ref = self._grads(dense_first, params["conv"], x)
        g_sparse = self._grads(_conv_pooled_sparse, params["conv"], x)
        # primal activations are recomputed bit-identically, but grad einsum
        # orders differ -> bf16-level tolerance
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0.05, atol=0.05,
            ),
            g_ref, g_sparse,
        )

    def test_small_clouds_use_dense_chain(self):
        """Below 2x C_out points the trainer path must stay plain autodiff."""
        from hyperpocket_tpu.models.encoder import _trunk, init_encoder

        params = init_encoder(jax.random.key(4), 128)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 256, 3)), jnp.float32
        )
        out = _trunk(params, x)
        assert out.shape == (2, 512)

    def test_primal_value_unchanged(self):
        from hyperpocket_tpu.models.encoder import (
            _conv_pooled_sparse, _conv_stack, init_encoder,
        )

        params = init_encoder(jax.random.key(6), 128)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 1024, 3)), jnp.float32
        )
        np.testing.assert_array_equal(
            np.asarray(_conv_pooled_sparse(params["conv"], x)),
            np.asarray(jnp.max(_conv_stack(params["conv"], x), axis=1)),
        )


def test_serving_params_bit_identical_inference():
    """Pre-cast serving params reproduce the per-call-cast apply bit-exactly
    (the at-use cast is a no-op on already-compute_dtype leaves), and the
    fp32 model returns the tree unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpocket_tpu.models import FullModel

    cfg = {
        "random_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
        "real_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
        "hyper_network": {"use_bias": True, "relu_slope": 0.2},
        "target_network": {"use_bias": True, "relu_slope": 0.2,
                           "freeze_layers_learning": False,
                           "layer_out_channels": [8, 16, 8]},
        "target_network_input": {"constant": False,
                                 "normalization": {"enable": False,
                                                   "type": "progressive", "epoch": 100}},
    }
    m16 = FullModel.from_config({**cfg, "compute_dtype": "bfloat16"})
    m32 = FullModel.from_config(cfg)
    params = m32.init(jax.random.key(0))
    assert m32.serving_params(params) is params

    sp = m16.serving_params(params)
    assert sp["hyper_network"]["heads"]["w"].dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    existing = jnp.asarray(rng.standard_normal((4, 32, 3)), jnp.float32) * 0.3
    noise = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32) * 0.1
    key, ep = jax.random.key(1), jnp.asarray(5.0)

    ref = m16.apply(params, existing, None, key, ep, num_output_points=64,
                    training=False, noise=noise)
    got = m16.apply(sp, existing, None, key, ep, num_output_points=64,
                    training=False, noise=noise)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

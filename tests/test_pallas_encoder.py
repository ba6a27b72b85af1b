"""Fused trunk+maxpool kernel vs the XLA encoder chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperpocket_tpu.models.encoder import _trunk, encoder_forward, init_encoder


def _params():
    return init_encoder(jax.random.key(0), 128)


def test_fused_trunk_matches_xla_bf16():
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    x = (jnp.asarray(np.random.default_rng(0).standard_normal((4, 256, 3)),
                     jnp.float32) * 0.3).astype(jnp.bfloat16)
    a = _trunk(params, x)
    b = _trunk(params, x, fast=True)
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                               atol=2e-2)  # bf16 per-layer rounding differences


def test_fast_flag_is_noop_for_fp32():
    """fp32 keeps the XLA chain (fusion measured neutral at fp32-highest)."""
    params = _params()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_trunk(params, x)), np.asarray(_trunk(params, x, fast=True))
    )


def test_encoder_forward_fast_path_shapes():
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    x = jnp.zeros((2, 64, 3), jnp.bfloat16)
    mu = encoder_forward(params, x, is_vae=False, fast=True)
    assert mu.shape == (2, 128)


def test_grouped_and_tiled_kernels_agree():
    """The grouped whole-cloud kernel (tile_r=None auto) must match the
    row-tiled streaming one (selected by any explicit tile_r)."""
    import hyperpocket_tpu.ops.pallas_encoder as pe

    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    conv = params["conv"]
    x = (jnp.asarray(np.random.default_rng(2).standard_normal((6, 160, 3)),
                     jnp.float32) * 0.3).astype(jnp.bfloat16)
    grouped = pe.trunk_pooled(conv, x, interpret=True)
    tiled = pe.trunk_pooled(conv, x, tile_r=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(grouped, np.float32),
                                  np.asarray(tiled, np.float32))


def test_trunk_pooled_argmax_matches_xla_argmax():
    """Fused fwd emits the same pooled values and FIRST-argmax indices as the
    XLA chain (interpret mode runs the kernel's exact op order, so values are
    bitwise and indices exact here)."""
    import hyperpocket_tpu.ops.pallas_encoder as pe
    from hyperpocket_tpu.models.encoder import _conv_stack

    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    conv = params["conv"]
    x = (jnp.asarray(np.random.default_rng(3).standard_normal((4, 256, 3)),
                     jnp.float32) * 0.3).astype(jnp.bfloat16)
    pooled, amax = pe.trunk_pooled_argmax(conv, x, interpret=True)
    h = _conv_stack(conv, x)
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               np.asarray(jnp.max(h, axis=1), np.float32), atol=2e-2)
    # index correctness against the kernel's own values: h at the reported
    # index must equal the pooled max (bf16 chains may differ from the kernel
    # by rounding, so check against the kernel's pooled with bf16 tolerance)
    took = jnp.take_along_axis(h, amax[:, None, :], axis=1)[:, 0, :]
    np.testing.assert_allclose(np.asarray(took, np.float32),
                               np.asarray(pooled, np.float32), atol=2e-2)
    assert amax.dtype == jnp.int32 and amax.shape == (4, 512)


def test_trunk_pooled_argmax_first_tie_and_tiled_agreement():
    """Duplicated points force exact ties: the index must be the FIRST
    occurrence, in both the grouped and the row-tiled kernel (ties land in
    different tiles for tile_r < dup distance)."""
    import hyperpocket_tpu.ops.pallas_encoder as pe

    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    conv = params["conv"]
    rng = np.random.default_rng(4)
    base = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.3
    xx = np.concatenate([base, base], axis=1)  # every point duplicated at +64
    x = jnp.asarray(xx, jnp.bfloat16)
    pooled_g, amax_g = pe.trunk_pooled_argmax(conv, x, interpret=True)
    pooled_t, amax_t = pe.trunk_pooled_argmax(conv, x, tile_r=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(pooled_g, np.float32),
                                  np.asarray(pooled_t, np.float32))
    np.testing.assert_array_equal(np.asarray(amax_g), np.asarray(amax_t))
    assert np.all(np.asarray(amax_g) < 64), "ties must resolve to the first copy"


def test_fused_train_fwd_vjp_matches_sparse(monkeypatch):
    """Gradients through the fused-forward VJP equal the XLA sparse path's
    (interpret mode: identical primal numerics => identical routing)."""
    monkeypatch.setenv("HPCD_TRUNK_FUSED_FWD", "1")
    from hyperpocket_tpu.models.encoder import (_conv_pooled_sparse,
                                                _conv_pooled_sparse_fused)

    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), _params())
    conv = params["conv"]
    x = (jnp.asarray(np.random.default_rng(5).standard_normal((2, 1024, 3)),
                     jnp.float32) * 0.3).astype(jnp.bfloat16)

    def loss_sparse(c, x):
        return jnp.sum(jnp.sin(_conv_pooled_sparse(c, x).astype(jnp.float32)))

    def loss_fused(c, x):
        return jnp.sum(jnp.sin(_conv_pooled_sparse_fused(c, x).astype(jnp.float32)))

    (va, ga) = jax.value_and_grad(loss_sparse, argnums=(0, 1))(conv, x)
    (vb, gb) = jax.value_and_grad(loss_fused, argnums=(0, 1))(conv, x)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-3)
    fa = jax.tree_util.tree_leaves(ga)
    fb = jax.tree_util.tree_leaves(gb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=5e-2, rtol=5e-2)


def test_pick_group_divides_batch():
    from hyperpocket_tpu.ops.pallas_encoder import _GROUP_ROW_BUDGET, _pick_group

    for b in (1, 2, 3, 5, 6, 64, 256):
        for n in (8, 256, 1024, 2048, 8192):
            g = _pick_group(b, n)
            assert b % g == 0 and g >= 1
            if g > 1:
                assert g * n <= _GROUP_ROW_BUDGET

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


def test_pick_group_divides_batch():
    from hyperpocket_tpu.ops.pallas_encoder import _GROUP_ROW_BUDGET, _pick_group

    for b in (1, 2, 3, 5, 6, 64, 256):
        for n in (8, 256, 1024, 2048, 8192):
            g = _pick_group(b, n)
            assert b % g == 0 and g >= 1
            if g > 1:
                assert g * n <= _GROUP_ROW_BUDGET

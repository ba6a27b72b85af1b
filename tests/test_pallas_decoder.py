"""Fused decode kernel vs the vmap'd XLA target network (the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpocket_tpu.models.hyper_network import target_weight_count
from hyperpocket_tpu.models.target_network import batched_target_network_forward
from hyperpocket_tpu.ops.pallas_decoder import decode_batch, split_flat_weights


def _random_inputs(channels, use_bias, batch=3, n=64, seed=0):
    w = target_weight_count(list(channels), use_bias)
    rng = np.random.default_rng(seed)
    flat = jnp.asarray(rng.standard_normal((batch, w)), jnp.float32) * 0.2
    pts = jnp.asarray(rng.standard_normal((batch, n, 3)), jnp.float32) * 0.5
    return flat, pts


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize("channels", [(32, 64, 128, 64), (8, 16), (16,), ()])
def test_decode_matches_xla_fp32(channels, use_bias):
    flat, pts = _random_inputs(channels, use_bias)
    want = batched_target_network_forward(flat, pts, list(channels), use_bias)
    got = decode_batch(flat, pts, channels, use_bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_matches_xla_bf16():
    channels = (32, 64, 128, 64)
    flat, pts = _random_inputs(channels, True, batch=2, n=128, seed=1)
    flat16, pts16 = flat.astype(jnp.bfloat16), pts.astype(jnp.bfloat16)
    want = batched_target_network_forward(flat16, pts16, list(channels), True)
    got = decode_batch(flat16, pts16, channels, True, interpret=True)
    # same per-layer bf16 rounding; residual = dot-order + VPU-vs-dot edges
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_decode_point_tiling_consistent():
    channels = (8, 16)
    flat, pts = _random_inputs(channels, True, batch=2, n=128, seed=2)
    whole = decode_batch(flat, pts, channels, True, tile_p=128, interpret=True)
    tiled = decode_batch(flat, pts, channels, True, tile_p=32, interpret=True)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(tiled), rtol=1e-6, atol=1e-6)


def test_split_flat_weights_layout():
    """Slices must follow the reference order: weight block (out, in) then bias."""
    channels = [4]
    # layer 1: 3->4 (12 w + 4 b), layer 2: 4->3 (12 w + 3 b)
    flat = jnp.arange(31, dtype=jnp.float32)[None, :]
    ws, bs = split_flat_weights(flat, channels, True)
    assert ws[0].shape == (1, 3, 4) and bs[0].shape == (1, 1, 4)
    assert ws[1].shape == (1, 4, 3) and bs[1].shape == (1, 1, 3)
    # first weight block is rows of (out=4, in=3) transposed to (in, out)
    np.testing.assert_array_equal(
        np.asarray(ws[0][0]), np.arange(12, dtype=np.float32).reshape(4, 3).T
    )
    np.testing.assert_array_equal(np.asarray(bs[0][0, 0]), np.arange(12, 16, dtype=np.float32))


def test_split_flat_weights_rejects_leftover():
    with pytest.raises(ValueError, match="not fully consumed"):
        split_flat_weights(jnp.zeros((1, 32)), [4], True)

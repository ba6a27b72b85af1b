"""Streaming Pallas NN kernel vs the pure-JAX oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpocket_tpu.ops.chamfer import chamfer_loss, nn_distance
from hyperpocket_tpu.ops.pallas_nn import (
    chamfer_loss_auto,
    chamfer_loss_streaming,
    nn_distance_pallas,
    pallas_shapes_ok,
)


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 256, 3)) * 0.3).astype(np.float32)
    y = (rng.standard_normal((2, 128, 3)) * 0.3).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_matches_pure_nn_distance(clouds):
    x, y = clouds
    d1p, i1p, d2p, i2p = nn_distance_pallas(x, y)
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1p), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i2p), np.asarray(i2))


def test_streaming_chamfer_value(clouds):
    x, y = clouds
    a = float(chamfer_loss_streaming(x, y))
    b = float(chamfer_loss(x, y))
    assert a == pytest.approx(b, rel=1e-5)


def test_streaming_chamfer_grad_close(clouds):
    x, y = clouds
    gp = jax.grad(chamfer_loss)(x, y)
    gs = jax.grad(chamfer_loss_streaming)(x, y)
    # identical up to argmin tie-breaking on near-equal distances
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=5e-3)


def test_auto_dispatch_fallback_unaligned():
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((2, 100, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, 70, 3)) * 0.3).astype(np.float32))
    assert not pallas_shapes_ok(100, 70)
    assert float(chamfer_loss_auto(x, y)) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)


def test_auto_dispatch_aligned(clouds):
    x, y = clouds
    assert pallas_shapes_ok(x.shape[1], y.shape[1])
    assert float(chamfer_loss_auto(x, y)) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)


def test_tiled_key_axis_matches(clouds):
    """M streamed through VMEM in tiles == single-block result (argmin ties
    resolve to the lowest index in both, since tiles scan in index order)."""
    from hyperpocket_tpu.ops.pallas_nn import _nn_one_direction

    x, y = clouds
    d_full, i_full = _nn_one_direction(x, y, tile_m=y.shape[1], interpret=True)
    d_tiled, i_tiled = _nn_one_direction(x, y, tile_m=32, interpret=True)
    np.testing.assert_allclose(np.asarray(d_tiled), np.asarray(d_full), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_tiled), np.asarray(i_full))
    # also vs the pure oracle
    d1, i1, _, _ = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d_tiled), np.asarray(d1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_tiled), np.asarray(i1))


def test_tiled_key_axis_nonuniform_tile():
    """tile_m not dividing M falls back to a smaller power-of-two split."""
    from hyperpocket_tpu.ops.pallas_nn import _nn_one_direction

    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((1, 128, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 192, 3)) * 0.3).astype(np.float32))
    d, i = _nn_one_direction(x, y, tile_m=128, interpret=True)  # 128 !| 192 -> 64
    d1, i1, _, _ = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))


def test_fused_planes_matches(clouds):
    """(M,128)-plane relayout of the fused kernel: exact values + indices."""
    from hyperpocket_tpu.ops.pallas_nn import _nn_fused_planes

    x, y = clouds
    d1f, i1f, d2f, i2f = _nn_fused_planes(x, y, interpret=True)
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1f), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2f), np.asarray(d2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1f), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i2f), np.asarray(i2))


def test_fused_planes_multi_tile():
    from hyperpocket_tpu.ops.pallas_nn import _nn_fused_planes

    rng = np.random.default_rng(9)
    x = jnp.asarray((rng.standard_normal((1, 1024, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 256, 3)) * 0.3).astype(np.float32))
    d1f, i1f, d2f, i2f = _nn_fused_planes(x, y, tile_n=256, interpret=True)
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1f), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2f), np.asarray(d2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1f), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i2f), np.asarray(i2))


def test_fused_planes_tile_not_dividing_by_128_regression():
    """N=384 M=4096 once picked tile_n=192 and silently dropped query lanes
    128-191 from direction 2 (review finding); tiles are now 128-multiples."""
    from hyperpocket_tpu.ops.pallas_nn import _fused_tile_n, _nn_fused_planes

    tn = _fused_tile_n(384, 4096)
    assert tn is not None and tn % 128 == 0 and 384 % tn == 0
    rng = np.random.default_rng(17)
    x = jnp.asarray((rng.standard_normal((1, 384, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 4096, 3)) * 0.3).astype(np.float32))
    d1f, i1f, d2f, i2f = _nn_fused_planes(x, y, interpret=True)
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d2f), np.asarray(d2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2f), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(i1f), np.asarray(i1))


def test_dispatch_falls_back_when_fused_unsupported():
    """N=384 M=16384: fused kernel planes would bust even the raised VMEM
    working-set budget; the dispatch must stream through two launches
    instead of raising (review finding). M=8192 fits the raised budget but
    only at a 128-wide query tile — a measured loser — so the DISPATCH
    (tile >= 256 policy) still streams it through two launches."""
    from hyperpocket_tpu.ops.pallas_nn import _fused_tile_n

    assert _fused_tile_n(384, 8192) == 128  # capability exists...
    assert _fused_tile_n(384, 16384) is None
    rng = np.random.default_rng(18)
    x = jnp.asarray((rng.standard_normal((1, 384, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 16384, 3)) * 0.3).astype(np.float32))
    d1p, i1p, d2p, i2p = nn_distance_pallas(x, y)
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2p), np.asarray(i2))


# ---------------------------------------------------------------------------
# Fused loss+gradient kernel (chamfer_loss_fused / _chamfer_loss_grad)
# ---------------------------------------------------------------------------


def test_fused_loss_grad_value_matches(clouds):
    from hyperpocket_tpu.ops.pallas_nn import _chamfer_loss_grad

    x, y = clouds
    loss, _, _ = _chamfer_loss_grad(x, y, interpret=True)
    assert float(jnp.sum(loss)) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)


def test_fused_loss_grad_matches_vjp_oracle(clouds):
    """ga/gb must equal the gather/scatter VJP of the pure chamfer loss."""
    from hyperpocket_tpu.ops.pallas_nn import _chamfer_loss_grad

    x, y = clouds
    _, ga, gb = _chamfer_loss_grad(x, y, interpret=True)
    gx, gy = jax.grad(chamfer_loss, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gy), atol=1e-4)


def test_fused_loss_grad_multi_tile():
    """N large enough to span several query tiles (both phases loop)."""
    from hyperpocket_tpu.ops.pallas_nn import _chamfer_loss_grad

    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((1, 512, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 136, 3)) * 0.3).astype(np.float32))
    loss, ga, gb = _chamfer_loss_grad(x, y, tile_n=128, interpret=True)
    gx, gy = jax.grad(chamfer_loss, argnums=(0, 1))(x, y)
    assert float(jnp.sum(loss)) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gy), atol=1e-4)


def test_chamfer_loss_fused_custom_vjp(clouds):
    from hyperpocket_tpu.ops.pallas_nn import chamfer_loss_fused

    x, y = clouds
    # primal (no grad) equals the streaming loss
    assert float(chamfer_loss_fused(x, y)) == pytest.approx(
        float(chamfer_loss(x, y)), rel=1e-5
    )
    # cotangent scaling: grad of 3*loss is 3x grad of loss
    gx1, gy1 = jax.grad(lambda a, b: chamfer_loss_fused(a, b), argnums=(0, 1))(x, y)
    gx3, gy3 = jax.grad(lambda a, b: 3.0 * chamfer_loss_fused(a, b), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx3), 3.0 * np.asarray(gx1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gy3), 3.0 * np.asarray(gy1), rtol=1e-6)
    gx, gy = jax.grad(chamfer_loss, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy), atol=1e-4)


def test_chamfer_loss_auto_grad_parity_aligned(clouds):
    """value+grad through the auto dispatcher still match the pure oracle."""
    x, y = clouds
    val, (gx, gy) = jax.value_and_grad(chamfer_loss_auto, argnums=(0, 1))(x, y)
    assert float(val) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)
    gxo, gyo = jax.grad(chamfer_loss, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxo), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gyo), atol=1e-4)


def test_fused_loss_grad_duplicate_points_ties():
    """Exact duplicates: first-occurrence argmin semantics, one hit per point.

    The oracle is the nn_distance custom VJP (the CUDA scatter semantics,
    nndistance.cu:135-154) — NOT the pure XLA loss, whose reduce-min VJP
    splits tied cotangents evenly.
    """
    from hyperpocket_tpu.ops.pallas_nn import _chamfer_loss_grad

    x = np.zeros((1, 128, 3), np.float32)
    x[0, :, 0] = np.repeat(np.arange(64), 2)  # every query duplicated
    y = np.zeros((1, 128, 3), np.float32)
    y[0, :, 0] = np.arange(128) * 0.5
    x, y = jnp.asarray(x), jnp.asarray(y)
    loss, ga, gb = _chamfer_loss_grad(x, y, interpret=True)

    def nn_loss(a, b):
        d1, _, d2, _ = nn_distance(a, b)
        return jnp.sum(d1) + jnp.sum(d2)

    gx, gy = jax.grad(nn_loss, argnums=(0, 1))(x, y)
    assert float(jnp.sum(loss)) == pytest.approx(float(chamfer_loss(x, y)), rel=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gy), atol=1e-4)


def test_auto_metric_dispatch_cpu_fallbacks():
    """The _auto metric forms must equal the XLA forms on CPU (fallback path)."""
    from hyperpocket_tpu.ops.chamfer import (chamfer_per_cloud,
                                             directed_hausdorff, nn_distance)
    from hyperpocket_tpu.ops.pallas_nn import (chamfer_per_cloud_auto,
                                               directed_hausdorff_auto,
                                               nn_distance_auto)

    rng = np.random.default_rng(21)
    x = jnp.asarray((rng.standard_normal((2, 256, 3)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, 128, 3)) * 0.3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(chamfer_per_cloud_auto(x, y)),
                                  np.asarray(chamfer_per_cloud(x, y)))
    np.testing.assert_array_equal(np.asarray(directed_hausdorff_auto(x, y)),
                                  np.asarray(directed_hausdorff(x, y)))
    for a, b in zip(nn_distance_auto(x, y), nn_distance(x, y)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

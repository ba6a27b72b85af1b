"""approx_match / match_cost vs a sequential numpy oracle of the CUDA algorithm.

The oracle transcribes the math of approxmatch.cu:34-255 (9 temperature
rounds, row/column budget bookkeeping) directly in numpy, independent of the
batched-einsum implementation under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpocket_tpu.ops import approx_match, match_cost, earth_mover_distance


def numpy_approx_match(x, y):
    b, n, _ = x.shape
    m = y.shape[1]
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0
    match = np.zeros((b, n, m), dtype=np.float64)
    for bi in range(b):
        remain_l = np.full(n, multi_l)
        remain_r = np.full(m, multi_r)
        d2 = ((x[bi, :, None, :] - y[bi, None, :, :]) ** 2).sum(-1).astype(np.float64)
        for j in range(7, -2, -1):
            level = -(4.0 ** j)
            kern = np.exp(level * d2)
            suml = kern @ remain_r + 1e-9
            ratio_l = remain_l / suml
            sumr = (kern.T @ ratio_l) * remain_r
            consumption = np.minimum(remain_r / (sumr + 1e-9), 1.0)
            ratio_r = consumption * remain_r
            remain_r = np.maximum(0.0, remain_r - sumr)
            w = kern * ratio_l[:, None] * ratio_r[None, :]
            match[bi] += w
            remain_l = np.maximum(0.0, remain_l - w.sum(1))
    return match


def numpy_match_cost(x, y, match):
    d = np.sqrt(((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1))
    return (match * d).sum(axis=(1, 2))


@pytest.fixture
def clouds():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((3, 64, 3)) * 0.3).astype(np.float32)
    y = (rng.standard_normal((3, 64, 3)) * 0.3).astype(np.float32)
    return x, y


def test_match_matches_numpy_oracle(clouds):
    x, y = clouds
    ours = np.asarray(approx_match(jnp.asarray(x), jnp.asarray(y)))
    ref = numpy_approx_match(x, y)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_match_is_doubly_near_stochastic(clouds):
    x, y = clouds
    match = np.asarray(approx_match(jnp.asarray(x), jnp.asarray(y)))
    # equal sizes: both budgets are 1 and most mass should be placed
    np.testing.assert_allclose(match.sum(2), 1.0, atol=0.05)
    np.testing.assert_allclose(match.sum(1), 1.0, atol=0.05)


def test_match_cost_matches_numpy_oracle(clouds):
    x, y = clouds
    ours = np.asarray(match_cost(jnp.asarray(x), jnp.asarray(y)))
    ref = numpy_match_cost(x, y, numpy_approx_match(x, y))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_match_cost_identical_clouds_near_zero(clouds):
    x, _ = clouds
    cost = np.asarray(match_cost(jnp.asarray(x), jnp.asarray(x)))
    # soft matching leaves a little mass on non-identical pairs
    assert np.all(cost < 0.01)


def test_unequal_sizes_budget():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 128, 3)) * 0.3).astype(np.float32)
    y = (rng.standard_normal((2, 32, 3)) * 0.3).astype(np.float32)
    ours = np.asarray(approx_match(jnp.asarray(x), jnp.asarray(y)))
    ref = numpy_approx_match(x, y)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # columns should carry budget n//m = 4
    np.testing.assert_allclose(ours.sum(1), 4.0, atol=0.2)


def test_match_cost_gradients(clouds):
    """Custom VJP equals the matchcostgrad{1,2} formulas evaluated in numpy."""
    x, y = clouds
    match = numpy_approx_match(x, y)
    d2 = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    inv = 1.0 / np.sqrt(np.maximum(d2, 1e-20))
    mt = match * inv
    gx_ref = x * mt.sum(2)[..., None] - np.einsum("bnm,bmd->bnd", mt, y)
    gy_ref = y * mt.sum(1)[..., None] - np.einsum("bnm,bnd->bmd", mt, x)

    gx, gy = jax.grad(lambda a, b: jnp.sum(match_cost(a, b)), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(gx), gx_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), gy_ref, atol=1e-3)


def test_pallas_bwd_matches_xla_bwd():
    """Fused Pallas backward (interpret mode) == chunked XLA backward."""
    from hyperpocket_tpu.ops.emd import _match_cost_bwd_chunk
    from hyperpocket_tpu.ops.pallas_emd import match_cost_pallas_bwd

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 256, 3)), jnp.float32) * 0.3
    y = jnp.asarray(rng.standard_normal((3, 256, 3)), jnp.float32) * 0.3
    gx_ref, gy_ref = _match_cost_bwd_chunk(x, y)
    gx, gy = match_cost_pallas_bwd(x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=3e-4)


def test_pallas_bwd_asymmetric_sizes():
    from hyperpocket_tpu.ops.emd import _match_cost_bwd_chunk
    from hyperpocket_tpu.ops.pallas_emd import match_cost_pallas_bwd

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32) * 0.3
    y = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32) * 0.3
    gx_ref, gy_ref = _match_cost_bwd_chunk(x, y)
    gx, gy = match_cost_pallas_bwd(x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=3e-4)


def test_bwd_lax_map_chunking_matches_unchunked():
    """The lax.map chunked backward == single-chunk recompute."""
    from hyperpocket_tpu.ops.emd import _match_cost_bwd_chunk, _match_cost_bwd_xla

    rng = np.random.default_rng(13)
    # b=32 > chunk=16 and divisible -> exercises the lax.map path
    x = jnp.asarray(rng.standard_normal((32, 64, 3)), jnp.float32) * 0.3
    y = jnp.asarray(rng.standard_normal((32, 64, 3)), jnp.float32) * 0.3
    gx_ref, gy_ref = _match_cost_bwd_chunk(x, y)
    gx, gy = _match_cost_bwd_xla(x, y)
    # lax.map compiles the chunk body separately from the inline oracle, so
    # fp32 reassociation leaves ~1e-4-level diffs on O(1) gradients
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=1e-3)


def test_earth_mover_distance_normalisation(clouds):
    x, y = clouds
    emd = np.asarray(earth_mover_distance(jnp.asarray(x), jnp.asarray(y)))
    cost = np.asarray(match_cost(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(emd, cost / x.shape[1], rtol=1e-6)


def test_earth_mover_distance_validates_sizes(clouds):
    x, y = clouds
    with pytest.raises(ValueError):
        earth_mover_distance(jnp.asarray(x[:, :32]), jnp.asarray(y))

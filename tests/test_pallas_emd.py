"""Experimental fused Pallas EMD vs the XLA streaming implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpocket_tpu.ops.emd import match_cost
from hyperpocket_tpu.ops.pallas_emd import emd_shapes_ok, match_cost_pallas_fwd


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 128, 3)) * 0.3).astype(np.float32)
    y = (rng.standard_normal((2, 128, 3)) * 0.3).astype(np.float32)
    return jax.numpy.asarray(x), jax.numpy.asarray(y)


def test_matches_xla_streaming(clouds):
    x, y = clouds
    a = np.asarray(match_cost_pallas_fwd(x, y, interpret=True))
    b = np.asarray(jax.jit(match_cost)(x, y))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_unequal_sizes(clouds):
    x, y = clouds
    a = np.asarray(match_cost_pallas_fwd(x, y[:, :32].repeat(1, axis=0), interpret=True))
    b = np.asarray(jax.jit(match_cost)(x, y[:, :32]))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_shape_gate():
    assert emd_shapes_ok(2048, 1024)
    assert not emd_shapes_ok(100, 2048)


def test_dispatch_env_override(clouds, monkeypatch):
    """HPCD_EMD_IMPL=pallas forces the fused kernel (interpret mode on CPU)."""
    import jax.numpy as jnp

    from hyperpocket_tpu.ops.emd import _forward_dispatch

    x, y = clouds
    monkeypatch.setenv("HPCD_EMD_IMPL", "pallas")
    a = np.asarray(_forward_dispatch(x, y))
    monkeypatch.setenv("HPCD_EMD_IMPL", "xla")
    b = np.asarray(_forward_dispatch(x, y))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_dispatch_auto_on_cpu_uses_xla(clouds, monkeypatch):
    from hyperpocket_tpu.ops.emd import _forward_dispatch, _streaming_cost

    x, y = clouds
    monkeypatch.delenv("HPCD_EMD_IMPL", raising=False)
    a = np.asarray(_forward_dispatch(x, y))
    b = np.asarray(_streaming_cost(x, y))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_cached_and_streaming_scaffolding_agree(clouds, monkeypatch):
    """The VMEM-cached round replay must match the streaming fallback."""
    import hyperpocket_tpu.ops.pallas_emd as pe

    x, y = clouds
    cached_f = np.asarray(pe.match_cost_pallas_fwd(x, y, interpret=True))
    cached_g = jax.device_get(pe.match_cost_pallas_bwd(x, y, interpret=True))
    budget = pe._EMD_CACHE_BUDGET_BYTES
    try:
        pe._EMD_CACHE_BUDGET_BYTES = 0  # force the streaming fallback
        # a DIFFERENT static arg each -> fresh trace that re-reads the budget
        # (tile_n=256 for the bwd would be a jit cache HIT on the cached
        # trace — review finding: the comparison was cached-vs-itself)
        stream_f = np.asarray(pe.match_cost_pallas_fwd(x, y, tile_n=128, interpret=True))
        stream_g = jax.device_get(pe.match_cost_pallas_bwd(x, y, tile_m=64, interpret=True))
    finally:
        pe._EMD_CACHE_BUDGET_BYTES = budget
    np.testing.assert_allclose(cached_f, stream_f, rtol=1e-5)
    np.testing.assert_allclose(cached_g[0], stream_g[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(cached_g[1], stream_g[1], rtol=1e-4, atol=1e-6)


def test_emd_descent_parity_pallas_vs_xla(monkeypatch):
    """Convergence guard for EMD-as-training-loss (VERDICT r2 #8): a short
    gradient-descent fit of a cloud under the EMD objective must follow the
    same loss trajectory with the pallas backward as with the XLA backward.

    On CPU the pallas kernels run in interpret mode (gradient agreement
    ~1e-4); on real TPU the pallas backward drifts up to ~0.5% on worst
    elements near coincident points — this test doubles as the harness to
    re-run on-chip before adopting EMD as a training loss (see the
    _match_cost_bwd docstring in ops/emd.py).
    """
    import jax

    from hyperpocket_tpu.ops.emd import match_cost

    rng = np.random.default_rng(3)
    # B >= 16 so the TPU auto gate would take the pallas path on-chip
    x0 = jnp.asarray(rng.standard_normal((16, 128, 3)) * 0.3, jnp.float32)
    target = jnp.asarray(rng.standard_normal((16, 128, 3)) * 0.3, jnp.float32)

    def run(impl):
        monkeypatch.setenv("HPCD_EMD_IMPL", impl)
        loss_fn = lambda x: jnp.sum(match_cost(x, target)) / (16 * 128)
        vg = jax.jit(jax.value_and_grad(loss_fn))
        x, losses = x0, []
        for _ in range(10):
            val, g = vg(x)
            losses.append(float(val))
            x = x - 0.05 * g
        return np.asarray(losses)

    l_pallas = run("pallas")
    l_xla = run("xla")
    assert l_xla[-1] < l_xla[0]  # it actually descends
    np.testing.assert_allclose(l_pallas, l_xla, rtol=2e-3)

"""Chamfer / nn_distance vs independent torch-CPU oracles.

The oracle re-derives the reference formulas (losses/champfer_loss.py,
nndistance.cu) in torch, giving an implementation-independent check of both
values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hyperpocket_tpu.ops import chamfer_loss, chamfer_per_cloud, nn_distance
from hyperpocket_tpu.ops.chamfer import batch_pairwise_sqdist, directed_hausdorff


def torch_pairwise(x, y):
    xx = torch.bmm(x, x.transpose(2, 1))
    yy = torch.bmm(y, y.transpose(2, 1))
    zz = torch.bmm(x, y.transpose(2, 1))
    rx = xx.diagonal(dim1=1, dim2=2).unsqueeze(1).expand_as(zz.transpose(2, 1))
    ry = yy.diagonal(dim1=1, dim2=2).unsqueeze(1).expand_as(zz)
    return rx.transpose(2, 1) + ry - 2 * zz


def torch_chamfer(gts, preds):
    p = torch_pairwise(gts, preds)
    return torch.sum(torch.min(p, 1)[0]) + torch.sum(torch.min(p, 2)[0])


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 128, 3)).astype(np.float32) * 0.3
    y = rng.standard_normal((4, 96, 3)).astype(np.float32) * 0.3
    return x, y


def test_pairwise_matches_torch(clouds):
    x, y = clouds
    ours = np.asarray(batch_pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    ref = torch_pairwise(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_chamfer_loss_matches_torch(clouds):
    x, y = clouds
    ours = float(chamfer_loss(jnp.asarray(x), jnp.asarray(y)))
    ref = float(torch_chamfer(torch.from_numpy(x), torch.from_numpy(y)))
    assert abs(ours - ref) / max(abs(ref), 1) < 1e-5


def test_chamfer_gradient_matches_torch(clouds):
    x, y = clouds
    tx = torch.from_numpy(x).requires_grad_(True)
    ty = torch.from_numpy(y).requires_grad_(True)
    torch_chamfer(tx, ty).backward()

    gx, gy = jax.grad(lambda a, b: chamfer_loss(a, b), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gy), ty.grad.numpy(), atol=2e-4)


def test_nn_distance_values(clouds):
    x, y = clouds
    d1, i1, d2, i2 = nn_distance(jnp.asarray(x), jnp.asarray(y))
    # brute-force numpy oracle with exact difference norms
    diff = x[:, :, None, :] - y[:, None, :, :]
    dm = np.sum(diff * diff, axis=-1)
    np.testing.assert_allclose(np.asarray(d1), dm.min(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), dm.min(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), dm.argmin(2))
    np.testing.assert_array_equal(np.asarray(i2), dm.argmin(1))


def test_nn_distance_gradient_matches_autodiff(clouds):
    """Custom VJP must agree with differentiating min-of-pairwise directly."""
    x, y = clouds
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def via_custom(a, b):
        d1, _, d2, _ = nn_distance(a, b)
        return jnp.sum(d1 * 0.7) + jnp.sum(d2 * 1.3)

    def via_autodiff(a, b):
        p = batch_pairwise_sqdist(a, b)
        return jnp.sum(jnp.min(p, 2) * 0.7) + jnp.sum(jnp.min(p, 1) * 1.3)

    g1 = jax.grad(via_custom, argnums=(0, 1))(xj, yj)
    g2 = jax.grad(via_autodiff, argnums=(0, 1))(xj, yj)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-4)


def test_chamfer_per_cloud_zero_for_identical(clouds):
    x, _ = clouds
    cd = chamfer_per_cloud(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-6)


def test_directed_hausdorff_oracle(clouds):
    x, y = clouds
    diff = x[:, :, None, :] - y[:, None, :, :]
    dm = np.sqrt(np.sum(diff * diff, axis=-1))
    ref = dm.min(2).max(1)
    ours = np.asarray(directed_hausdorff(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_chamfer_jits_without_retrace(clouds):
    x, y = clouds
    fn = jax.jit(chamfer_loss)
    a = float(fn(jnp.asarray(x), jnp.asarray(y)))
    b = float(chamfer_loss(jnp.asarray(x), jnp.asarray(y)))
    assert abs(a - b) < 1e-4

"""Golden-value regression: frozen op outputs from round 1.

Guards the loss/metric semantics against accidental drift in future rounds —
the oracles in the other test files recompute expectations, so they would
silently follow a semantics change; these values cannot.
"""

from os.path import dirname, join

import jax
import jax.numpy as jnp
import numpy as np

from hyperpocket_tpu.ops import chamfer_loss, chamfer_per_cloud, match_cost, nn_distance
from hyperpocket_tpu.ops.chamfer import directed_hausdorff

GOLDEN = np.load(join(dirname(__file__), "golden_ops.npz"))


def test_chamfer_golden():
    x, y = jnp.asarray(GOLDEN["x"]), jnp.asarray(GOLDEN["y"])
    np.testing.assert_allclose(
        float(chamfer_loss(x, y)), float(GOLDEN["chamfer_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(chamfer_per_cloud(x, y)), GOLDEN["chamfer_per_cloud"], rtol=1e-5
    )


def test_nn_distance_golden():
    x, y = jnp.asarray(GOLDEN["x"]), jnp.asarray(GOLDEN["y"])
    d1, i1, d2, i2 = nn_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1), GOLDEN["nn_d1"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2), GOLDEN["nn_d2"], rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(i1), GOLDEN["nn_i1"])
    np.testing.assert_array_equal(np.asarray(i2), GOLDEN["nn_i2"])


def test_match_cost_golden():
    x, y = jnp.asarray(GOLDEN["x"]), jnp.asarray(GOLDEN["y"])
    np.testing.assert_allclose(
        np.asarray(jax.jit(match_cost)(x, y)), GOLDEN["match_cost"], rtol=1e-4
    )


def test_hausdorff_golden():
    x, y = jnp.asarray(GOLDEN["x"]), jnp.asarray(GOLDEN["y"])
    np.testing.assert_allclose(
        np.asarray(directed_hausdorff(x, y)), GOLDEN["hausdorff"], rtol=1e-5, atol=1e-6
    )

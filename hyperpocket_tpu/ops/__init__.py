"""Core point-cloud ops: Chamfer, NN-distance, approximate EMD, ball sampling.

Every op has a pure-JAX implementation (the oracle / CPU fallback) and, where
it is a hot kernel, a Pallas TPU implementation selected automatically on TPU
backends.
"""

from hyperpocket_tpu.ops.chamfer import (
    batch_pairwise_sqdist,
    chamfer_loss,
    chamfer_per_cloud,
    nn_distance,
)
from hyperpocket_tpu.ops.emd import approx_match, match_cost, earth_mover_distance
from hyperpocket_tpu.ops.pallas_nn import (
    chamfer_loss_auto,
    chamfer_loss_streaming,
    nn_distance_pallas,
)
from hyperpocket_tpu.ops.sampling import (
    sample_uniform_ball,
    progressive_normalize,
    generate_target_network_input,
)

__all__ = [
    "batch_pairwise_sqdist",
    "chamfer_loss",
    "chamfer_per_cloud",
    "nn_distance",
    "approx_match",
    "match_cost",
    "earth_mover_distance",
    "chamfer_loss_auto",
    "chamfer_loss_streaming",
    "nn_distance_pallas",
    "sample_uniform_ball",
    "progressive_normalize",
    "generate_target_network_input",
]

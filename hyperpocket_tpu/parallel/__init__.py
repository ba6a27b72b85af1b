"""Device-mesh parallelism: DP over batch, optional TP over the hypernetwork
heads, and ring point-axis sharding of the distance ops for clouds that
outgrow one chip."""

from hyperpocket_tpu.parallel.mesh import (
    make_mesh,
    batch_spec,
    param_shardings,
    shard_batch,
    replicate,
)
from hyperpocket_tpu.parallel.point_sharding import (
    chamfer_loss_point_sharded,
    nn_distance_point_sharded,
)

__all__ = [
    "make_mesh",
    "batch_spec",
    "param_shardings",
    "shard_batch",
    "replicate",
    "chamfer_loss_point_sharded",
    "nn_distance_point_sharded",
]

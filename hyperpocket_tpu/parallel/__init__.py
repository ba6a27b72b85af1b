"""Device-mesh parallelism: DP over batch + optional TP over hypernet heads."""

from hyperpocket_tpu.parallel.mesh import (
    make_mesh,
    batch_spec,
    param_shardings,
    shard_batch,
    replicate,
)

__all__ = ["make_mesh", "batch_spec", "param_shardings", "shard_batch", "replicate"]

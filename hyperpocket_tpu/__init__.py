"""hyperpocket_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for generative
point-cloud completion, with the full capability surface of
gmum/3d-point-clouds-autocomplete (HyperPocket, arXiv:2102.05973).

Design stance (TPU-first, not a port):
  * Pure-functional JAX: params as pytrees, jitted train/eval steps.
  * The reference's per-sample Python target-network loop
    (reference model/full_model.py:70-74) is replaced by a fully batched
    ``vmap``/einsum decode that keeps the MXU busy.
  * The reference's CUDA structural losses (approxmatch.cu, nndistance.cu)
    are replaced by streaming Pallas TPU kernels with ``custom_vjp`` plus
    pure-JAX oracles that double as CPU fallbacks.
  * Scaling is via ``jax.sharding.Mesh`` + jit sharding (data parallel over
    ICI, optional tensor parallelism for the hypernetwork heads), not NCCL.

Subpackages
-----------
ops       Chamfer / NN-distance / approx-EMD / ball sampling kernels.
models    Encoder, HyperNetwork, TargetNetwork, FullModel (modes).
parallel  Mesh construction, sharding rules, distributed train step.
data      Dataset families (MissingShapeNet, 3D-EPN, Completion3D, real scans),
          PLY I/O, plane slicer, offline generators.
train     Config system, optimizer/scheduler registry, epoch driver,
          checkpointing.
eval      Generative metrics (MMD/COV/JSD/TMD/UHD) and experiment registry.
utils     Logging, plotting, Telegram notifications, misc helpers.
"""

__version__ = "0.1.0"

import os as _os

_plat = _os.environ.get("HPCD_PLATFORM")
if _plat:
    # Reliable platform override. ``JAX_PLATFORMS`` alone is NOT enough in
    # environments whose site hooks register a chip plugin and then rewrite
    # ``jax.config.jax_platforms`` (observed: axon's register() turns
    # env ``cpu`` into config ``'axon,cpu'``, so jax still picks the chip).
    # ``jax.config.update`` wins over both as long as it runs before the
    # backend initializes — i.e. set HPCD_PLATFORM before the first
    # ``hyperpocket_tpu`` import and before any ``jax.devices()`` call.
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

"""Hermetic serving export: ``jax.export`` artifact of the completion forward.

Production deployment wants a versioned artifact that serves WITHOUT the
model's Python code or the checkpoint tree. ``export_completion`` AOT-traces
the completion forward — existing half-cloud + latent noise + a ball-sampling
seed -> completed cloud — with the (serving-pre-cast) parameters baked into
the artifact as constants, and serializes it with ``jax.export``.
``load_completion`` rehydrates a callable from the bytes alone.

The artifact is platform-bound by ``jax.export`` (export on the TPU host for
TPU serving; the CPU test suite exports and serves on CPU). The reference has
no serving story at all — its closest analogue is experiments mode
(``core/main.py:176-188``), which needs the full repo, config and checkpoint
directory; this module is a TPU-framework addition.

CLI (restores a trained checkpoint the same way experiments mode does)::

    python -m hyperpocket_tpu.serving --config settings/config_3depn_chair.json \
        --out model.jaxexp --batch 64 [--epoch best_val] [--points 2048]

Serving signature: ``f(existing (B, N, 3) f32, noise (B, Z) f32,
seed uint32 scalar) -> (B, num_output_points, 3) f32``. The seed drives the
target-network ball sampling; fixing it makes the completion deterministic.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperpocket_tpu.models.full_model import FullModel

ARTIFACT_SUFFIX = ".jaxexp"


def _dp_mesh(n: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"data_parallel={n} but only {len(devs)} devices")
    return Mesh(np.array(devs[:n]).reshape(n), ("data",))


def make_serving_fn(model: FullModel, params: dict, *, num_output_points: int = 2048,
                    epoch: float = 1e9, mesh: Mesh | None = None):
    """Jitted ``f(existing, noise, seed) -> completion`` with params closed over.

    ``epoch`` feeds the progressive ball normalization (clamped at full
    normalization past the schedule — ops/sampling.py); pass the restored
    training epoch to reproduce experiments-mode behaviour exactly. Params
    are pre-cast via ``serving_params`` so bf16 serving does not re-stream
    the fp32 master tree per call.

    With ``mesh`` (a 1D ``("data",)`` mesh), the function is batch-sharded:
    params replicated, existing/noise split on the batch axis, output
    batch-sharded — serving DP over ICI with no collectives in the forward.
    """
    sparams = model.serving_params(params)
    epoch_arr = jnp.asarray(float(epoch), jnp.float32)

    def completion(existing, noise, seed):
        key = jax.random.key(seed)
        return model.apply(
            sparams, existing, None, key, epoch_arr,
            num_output_points=num_output_points, training=False, noise=noise,
        )

    if mesh is None:
        return jax.jit(completion)
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    return jax.jit(
        completion,
        in_shardings=(batched, batched, repl),
        out_shardings=batched,
    )


def export_completion(model: FullModel, params: dict, *, batch: int,
                      n_existing: int = 1024, num_output_points: int = 2048,
                      epoch: float = 1e9, data_parallel: int | None = None) -> bytes:
    """Serialize the completion forward for (batch, n_existing) inputs.

    ``data_parallel=N`` exports a batch-sharded function over an N-device
    ``("data",)`` mesh (N must divide batch); the artifact then requires an
    N-device assembly at load time and accepts/returns batch-sharded arrays.
    """
    mesh = None
    sharding = None
    if data_parallel is not None and data_parallel > 1:
        if batch % data_parallel:
            raise ValueError(f"batch {batch} not divisible by "
                             f"data_parallel {data_parallel}")
        mesh = _dp_mesh(data_parallel)
        sharding = NamedSharding(mesh, P("data"))
    fn = make_serving_fn(model, params, num_output_points=num_output_points,
                         epoch=epoch, mesh=mesh)
    specs = (
        jax.ShapeDtypeStruct((batch, n_existing, 3), jnp.float32,
                             sharding=sharding),
        jax.ShapeDtypeStruct((batch, model.get_noise_size()), jnp.float32,
                             sharding=sharding),
        jax.ShapeDtypeStruct((), jnp.uint32),
    )
    return bytes(jax.export.export(fn)(*specs).serialize())


def load_completion(data: bytes):
    """Rehydrate the serving callable from serialized artifact bytes."""
    return jax.export.deserialize(bytearray(data)).call


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Export a trained completion model as a jax.export artifact")
    ap.add_argument("-c", "--config", required=True,
                    help="training config json (reference schema)")
    ap.add_argument("--out", required=True, help="artifact output path")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-existing", type=int, default=1024)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--epoch", default=None,
                    help="restore policy: latest | best_val | <int> "
                         "(default: the config's experiments.epoch, else latest)")
    ap.add_argument("--data-parallel", type=int, default=None,
                    help="export batch-sharded over an N-device ('data',) mesh")
    args = ap.parse_args(argv)

    with open(args.config) as fh:
        config = json.load(fh)

    from hyperpocket_tpu.train.checkpoint import restore_trained_model
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    # One axon client at a time: restore + trace run on the device backend
    # (utils/chip_lock.py). No-op on CPU.
    with chip_lock():
        model, params, epoch = restore_trained_model(config, args.epoch)
        data = export_completion(
            model, params, batch=args.batch, n_existing=args.n_existing,
            num_output_points=args.points, epoch=float(epoch),
            data_parallel=args.data_parallel)
    with open(args.out, "wb") as fh:
        fh.write(data)
    meta = {
        "artifact": args.out,
        "bytes": len(data),
        "restored_epoch": epoch,
        "batch": args.batch,
        "n_existing": args.n_existing,
        "num_output_points": args.points,
        "noise_size": model.get_noise_size(),
        "data_parallel": args.data_parallel,
        "platform": jax.default_backend(),
        "compute_dtype": str(model.compute_dtype),
    }
    with open(args.out + ".json", "w") as fh:
        json.dump(meta, fh, indent=1)
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())

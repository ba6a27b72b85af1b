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

Consumer CLI — PLY in, completion PLY out, no repo/checkpoint needed::

    python -m hyperpocket_tpu.serving infer --artifact model.jaxexp \
        --inputs scan1.ply scan2.ply --out-dir completions/ \
        [--samples 4 --noise-std 0.13] [--no-normalize]

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


def infer_main(argv=None) -> int:
    """``python -m hyperpocket_tpu.serving infer``: PLY in -> completion PLY out.

    The consumer half of the serving story: loads an exported artifact (no
    model code, config or checkpoint tree needed), resamples each input
    cloud to the artifact's ``n_existing``, batches jobs to its fixed batch
    size (padding the tail), and writes one completion PLY per (input,
    sample). By default inputs are normalized into the 0.9 box exactly like
    the real-scan dataset (data/real_data.py::_get_scales — reference
    datasets/real_data.py semantics) and completions are mapped back into
    the input's coordinates by inverting that same affine transform (we
    know it exactly, so no rescale-by-output-box estimate is needed).
    """
    ap = argparse.ArgumentParser(
        prog="python -m hyperpocket_tpu.serving infer",
        description="Complete partial point clouds from PLY files using an "
                    "exported jax.export artifact")
    ap.add_argument("--artifact", required=True,
                    help="artifact path (its .json metadata sidecar must sit next to it)")
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="partial-cloud .ply files")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--seed", type=int, default=0,
                    help="ball-sampling/noise seed (fixed seed + zero noise "
                         "=> deterministic completions)")
    ap.add_argument("--samples", type=int, default=1,
                    help="completions per input (fresh latent noise each)")
    ap.add_argument("--noise-std", type=float, default=0.0,
                    help="latent noise std (the reference's fixed experiment "
                         "uses 0.13; 0 = zero-noise completion)")
    ap.add_argument("--latent-prior", default=None,
                    help="npz from `fit-prior` (mean + covariance Cholesky): "
                         "draw latent noise from the fitted code Gaussian "
                         "instead of the isotropic --noise-std draw (samples "
                         "the learned manifold; see eval/latent_stats.py)")
    ap.add_argument("--no-normalize", action="store_true",
                    help="inputs are already in the training distribution; "
                         "skip 0.9-box normalization and output rescale")
    args = ap.parse_args(argv)

    import os

    from hyperpocket_tpu.data.base import resample_pcd
    from hyperpocket_tpu.data.plyio import load_ply, save_ply
    from hyperpocket_tpu.data.real_data import RealDataNPYDataset

    with open(args.artifact, "rb") as fh:
        artifact = fh.read()
    with open(args.artifact + ".json") as fh:
        meta = json.load(fh)
    # data_parallel == 1 exports unsharded (export_completion only builds a
    # mesh for > 1), so such artifacts are perfectly servable here
    if (meta.get("data_parallel") or 0) > 1:
        raise SystemExit("infer drives single-host artifacts; re-export "
                         "without --data-parallel for CLI serving")
    batch, n_exist, zdim = meta["batch"], meta["n_existing"], meta["noise_size"]

    rng = np.random.default_rng(args.seed)
    clouds, transforms = [], []
    for p in args.inputs:
        pts = np.asarray(load_ply(p), np.float32)
        if args.no_normalize:
            center, scale = np.zeros(3, np.float32), 1.0
        else:
            center, scale = RealDataNPYDataset._get_scales(pts)
            pts = (pts - center) / scale
        transforms.append((center, scale))
        clouds.append(resample_pcd(pts, n_exist, rng=rng).astype(np.float32))

    from hyperpocket_tpu.utils.chip_lock import chip_lock

    os.makedirs(args.out_dir, exist_ok=True)
    jobs = [(i, k) for i in range(len(clouds)) for k in range(args.samples)]
    written = []
    lg = None
    if args.latent_prior:
        # load + validate ONCE, before any completion is computed (a dim
        # mismatch must fail before chip work, not mid-stream per chunk)
        from hyperpocket_tpu.eval.latent_stats import load_latent_gaussian

        lg = load_latent_gaussian(args.latent_prior)
        if lg.dim != zdim:
            raise SystemExit(
                f"latent prior dim {lg.dim} != artifact noise_size {zdim}"
            )
    with chip_lock():
        f = load_completion(artifact)
        for start in range(0, len(jobs), batch):
            chunk = jobs[start:start + batch]
            ex = np.stack([clouds[i] for i, _ in chunk])
            if len(chunk) < batch:  # pad the tail to the artifact's fixed batch
                ex = np.concatenate([ex, np.repeat(ex[-1:], batch - len(chunk), 0)])
            if lg is not None:
                eps = rng.standard_normal((batch, zdim)).astype(np.float32)
                noise = lg.mean + eps @ lg.scale_tril.T
            elif args.noise_std > 0:
                noise = rng.standard_normal((batch, zdim)).astype(np.float32) * args.noise_std
            else:
                noise = np.zeros((batch, zdim), np.float32)
            comp = np.asarray(f(jnp.asarray(ex), jnp.asarray(noise),
                                jnp.asarray(args.seed, jnp.uint32)))
            for j, (i, k) in enumerate(chunk):
                center, scale = transforms[i]
                rec = comp[j] * scale + center
                stem = os.path.splitext(os.path.basename(args.inputs[i]))[0]
                name = (f"{stem}_completion.ply" if args.samples == 1
                        else f"{stem}_completion{k}.ply")
                path = os.path.join(args.out_dir, name)
                save_ply(path, np.asarray(rec, np.float32))
                written.append(path)
    print(json.dumps({"artifact": args.artifact, "inputs": len(clouds),
                      "samples": args.samples, "written": written}))
    return 0


def fit_prior_main(argv=None) -> int:
    """``python -m hyperpocket_tpu.serving fit-prior``: fit the empirical
    latent Gaussian on the val split's missing halves and save it as the
    npz that ``infer --latent-prior`` consumes."""
    ap = argparse.ArgumentParser(
        prog="python -m hyperpocket_tpu.serving fit-prior",
        description="Fit the empirical latent prior of a trained model")
    ap.add_argument("-c", "--config", required=True,
                    help="training config json (reference schema)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--max-items", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args(argv)

    import numpy as np

    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.latent_stats import (
        collect_val_missing_halves,
        fit_latent_gaussian,
        save_latent_gaussian,
    )
    from hyperpocket_tpu.train.checkpoint import restore_trained_model
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    config = json.load(open(args.config))
    with chip_lock():
        model, params, epoch = restore_trained_model(config)
        _, val_dict, _ = get_datasets(config["dataset"])
        try:
            halves = collect_val_missing_halves(val_dict, args.max_items)
        except ValueError as e:
            raise SystemExit(str(e))
        lg = fit_latent_gaussian(model, params, halves, args.batch_size)
    save_latent_gaussian(lg, args.out)
    print(json.dumps({"out": args.out, "epoch": epoch, "fitted_on": len(halves),
                      "dim": lg.dim}))
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["infer"]:
        return infer_main(argv[1:])
    if argv[:1] == ["fit-prior"]:
        return fit_prior_main(argv[1:])
    if argv[:1] == ["export"]:  # explicit subcommand; bare flags = export too
        argv = argv[1:]
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

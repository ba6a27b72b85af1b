"""Checkpoint save/restore with the reference's epoch policies.

Layout mirrors the reference results dir (core/main.py:162-169):
``weights/{epoch:05}_model.npz`` (params), ``{epoch:05}_O.npz`` (optimizer
state), ``{epoch:05}_S.json`` (scheduler bookkeeping), and
``metrics/{epoch:05}_{train,val}.npy`` loss curves.

Restore policies are ``latest`` / ``best_val`` (argmin of the saved val
curve + 1) / explicit int — core/setup.py:80-101.

Pytrees are serialised positionally: leaves in ``tree_flatten`` order into a
single ``.npz``; restore requires a template with the same treedef, which the
caller always has (params/opt-state are rebuilt from config before restore).
A structure fingerprint (sha1 over the treedef repr + per-leaf shape/dtype,
stored as ``__structure__``) guards the positional format: restoring into a
template whose tree shape drifted (renamed keys, reordered layers, a config
change that permutes equal-shape leaves) raises instead of silently loading
garbage. Pre-fingerprint checkpoints (round <=2) load with the legacy
shape-only checks.
"""

from __future__ import annotations

import hashlib
import json
import re
from os import listdir, makedirs
from os.path import exists, join

import jax
import numpy as np

_EPOCH_RE = re.compile(r"^(?P<n>\d+)_(model\.npz|model\.pth|[DEG]\.pth)$")


def _leaf_meta(leaf) -> str:
    shape = leaf.shape if hasattr(leaf, "shape") else np.shape(leaf)
    dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
    return f"{tuple(shape)}:{np.dtype(dtype).name}"


def tree_fingerprint(tree) -> str:
    """sha1 over the treedef structure and per-leaf shape/dtype (in order).

    Hex addresses are scrubbed from the treedef repr so the hash is stable
    across processes (custom-node reprs may embed object ids).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    desc = re.sub(r"0x[0-9a-f]+", "0x", repr(treedef))
    blob = "|".join([desc] + [_leaf_meta(leaf) for leaf in leaves])
    return hashlib.sha1(blob.encode()).hexdigest()


def save_tree(path: str, tree) -> None:
    # device_get fetches the whole tree in one transfer (per-leaf np.asarray
    # would round-trip the device once per leaf — seconds each on axon).
    fingerprint = tree_fingerprint(tree)
    leaves = jax.tree_util.tree_leaves(jax.device_get(tree))
    np.savez(path, *[np.asarray(leaf) for leaf in leaves],
             __structure__=np.asarray(fingerprint))


def load_tree(path: str, template):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        n_leaves = sum(1 for f in data.files if f.startswith("arr_"))
        loaded = [data[f"arr_{i}"] for i in range(n_leaves)]
        saved_fp = str(data["__structure__"]) if "__structure__" in data.files else None
    if saved_fp is not None and saved_fp != tree_fingerprint(template):
        raise ValueError(
            f"{path}: checkpoint structure fingerprint {saved_fp[:12]} does not "
            f"match the restore template ({tree_fingerprint(template)[:12]}) — "
            "the model/optimizer config differs from the one that saved it"
        )
    if len(loaded) != len(leaves):
        raise ValueError(
            f"{path}: checkpoint has {len(loaded)} leaves, template has {len(leaves)}"
        )
    out = []
    for i, (saved, leaf) in enumerate(zip(loaded, leaves)):
        # use metadata only — never fetch the template's device buffers
        shape = leaf.shape if hasattr(leaf, "shape") else np.shape(leaf)
        dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        if np.shape(saved) != tuple(shape):
            raise ValueError(
                f"{path}: leaf {i} shape mismatch {np.shape(saved)} vs {tuple(shape)}"
            )
        out.append(jax.numpy.asarray(saved, dtype=dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def find_latest_epoch(dirpath: str) -> int:
    """Max epoch among saved weights (reference utils/util.py:13-23)."""
    if exists(join(dirpath, "weights")):
        dirpath = join(dirpath, "weights")
    if not exists(dirpath):
        return 0
    epochs = [int(m.group("n")) for f in listdir(dirpath) if (m := _EPOCH_RE.match(f))]
    return max(epochs) if epochs else 0


def find_latest_resumable_epoch(weights_path: str, metrics_path: str) -> int:
    """Max epoch with a COMPLETE resume state: model + optimizer + metrics.

    Crash-resume needs all four files; best-val saves write the model file
    alone (``{epoch}_model.npz`` with no ``_O.npz``), and under async
    checkpointing with drop_if_busy a model save can land without its
    optimizer twin. Resuming from ``find_latest_epoch`` then crashes on the
    missing file (observed: a wedged run whose newest weights entry was a
    model-only best-val save). Experiments keep using ``find_latest_epoch``
    — they restore params only, reference utils/util.py:13-23 semantics.
    """
    if not exists(weights_path):
        return 0
    epochs = [int(m.group("n")) for f in listdir(weights_path) if (m := _EPOCH_RE.match(f))]
    for epoch in sorted(set(epochs), reverse=True):
        if all(exists(p) for p in (
            join(weights_path, f"{epoch:05}_model.npz"),
            join(weights_path, f"{epoch:05}_O.npz"),
            join(metrics_path, f"{epoch:05}_train.npy"),
            join(metrics_path, f"{epoch:05}_val.npy"),
        )):
            return epoch
    return 0


def resolve_restore_epoch(metrics_path: str, epoch: int, restore_policy,
                          weights_path: str | None = None) -> int:
    """Reference core/setup.py:80-101 policies: latest / best_val / int.

    ``best_val`` picks the argmin of the saved val curve; when
    ``weights_path`` is given it restricts the argmin to epochs whose
    checkpoint files actually exist — under async checkpointing with
    drop_if_busy, a mid-run best save may have been superseded by a newer
    one (checkpoint.AsyncCheckpointer), and the reference's bare argmin
    would point at a missing file.
    """
    if restore_policy == "latest":
        return epoch
    if restore_policy == "best_val":
        val = np.load(join(metrics_path, f"{epoch:05}_val.npy"), allow_pickle=True)
        val = np.asarray(val, dtype=np.float64).reshape(len(val), -1)[:, 0]
        if weights_path is not None:
            saved = {
                int(m.group("n"))
                for f in (listdir(weights_path) if exists(weights_path) else [])
                if (m := _EPOCH_RE.match(f))
            }
            candidates = [e for e in range(1, len(val) + 1) if e in saved]
            if candidates:
                return min(candidates, key=lambda e: val[e - 1])
        return int(np.argmin(val)) + 1
    try:
        return int(restore_policy)
    except (TypeError, ValueError):
        raise ValueError(
            "`[epoch]` value can take only values: `latest`, `best_val` or positive integer"
        )


def save_checkpoint(weights_path: str, metrics_path: str, epoch: int, params, opt_state,
                    scheduler_state: dict, train_losses, val_losses) -> None:
    makedirs(weights_path, exist_ok=True)
    makedirs(metrics_path, exist_ok=True)
    save_tree(join(weights_path, f"{epoch:05}_model.npz"), params)
    save_tree(join(weights_path, f"{epoch:05}_O.npz"), opt_state)
    with open(join(weights_path, f"{epoch:05}_S.json"), "w") as fh:
        json.dump(scheduler_state, fh)
    np.save(join(metrics_path, f"{epoch:05}_train"), np.array(train_losses))
    np.save(join(metrics_path, f"{epoch:05}_val"), np.array(val_losses))


def restore_model_state(weights_path: str, metrics_path: str, epoch: int, restore_policy,
                        params, opt_state=None):
    """Restore params (and optionally optimizer state); returns (epoch, params, opt_state)."""
    epoch = resolve_restore_epoch(metrics_path, epoch, restore_policy, weights_path)
    params = load_tree(join(weights_path, f"{epoch:05}_model.npz"), params)
    if opt_state is not None:
        opt_state = load_tree(join(weights_path, f"{epoch:05}_O.npz"), opt_state)
    return epoch, params, opt_state


def restore_trained_model(config: dict, restore_policy=None):
    """(model, params, epoch) from a training config's results tree.

    The shared restore used by experiments mode (reference
    core/main.py:81-82,176-183) and the serving-export CLI: build the model
    from ``config["full_model"]``, locate the training results dir, and
    restore with ``restore_policy`` (default: the config's
    ``experiments.epoch``, else ``latest``). Raises FileNotFoundError when
    no checkpoint exists (the reference asserts the same).
    """
    import jax

    from hyperpocket_tpu.models.full_model import FullModel
    from hyperpocket_tpu.train.config import get_results_dir_path

    model = FullModel.from_config(config["full_model"])
    params = model.init(jax.random.key(config["setup"]["seed"]))

    training_dir = get_results_dir_path(config, "training")
    weights_path = join(training_dir, "weights")
    metrics_path = join(training_dir, "metrics")
    latest = find_latest_epoch(weights_path)
    if latest <= 0:
        raise FileNotFoundError(f"no weights found at {weights_path}")
    if restore_policy is None:
        restore_policy = config.get("experiments", {}).get("epoch", "latest")
    epoch, params, _ = restore_model_state(
        weights_path, metrics_path, latest, restore_policy, params)
    return model, params, epoch


def restore_metrics(metrics_path: str, epoch: int):
    """(train_losses, val_losses, best_val) — reference core/setup.py:104-107."""
    train = np.load(join(metrics_path, f"{epoch:05}_train.npy"), allow_pickle=True)
    val = np.load(join(metrics_path, f"{epoch:05}_val.npy"), allow_pickle=True)
    return train.tolist(), val.tolist(), float(np.min(val))


class AsyncCheckpointer:
    """Background-thread checkpoint writer for slow-egress hosts.

    Over the axon tunnel a full params+optimizer fetch (~0.5 GB at fp32 for
    the flagship model) runs at single-digit MB/s, stalling training for
    minutes per save (CLAUDE.md). ``submit`` therefore (a) snapshots the
    trees with an on-device ``jnp.copy`` — so the live buffers can be
    donated to the next train step while the copy is fetched — and (b) runs
    the device->host fetch + npz write on a daemon thread. With
    ``drop_if_busy`` (default) a save requested while one is in flight is
    deferred and counted in ``dropped`` — under slow egress the newest
    checkpoint wins: the most recent deferred request is flushed by
    ``wait()``, so a run's LATEST state is never lost. Intermediate saves
    (including is_new_best ones) may be superseded by newer requests;
    ``resolve_restore_epoch("best_val", weights_path=...)`` accounts for
    that by picking the best epoch among the checkpoints that exist. Set
    ``drop_if_busy`` False to block and queue every save instead. Call
    ``wait()`` before reading checkpoints back (Trainer.run does, at the
    end).
    """

    def __init__(self, drop_if_busy: bool = True):
        import threading

        self._threading = threading
        self._thread: "threading.Thread | None" = None
        self._pending: tuple | None = None  # newest deferred request
        self.drop_if_busy = drop_if_busy
        self.dropped = 0

    def _snapshot_args(self, weights_path, metrics_path, epoch, params, opt_state,
                       scheduler_state, train_losses, val_losses) -> tuple:
        import jax.numpy as jnp

        # device-side snapshot: cheap (HBM copy), and unaffected by the next
        # step's buffer donation
        params = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = jax.tree_util.tree_map(jnp.copy, opt_state)
        return (weights_path, metrics_path, epoch, params, opt_state,
                dict(scheduler_state), list(train_losses), list(val_losses))

    def submit(self, weights_path: str, metrics_path: str, epoch: int, params,
               opt_state, scheduler_state: dict, train_losses, val_losses) -> bool:
        args = self._snapshot_args(weights_path, metrics_path, epoch, params,
                                   opt_state, scheduler_state, train_losses, val_losses)
        if self._thread is not None and self._thread.is_alive():
            if self.drop_if_busy:
                self._pending = args  # newest deferred request wins
                self.dropped += 1
                return False
            self._thread.join()
        self._pending = None
        self._thread = self._threading.Thread(
            target=save_checkpoint, args=args, daemon=True
        )
        self._thread.start()
        return True

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
        if self._pending is not None:
            save_checkpoint(*self._pending)
            self._pending = None

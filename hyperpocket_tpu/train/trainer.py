"""Epoch driver: jitted train/val steps, checkpoint cadence, observability.

Control flow mirrors the reference orchestrator (core/main.py:24-174) and
epoch loops (core/epoch_loops.py), with the TPU-native changes:

* the whole optimizer step (forward + Chamfer/KLD + backward + update) is ONE
  jitted, donated function — no per-batch H2D chatter beyond the input batch;
* the per-epoch LR schedule writes a host-side scalar into the optax
  ``inject_hyperparams`` state (no recompile);
* batches are sharded over the mesh's data axis when a mesh is given;
* epoch loss aggregation is corrected: the reference accumulates into the
  loss tensors themselves (epoch_loops.py:32-36), so its reported epoch
  losses are last-batch-only — a known bug we do NOT replicate (SURVEY §3.1).
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass
from functools import partial
from os import makedirs
from os.path import exists, join

import jax
import jax.numpy as jnp
import numpy as np

from hyperpocket_tpu.data import get_datasets
from hyperpocket_tpu.data.loader import BatchLoader
from hyperpocket_tpu.models import FullModel
from hyperpocket_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    shard_batch,
    shard_scan_batch,
)
from hyperpocket_tpu.train import checkpoint as ckpt
from hyperpocket_tpu.train.config import get_results_dir_path
from hyperpocket_tpu.train.losses import kld_loss, reconstruction_loss
from hyperpocket_tpu.train.optim import make_lr_schedule, make_optimizer, set_learning_rate
from hyperpocket_tpu.utils.logging_setup import logging_setup, seed_setup


def _train_step_core(model: FullModel, tx, loss_coef: float, prng_impl: str):
    """Unjitted optimizer-step math, shared by the per-step and scanned-epoch
    entry points (identical trace → identical numerics in both loops)."""

    def step(params, opt_state, existing, missing, gt, key, epoch, num_points,
             vae_eps=None, ball_points=None):
        if jnp.issubdtype(jnp.asarray(key).dtype, jnp.integer):
            key = jax.random.key(key, impl=prng_impl)
        def loss_fn(p):
            rec, mu, sigma = model.apply(
                p, existing, missing, key, epoch, num_output_points=num_points, training=True,
                vae_eps=vae_eps, ball_points=ball_points,
            )
            loss_r = reconstruction_loss(gt, rec, loss_coef)
            if model.has_generativity:
                loss_k = kld_loss(mu, sigma, existing.shape[0])
            else:
                loss_k = jnp.zeros(())
            return loss_r + loss_k, (loss_r, loss_k, rec)

        import optax

        (loss, (loss_r, loss_k, rec)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_r, loss_k, rec

    return step


def make_train_step(model: FullModel, tx, loss_coef: float, prng_impl: str = "threefry2x32"):
    """Returns jitted step(params, opt_state, existing, missing, gt, key, epoch).

    ``key`` may be a PRNG key or a uint32 counter scalar — counters are
    folded into a key *inside* the jit, so the host never runs an eager
    ``random.split`` per step (slow over the device tunnel).

    ``prng_impl`` (config ``training.prng_impl``) selects the generator the
    counter is folded into: "threefry2x32" (default — bitwise-stable across
    backends) or "rbg" (the TPU's hardware generator; the (B, N, 3) ball
    sample per step is ~2.8x cheaper, draws remain deterministic per seed
    but are impl-specific).
    """
    step = _train_step_core(model, tx, loss_coef, prng_impl)
    return partial(jax.jit, static_argnames=("num_points",), donate_argnums=(0, 1))(step)


def make_train_epoch_scan(model: FullModel, tx, loss_coef: float,
                          prng_impl: str = "threefry2x32"):
    """One dispatch per EPOCH: ``lax.scan`` of the train step over stacked
    batches (config ``training.epoch_mode: "scan"``).

    Why: the per-step loop pays a fixed dispatch round-trip (~29 ms over the
    axon tunnel, CLAUDE.md) plus a small H2D upload per batch; at production
    shapes a whole 23-step epoch *computes* in well under half a second, so
    epoch wall-clock is latency-bound, not compute-bound. Scanning the same
    donated step body over the epoch's stacked batches turns S dispatches +
    S uploads into ONE dispatch + ONE bulk upload, and XLA compiles the body
    once (no data-dependent Python control flow on the hot path).

    Semantics: exactly ``make_train_step`` iterated with the same uint32 key
    counters — the body is the SAME traced function
    (tests/test_trainer_scan.py asserts trajectory equality). Returns
    ``(params, opt_state, last_rec, losses)`` where ``losses`` is the
    stacked (S, 3) per-step ``(loss_all, loss_r, loss_kld)`` rows and
    ``last_rec`` is the final step's reconstruction (the step loop's sample
    capture). Deterministic-injection hooks (``vae_eps``/``ball_points``)
    remain a step-loop-only feature.
    """
    core = _train_step_core(model, tx, loss_coef, prng_impl)

    @partial(jax.jit, static_argnames=("num_points",), donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, existing, missing, gt, keys, epoch, num_points):
        # rec's shape/dtype (trace-time only; cost-free) to seed the carry;
        # num_points must stay a static Python int, so bind it via partial
        rec_sds = jax.eval_shape(
            partial(core, num_points=num_points), params, opt_state, existing[0],
            None if missing is None else missing[0], gt[0], keys[0], epoch,
        )[5]
        rec0 = jnp.zeros(rec_sds.shape, rec_sds.dtype)

        def body(carry, xs):
            p, s, _ = carry
            if missing is None:
                ex, g, k = xs
                mi = None
            else:
                ex, mi, g, k = xs
            p, s, loss, loss_r, loss_k, rec = core(p, s, ex, mi, g, k, epoch, num_points)
            return (p, s, rec), jnp.stack([loss, loss_r, loss_k])

        xs = (existing, gt, keys) if missing is None else (existing, missing, gt, keys)
        (params, opt_state, rec), losses = jax.lax.scan(body, (params, opt_state, rec0), xs)
        return params, opt_state, rec, losses

    return epoch_fn


def init_head_adam_state(params: dict, moment_dtype: str = "bfloat16") -> dict:
    """Adam state for the fused head-W update (ops/pallas_head_adam.py)."""
    w = params["hyper_network"]["heads"]["w"]
    md = jnp.dtype(moment_dtype)
    return {
        "m": jnp.zeros(w.shape, md),
        "v": jnp.zeros(w.shape, md),
        "count": jnp.zeros((), jnp.int32),
    }


def make_fused_train_step(model: FullModel, tx, loss_coef: float,
                          prng_impl: str = "threefry2x32",
                          adam_cfg: tuple = (0.9, 0.999, 1e-8)):
    """Train step with the hypernet head-W updated by the fused pallas Adam.

    MEASURED NEGATIVE RESULT — kept tested as engineering record, NOT wired
    to the Trainer config: 8.98 ms/step vs 7.56 plain (B=64 bf16, real v5e,
    interleaved A/B). XLA already fuses the Adam elementwise chain into the
    head dW GEMM's consumer, so the plain path never materialises dW to HBM;
    the separate pallas pass re-pays the p/m/v traffic at ~160 GB/s and
    serializes against the step (see ops/pallas_head_adam.py docstring).

    Mechanics: AD is cut at W (stop-gradient), d_flat comes back via a zero
    head_delta, and ``head_adam_update`` forms dW tiles on the MXU and
    applies Adam in one pass — fp32 master + narrow moments. ``tx`` must
    zero the head-W leaf; requires plain Adam, weight_decay=0.

    Returns step(params, opt_state, head_state, existing, missing, gt, key,
    epoch, num_points) -> (params, opt_state, head_state, loss, loss_r,
    loss_k, rec).
    """
    from hyperpocket_tpu.ops.pallas_head_adam import adam_scalars, head_adam_update

    b1, b2, eps = adam_cfg

    @partial(jax.jit, static_argnames=("num_points",), donate_argnums=(0, 1, 2))
    def step(params, opt_state, head_state, existing, missing, gt, key, epoch,
             num_points, vae_eps=None, ball_points=None):
        if jnp.issubdtype(jnp.asarray(key).dtype, jnp.integer):
            key = jax.random.key(key, impl=prng_impl)
        cd = jnp.dtype(model.compute_dtype)
        delta0 = jnp.zeros((existing.shape[0], model.flat_weight_count), cd)

        def loss_fn(p, delta):
            rec, mu, sigma, h = model.apply(
                p, existing, missing, key, epoch, num_output_points=num_points,
                training=True, vae_eps=vae_eps, ball_points=ball_points,
                head_delta=delta, return_trunk=True,
            )
            loss_r = reconstruction_loss(gt, rec, loss_coef)
            if model.has_generativity:
                loss_k = kld_loss(mu, sigma, existing.shape[0])
            else:
                loss_k = jnp.zeros(())
            return loss_r + loss_k, (loss_r, loss_k, rec, h)

        import optax

        (loss, (loss_r, loss_k, rec, h)), (g_params, g_delta) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, delta0)
        updates, opt_state = tx.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        count = head_state["count"] + 1
        lr = opt_state.hyperparams["learning_rate"]
        sc = adam_scalars(lr, b1, b2, eps, count)
        w, m, v = head_adam_update(
            h, g_delta, params["hyper_network"]["heads"]["w"],
            head_state["m"], head_state["v"], sc,
            interpret=jax.default_backend() != "tpu",
        )
        params = {**params, "hyper_network": {**params["hyper_network"],
                  "heads": {**params["hyper_network"]["heads"], "w": w}}}
        return params, opt_state, {"m": m, "v": v, "count": count}, loss, loss_r, loss_k, rec

    return step


def make_val_epoch_scan(model: FullModel, loss_coef: float,
                        prng_impl: str = "threefry2x32"):
    """One dispatch per VAL epoch (config ``training.epoch_mode: "scan"``).

    Same rationale as ``make_train_epoch_scan``: a val epoch at production
    shapes is dispatch-latency-bound over the tunnel (~29 ms per batch), so
    ``lax.scan`` of the no-grad val body over stacked batches turns S
    dispatches into one. Values are identical to the per-batch loop (same
    traced body, same uint32 key schedule); the last batch's reconstruction
    rides the carry for the sample capture.
    """

    @partial(jax.jit, static_argnames=("num_points",))
    def epoch_fn(params, existing, missing, gt, keys, epoch, num_points):
        def val_body(ex, mi, g, k):
            key = jax.random.key(k, impl=prng_impl)
            rec = model.apply(
                params, ex, mi, key, epoch, num_output_points=num_points,
                training=False,
            )
            return reconstruction_loss(g, rec, loss_coef), rec

        rec_sds = jax.eval_shape(
            partial(val_body, existing[0],
                    None if missing is None else missing[0], gt[0], keys[0])
        )[1]
        rec0 = jnp.zeros(rec_sds.shape, rec_sds.dtype)

        def body(rec_prev, xs):
            if missing is None:
                ex, g, k = xs
                mi = None
            else:
                ex, mi, g, k = xs
            loss, rec = val_body(ex, mi, g, k)
            return rec, loss

        xs = (existing, gt, keys) if missing is None else (existing, missing, gt, keys)
        rec, losses = jax.lax.scan(body, rec0, xs)
        return losses, rec

    return epoch_fn


def make_val_step(model: FullModel, loss_coef: float, prng_impl: str = "threefry2x32"):
    @partial(jax.jit, static_argnames=("num_points",))
    def step(params, existing, missing, gt, key, epoch, num_points):
        if jnp.issubdtype(jnp.asarray(key).dtype, jnp.integer):
            key = jax.random.key(key, impl=prng_impl)
        rec = model.apply(
            params, existing, missing, key, epoch, num_output_points=num_points, training=False
        )
        return reconstruction_loss(gt, rec, loss_coef), rec

    return step


@dataclass
class EpochStats:
    loss_all: float
    loss_r: float
    loss_kld: float


class Trainer:
    """End-to-end training session built from a reference-schema config."""

    def __init__(self, config: dict, *, datasets=None, use_mesh: bool | None = None):
        self.config = config
        from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(config["setup"].get("compile_cache"))
        seed_setup(config["setup"]["seed"])
        # fp32 accumulation everywhere on the loss/model path by default —
        # the <=1e-5 parity budget vs the fp32 CUDA reference (BASELINE.md);
        # set training.matmul_precision to "default" to trade for speed.
        jax.config.update(
            "jax_default_matmul_precision",
            config.get("training", {}).get("matmul_precision", "highest"),
        )
        self.key = jax.random.key(config["setup"]["seed"])
        self._seed_counter = int(config["setup"]["seed"]) * 1_000_003

        self.result_dir = get_results_dir_path(config, "training")
        self.weights_path = join(self.result_dir, "weights")
        self.metrics_path = join(self.result_dir, "metrics")
        self.samples_path = join(self.result_dir, "samples")
        for d in (self.result_dir, self.weights_path, self.metrics_path, self.samples_path):
            makedirs(d, exist_ok=True)
        with open(join(self.result_dir, "last_config.json"), "w") as fh:
            json.dump(config, fh)
        logging_setup(self.result_dir)
        self.log = logging.getLogger("hyperpocket_tpu")

        tr = config["training"]
        # training.compute_dtype = "bfloat16" enables mixed precision: model
        # matmuls run bf16, master params / losses / optimizer stay fp32.
        # The <=1e-5 reference-parity budget applies to the fp32 mode only.
        fm_cfg = dict(config["full_model"])
        fm_cfg.setdefault("compute_dtype", tr.get("compute_dtype", "float32"))
        self.model = FullModel.from_config(fm_cfg)
        # training.param_dtype = "float64" is the trajectory-parity debugging
        # mode (tests/test_reference_parity.py): master params in fp64 (needs
        # an enclosing jax.enable_x64). Production default is fp32.
        self.params = self.model.init(
            self.key, dtype=jnp.dtype(tr.get("param_dtype", "float32"))
        )

        self.loss_coef = float(tr.get("loss_coef", 0.05))
        self.max_epoch = int(tr["max_epoch"])
        self.save_freq = int(tr.get("state_save_frequency", 1))
        self.min_save_epoch = int(tr.get("min_save_epoch", 0))
        self.tx = make_optimizer(tr["optimizer"], self._trainable_mask())
        base_lr = float(tr["optimizer"].get("hyperparams", {}).get("lr", 1e-3))
        self.lr_schedule = make_lr_schedule(tr.get("lr_scheduler"), base_lr)
        self.opt_state = self.tx.init(self.params)

        # Data
        if datasets is None:
            datasets = get_datasets(config["dataset"])
        self.train_dataset, self.val_dataset_dict, self.test_dataset_dict = datasets
        dl_cfg = tr.get("dataloader", {})
        tcfg = dict(dl_cfg.get("train", {"batch_size": 8}))
        vcfg = dict(dl_cfg.get("val", {"batch_size": 8}))
        self.train_loader = BatchLoader(
            self.train_dataset,
            tcfg.get("batch_size", 8),
            shuffle=tcfg.get("shuffle", True),
            drop_last=tcfg.get("drop_last", True),
            num_workers=tcfg.get("num_workers", 8),
            seed=config["setup"]["seed"],
        )
        # Skip categories with no val items (e.g. Completion3D "classes": []
        # expands to all 8 categories but a corpus may only populate some):
        # an empty loader would report a constant 0.0 row every epoch and
        # dilute the printed total. The reference never guards this (its
        # epoch loop divides by a zero batch count); dropping the category
        # up front with a log line is the actionable behavior.
        for cat, ds in self.val_dataset_dict.items():
            if len(ds) == 0:
                self.log.info("val category %s: no items in split, skipped", cat)
        self.val_loaders = {
            cat: BatchLoader(
                ds,
                vcfg.get("batch_size", 8),
                shuffle=vcfg.get("shuffle", False),
                drop_last=vcfg.get("drop_last", False),
                num_workers=vcfg.get("num_workers", 8),
                seed=config["setup"]["seed"] + 1,
            )
            for cat, ds in self.val_dataset_dict.items()
            if len(ds) > 0
        }
        self.profile_cfg = tr.get("profile", {})
        # training.checkpoint = {"async": true, "drop_if_busy": true}: fetch
        # + write checkpoints on a background thread (device-side snapshot
        # first, so donation of the live buffers is safe). Default sync, to
        # keep the reference's save-every-cadence semantics exact.
        ckpt_cfg = tr.get("checkpoint", {})
        self._async_ckpt = (
            ckpt.AsyncCheckpointer(bool(ckpt_cfg.get("drop_if_busy", True)))
            if ckpt_cfg.get("async", False)
            else None
        )

        # Mesh: (data, model) from config training.parallel — data-parallel
        # batch sharding plus optional Megatron-style tensor parallelism on
        # the hypernetwork's widest matmul pair (parallel/mesh.py:58-89).
        # Defaults: all devices on the data axis when the batch divides.
        par_cfg = tr.get("parallel", {})
        n_dev = len(jax.devices())
        n_model = int(par_cfg.get("model", 1))
        if n_dev % n_model:
            raise ValueError(f"parallel.model={n_model} does not divide {n_dev} devices")
        n_data = int(par_cfg.get("data") or n_dev // n_model)
        if use_mesh is None:
            use_mesh = n_data * n_model > 1 and tcfg.get("batch_size", 8) % n_data == 0
        self.mesh = make_mesh(n_data, n_model) if use_mesh else None
        if self.mesh is not None:
            self._param_shardings = param_shardings(self.mesh, self.params)
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, self._param_shardings
            )
            # re-init under jit with EXPLICIT out_shardings: each Adam moment
            # gets its param's sharding (TP moments stay sharded, not
            # materialised per device). jit's own output-sharding choice is
            # backend-dependent — see opt_state_shardings.
            self._opt_shardings = opt_state_shardings(
                self.mesh, jax.eval_shape(self.tx.init, self.params),
                self.params, self._param_shardings,
            )
            self.opt_state = jax.jit(self.tx.init, out_shardings=self._opt_shardings)(
                self.params
            )
            self.log.info("mesh: data=%d model=%d", n_data, n_model)

        prng_impl = str(tr.get("prng_impl", "threefry2x32"))
        self._prng_impl = prng_impl
        self._fm_cfg = fm_cfg
        # training.compute_dtype_switch = {"epoch": N, "compute_dtype": "float32"}:
        # epochs <= N run training.compute_dtype, epochs > N run the switch
        # dtype (model + jitted step fns are rebuilt at the crossing; fp32
        # master params / optimizer state carry over untouched). Motivated by
        # the multicat 200-epoch A/B (results/REHEARSALS.md): bf16 tracks fp32
        # exactly through the progressive-normalization phase, then plateaus
        # 2.3x above it in the fine-detail phase — bf16 early + fp32 late
        # keeps the throughput win where precision doesn't matter yet.
        sw = tr.get("compute_dtype_switch")
        self._dtype_switch = (
            (int(sw["epoch"]), str(sw.get("compute_dtype", "float32"))) if sw else None
        )
        self.train_step = make_train_step(self.model, self.tx, self.loss_coef, prng_impl)
        self.val_step = make_val_step(self.model, self.loss_coef, prng_impl)
        self.uses_missing = self.model.mode != "hyper_rec"
        # training.epoch_mode = "scan": one dispatch per epoch (lax.scan of
        # the same step body over stacked batches) — the latency-bound-host
        # optimization (see make_train_epoch_scan). Composes with the DP/TP
        # mesh: stacked (S, B, ...) epochs shard the batch dim over the data
        # axis (shard_scan_batch) and the scanned body carries the sharded
        # params/opt-state. "step" (default) keeps the per-batch dispatch
        # loop, required for the deterministic-injection hooks.
        self.epoch_mode = str(tr.get("epoch_mode", "step"))
        if self.epoch_mode not in ("step", "scan"):
            raise ValueError(f"training.epoch_mode must be 'step' or 'scan', got {self.epoch_mode!r}")
        self._epoch_scan_fn = (
            make_train_epoch_scan(self.model, self.tx, self.loss_coef, prng_impl)
            if self.epoch_mode == "scan"
            else None
        )
        self._val_epoch_scan_fn = (
            make_val_epoch_scan(self.model, self.loss_coef, prng_impl)
            if self.epoch_mode == "scan"
            else None
        )

        # Observability for dryruns/tests: how many times the scanned train /
        # val epoch bodies actually executed (n_scan > 1 engaged). A config
        # with epoch_mode="scan" but only one uniform batch silently falls
        # through to the per-batch path; asserting on these counters is how
        # a harness proves the lax.scan path really ran.
        self.scan_invocations = 0
        self.val_scan_invocations = 0

        self.train_losses: list[np.ndarray] = []
        self.val_losses: list[np.ndarray] = []
        self.best_epoch_loss = np.inf
        self.start_epoch = 1
        # Deterministic-injection hook (trajectory-parity tests): a callable
        # ``(epoch, batch_index) -> {"vae_eps": ..., "ball_points": ...}``
        # whose arrays replace the step's stochastic draws. None in
        # production. After each train_epoch, ``last_step_losses`` holds the
        # per-batch (loss_all, loss_r, loss_kld) rows for that epoch.
        self.injection_provider = None
        self.last_step_losses: np.ndarray | None = None
        self._maybe_restore()

    # ------------------------------------------------------------------
    def _trainable_mask(self):
        """False for frozen hypernet heads (excluded from the optimizer,
        like the reference's plain-list heads); None when nothing is frozen."""
        if not self.model.freeze_heads:
            return None
        import jax.tree_util as jtu

        def mask_for(path, _):
            keys = [getattr(p, "key", None) for p in path]
            return not ("hyper_network" in keys and "heads" in keys)

        return jtu.tree_map_with_path(mask_for, self.params)

    def _next_key(self):
        """A fresh uint32 counter seed; folded into a PRNG key inside jit.

        Host-side int arithmetic only — an eager ``random.split`` per batch
        would round-trip the device tunnel each step.
        """
        self._seed_counter += 1
        return np.uint32(self._seed_counter & 0xFFFFFFFF)

    def _maybe_restore(self):
        latest = ckpt.find_latest_resumable_epoch(self.weights_path, self.metrics_path)
        if latest <= 0:
            return
        epoch, self.params, self.opt_state = ckpt.restore_model_state(
            self.weights_path, self.metrics_path, latest, "latest", self.params, self.opt_state
        )
        if self.mesh is not None:
            # load_tree returns unsharded device arrays; re-apply the mesh layout
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, self._param_shardings
            )
            self.opt_state = jax.tree_util.tree_map(
                jax.device_put, self.opt_state, self._opt_shardings
            )
        self.train_losses, self.val_losses, self.best_epoch_loss = ckpt.restore_metrics(
            self.metrics_path, epoch
        )
        # restore the RNG key-counter so a resumed run reproduces the
        # uninterrupted trajectory exactly (the counter is the only
        # session-local state the step keys depend on); pre-round-4
        # checkpoints lack the field and keep the fresh counter
        s_path = join(self.weights_path, f"{epoch:05}_S.json")
        if exists(s_path):
            with open(s_path) as fh:
                sched_state = json.load(fh)
            if "seed_counter" in sched_state:
                self._seed_counter = int(sched_state["seed_counter"])
        self.start_epoch = epoch + 1
        self.log.info("restored epoch %d", epoch)

    def _maybe_switch_dtype(self, epoch: int):
        """Cross the ``compute_dtype_switch`` boundary once: rebuild the model
        and every jitted step/epoch fn under the new compute dtype. Master
        params and optimizer state are fp32 (``param_dtype``) regardless of
        compute dtype, so they carry over without conversion; resumed runs
        cross the boundary identically because ``run`` re-checks per epoch."""
        if self._dtype_switch is None:
            return
        sw_epoch, sw_dtype = self._dtype_switch
        if epoch <= sw_epoch or str(self.model.compute_dtype) == sw_dtype:
            return
        fm_cfg = dict(self._fm_cfg)
        fm_cfg["compute_dtype"] = sw_dtype
        self.model = FullModel.from_config(fm_cfg)
        self.train_step = make_train_step(self.model, self.tx, self.loss_coef, self._prng_impl)
        self.val_step = make_val_step(self.model, self.loss_coef, self._prng_impl)
        if self.epoch_mode == "scan":
            self._epoch_scan_fn = make_train_epoch_scan(
                self.model, self.tx, self.loss_coef, self._prng_impl
            )
            self._val_epoch_scan_fn = make_val_epoch_scan(
                self.model, self.loss_coef, self._prng_impl
            )
        self.log.info("compute_dtype switched to %s at epoch %d", sw_dtype, epoch)

    def _device_batch(self, *arrays):
        arrays = tuple(jnp.asarray(a) for a in arrays)
        if self.mesh is not None and all(a.shape[0] % self.mesh.shape[DATA_AXIS] == 0 for a in arrays):
            return shard_batch(self.mesh, *arrays)
        return arrays if len(arrays) > 1 else arrays[0]

    def _device_scan_batch(self, *arrays):
        """Stacked (S, B, ...) scan inputs: batch dim (axis 1) over the data
        axis when a mesh is active (scan-under-mesh; see shard_scan_batch)."""
        arrays = tuple(jnp.asarray(a) for a in arrays)
        if self.mesh is not None and all(
            a.shape[1] % self.mesh.shape[DATA_AXIS] == 0 for a in arrays
        ):
            return shard_scan_batch(self.mesh, *arrays)
        return arrays

    def _device_triplet(self, existing, missing, gt):
        """Place one (existing, missing|None, gt) batch on device/mesh and
        return it unpacked — the shared prologue of all four epoch loops."""
        arrays = (existing, gt) if missing is None else (existing, missing, gt)
        dev = self._device_batch(*arrays)
        if missing is None:
            return dev[0], None, dev[1]
        return dev

    def _device_scan_stack(self, batches, n_scan, use_missing):
        """Stack the uniform batch prefix into (S, B, ...) scan inputs and
        place them (batch axis sharded over the data axis under a mesh)."""
        stacked = [np.stack([b[0] for b in batches[:n_scan]]),
                   np.stack([b[2] for b in batches[:n_scan]])]
        if use_missing:
            stacked.insert(1, np.stack([b[1] for b in batches[:n_scan]]))
        dev = self._device_scan_batch(*stacked)
        if use_missing:
            return dev[0], dev[1], dev[2]
        return dev[0], None, dev[1]

    def _prep_missing(self, missing, batch):
        """HyperRec ignores missing; Completion3D yields scalar placeholders."""
        if not self.uses_missing or not isinstance(missing, np.ndarray) or missing.ndim != 3:
            return None
        return missing

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> tuple[EpochStats, tuple]:
        self.opt_state = set_learning_rate(self.opt_state, self.lr_schedule(epoch))
        if self._epoch_scan_fn is not None and self.injection_provider is None:
            return self._train_epoch_scan(epoch)
        # Device-side loss accumulation: per-batch float() fetches would pay
        # a host round-trip each step (seconds under tunnel latency); instead
        # stack the scalars on device and fetch ONCE per epoch.
        device_losses = []
        n_batches = 0
        latest = None
        ep = jnp.asarray(float(epoch))
        for existing, missing, gt, _ in self.train_loader.epoch(epoch):
            missing = self._prep_missing(missing, existing.shape[0])
            d_existing, d_missing, d_gt = self._device_triplet(existing, missing, gt)
            inject = (
                self.injection_provider(epoch, n_batches)
                if self.injection_provider is not None
                else {}
            )
            self.params, self.opt_state, loss, loss_r, loss_k, rec = self.train_step(
                self.params, self.opt_state, d_existing, d_missing, d_gt,
                self._next_key(), ep, num_points=int(gt.shape[1]), **inject,
            )
            device_losses.append(jnp.stack([loss, loss_r, loss_k]))
            n_batches += 1
            latest = (existing, gt, rec)
        # one device fetch per epoch; host-side reduce (tunnel-latency aware)
        self.last_step_losses = (
            np.asarray(jnp.stack(device_losses)) if device_losses else np.zeros((0, 3))
        )
        sums = self.last_step_losses.sum(axis=0) if device_losses else np.zeros(3)
        if latest is not None:
            latest = (latest[0], latest[1], np.asarray(latest[2]))
        stats = EpochStats(*(sums / max(n_batches, 1)))
        return stats, latest

    def _train_epoch_scan(self, epoch: int) -> tuple[EpochStats, tuple]:
        """Scanned-epoch body: collect the epoch's batches host-side, stack
        the uniform prefix into (S, B, ...) arrays and run ONE scanned
        dispatch; any ragged tail batches (drop_last=False) fall through to
        the per-step function with the same key counters, so the trajectory
        is identical to the step loop in every case."""
        ep = jnp.asarray(float(epoch))
        batches, keys = [], []
        for existing, missing, gt, _ in self.train_loader.epoch(epoch):
            batches.append((existing, self._prep_missing(missing, existing.shape[0]), gt))
            keys.append(self._next_key())
        if not batches:
            self.last_step_losses = np.zeros((0, 3))
            return EpochStats(0.0, 0.0, 0.0), None

        def shape_of(b):
            ex, mi, g = b
            return (ex.shape, None if mi is None else mi.shape, g.shape)

        lead = shape_of(batches[0])
        n_scan = 0
        while n_scan < len(batches) and shape_of(batches[n_scan]) == lead:
            n_scan += 1

        use_missing = batches[0][1] is not None
        num_points = int(batches[0][2].shape[1])
        loss_rows = []
        rec = None
        if n_scan > 1:
            ex_s, mi_s, gt_s = self._device_scan_stack(batches, n_scan, use_missing)
            k_s = jnp.asarray(np.asarray(keys[:n_scan], np.uint32))
            self.params, self.opt_state, rec, losses = self._epoch_scan_fn(
                self.params, self.opt_state, ex_s, mi_s, gt_s, k_s, ep,
                num_points=num_points,
            )
            self.scan_invocations += 1
            loss_rows.append(losses)
            n_start = n_scan
        else:
            n_start = 0
        for (existing, missing, gt), key in zip(batches[n_start:], keys[n_start:]):
            d_existing, d_missing, d_gt = self._device_triplet(existing, missing, gt)
            self.params, self.opt_state, loss, loss_r, loss_k, rec = self.train_step(
                self.params, self.opt_state, d_existing, d_missing, d_gt,
                key, ep, num_points=int(gt.shape[1]),
            )
            loss_rows.append(jnp.stack([loss, loss_r, loss_k])[None])
        # one device fetch per epoch, as in the step loop
        self.last_step_losses = np.asarray(jnp.concatenate(loss_rows, axis=0))
        sums = self.last_step_losses.sum(axis=0)
        latest = (batches[-1][0], batches[-1][2], np.asarray(rec))
        return EpochStats(*(sums / len(batches))), latest

    def val_epoch(self, epoch: int):
        """Per-category no-grad loss + one sample per category (epoch_loops.py:49-83)."""
        if self._val_epoch_scan_fn is not None:
            return self._val_epoch_scan(epoch)
        val_losses: dict[str, np.ndarray] = {}
        val_samples: dict[str, tuple] = {}
        ep = jnp.asarray(float(epoch))
        for cat, loader in self.val_loaders.items():
            device_losses = []
            last = None
            for existing, missing, gt, _ in loader.epoch(epoch):
                missing = self._prep_missing(missing, existing.shape[0])
                # same mesh placement as the train epoch — on a DP/TP mesh
                # val batches shard over the data axis (a multi-host mesh
                # would otherwise fail on un-addressable default placement)
                d_existing, d_missing, d_gt = self._device_triplet(existing, missing, gt)
                loss, rec = self.val_step(
                    self.params, d_existing, d_missing, d_gt,
                    self._next_key(), ep, num_points=int(gt.shape[1]),
                )
                device_losses.append(loss)
                last = (existing[0], gt[0], rec)
            n = len(device_losses)
            total = float(jnp.sum(jnp.stack(device_losses))) if device_losses else 0.0
            if last is not None:
                last = (last[0], last[1], np.asarray(last[2])[0])
            val_losses[cat] = np.array([total / max(n, 1)])
            val_samples[cat] = last
        # all categories may have been skipped as empty: keep "total" an
        # array so downstream indexing (run(): total[0]) stays uniform
        total = (sum(val_losses.values()) / len(val_losses)
                 if val_losses else np.array([0.0]))
        val_losses["total"] = total
        return val_losses, val_samples

    def _val_epoch_scan(self, epoch: int):
        """Scanned-val body: stack each category's uniform batch prefix into
        one ``lax.scan`` dispatch; ragged tails fall through to the per-batch
        val step with the same key counters (values identical to the loop)."""
        val_losses: dict[str, np.ndarray] = {}
        val_samples: dict[str, tuple] = {}
        ep = jnp.asarray(float(epoch))
        for cat, loader in self.val_loaders.items():
            batches, keys = [], []
            for existing, missing, gt, _ in loader.epoch(epoch):
                batches.append((existing, self._prep_missing(missing, existing.shape[0]), gt))
                keys.append(self._next_key())
            if not batches:
                val_losses[cat] = np.array([0.0])
                val_samples[cat] = None
                continue

            def shape_of(b):
                ex, mi, g = b
                return (ex.shape, None if mi is None else mi.shape, g.shape)

            lead = shape_of(batches[0])
            n_scan = 0
            while n_scan < len(batches) and shape_of(batches[n_scan]) == lead:
                n_scan += 1
            use_missing = batches[0][1] is not None
            num_points = int(batches[0][2].shape[1])
            device_losses = []
            rec = None
            if n_scan > 1:
                ex_s, mi_s, gt_s = self._device_scan_stack(batches, n_scan, use_missing)
                k_s = jnp.asarray(np.asarray(keys[:n_scan], np.uint32))
                losses, rec = self._val_epoch_scan_fn(
                    self.params, ex_s, mi_s, gt_s, k_s, ep, num_points=num_points,
                )
                self.val_scan_invocations += 1
                device_losses.append(losses)
                n_start = n_scan
            else:
                n_start = 0
            for (existing, missing, gt), key in zip(batches[n_start:], keys[n_start:]):
                d_existing, d_missing, d_gt = self._device_triplet(existing, missing, gt)
                loss, rec = self.val_step(
                    self.params, d_existing, d_missing, d_gt,
                    key, ep, num_points=int(gt.shape[1]),
                )
                device_losses.append(loss[None])
            all_losses = np.asarray(jnp.concatenate(device_losses))
            val_losses[cat] = np.array([float(all_losses.sum()) / len(batches)])
            val_samples[cat] = (batches[-1][0][0], batches[-1][2][0], np.asarray(rec)[0])
        # all categories may have been skipped as empty: keep "total" an
        # array so downstream indexing (run(): total[0]) stays uniform
        total = (sum(val_losses.values()) / len(val_losses)
                 if val_losses else np.array([0.0]))
        val_losses["total"] = total
        return val_losses, val_samples

    # ------------------------------------------------------------------
    def run(self, *, plot_samples: bool = True, tg_logger=None):
        profiling = False
        if self.profile_cfg.get("enable"):
            import jax.profiler

            jax.profiler.start_trace(self.profile_cfg.get("dir", join(self.result_dir, "trace")))
            profiling = True
        for epoch in range(self.start_epoch, self.max_epoch + 1):
            self._maybe_switch_dtype(epoch)
            t0 = time.monotonic()
            stats, latest = self.train_epoch(epoch)
            if profiling and epoch >= self.start_epoch + self.profile_cfg.get("epochs", 1) - 1:
                import jax.profiler

                jax.profiler.stop_trace()
                profiling = False
                self.log.info("profiler trace written")
            self.train_losses.append(np.array([stats.loss_all, stats.loss_r, stats.loss_kld]))

            msg = (
                f"[{epoch}/{self.max_epoch}] Loss_ALL: {stats.loss_all:.4f} "
                f"Loss_R: {stats.loss_r:.4f} Loss_E: {stats.loss_kld:.4f} "
                f"Time: {time.monotonic() - t0:.1f}s"
            )
            self.log.info(msg)

            plots = []
            if plot_samples and latest is not None:
                from hyperpocket_tpu.utils.plotting import save_plot

                l_existing, l_gt, l_rec = latest
                for k in range(min(5, l_rec.shape[0])):
                    plots.append(save_plot(l_existing[k].T, epoch, k, self.samples_path, "existing"))
                    plots.append(save_plot(l_rec[k].T, epoch, k, self.samples_path, "reconstructed"))
                    plots.append(save_plot(l_gt[k].T, epoch, k, self.samples_path, "gt"))
            if tg_logger is not None:
                tg_logger.log_images(plots[:9], msg)

            epoch_val_losses, epoch_val_samples = self.val_epoch(epoch)
            is_new_best = float(epoch_val_losses["total"][0]) < self.best_epoch_loss
            if is_new_best:
                self.best_epoch_loss = float(epoch_val_losses["total"][0])
            self.val_losses.append(epoch_val_losses["total"])

            val_msg = f"val results[{self.loss_coef}*our_cd]:\n" + "".join(
                f"{k}: {v}\n" for k, v in epoch_val_losses.items()
            )
            if is_new_best:
                val_msg += "new best epoch"
            self.log.info(val_msg)

            if plot_samples:
                from hyperpocket_tpu.utils.plotting import save_plot

                for cat, sample in epoch_val_samples.items():
                    if sample is None:
                        continue
                    save_plot(sample[0].T, epoch, cat, self.samples_path, "val_existing")
                    save_plot(sample[2].T, epoch, cat, self.samples_path, "val_rec")
                    save_plot(sample[1].T, epoch, cat, self.samples_path, "val_gt")

            if (epoch % self.save_freq == 0 or is_new_best) and epoch > self.min_save_epoch:
                sched_state = {"epoch": epoch, "lr": self.lr_schedule(epoch),
                               "seed_counter": int(self._seed_counter)}
                if self._async_ckpt is not None:
                    saved = self._async_ckpt.submit(
                        self.weights_path, self.metrics_path, epoch, self.params,
                        self.opt_state, sched_state, self.train_losses, self.val_losses,
                    )
                    self.log.debug("Epoch: %s %s", epoch,
                                   "save submitted" if saved else "save dropped (writer busy)")
                else:
                    ckpt.save_checkpoint(
                        self.weights_path, self.metrics_path, epoch, self.params,
                        self.opt_state, sched_state, self.train_losses, self.val_losses,
                    )
                    self.log.debug("Epoch: %s saved", epoch)
                if tg_logger is not None:
                    tg_logger.log(f"Epoch: {epoch} saved")
        if self._async_ckpt is not None:
            self._async_ckpt.wait()
        return self.train_losses, self.val_losses

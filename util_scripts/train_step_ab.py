"""Interleaved in-process A/B harness for the train-step MFU work (round 3).

Decomposes the flagship bf16 train step (B=64) into its cost regions and
times optimizer variants, all in ONE process with interleaved windows
(cross-process chip timings swing 2-4x run to run — CLAUDE.md). Each window
ends with a device fetch of a scalar checksum (block_until_ready returns
early over axon).

Variants:
  full        — production step (make_train_step, Adam fp32 moments)
  frozen_head — same model with hypernet heads frozen (no dW GEMM, no head
                moment traffic): bounds the head-training cost
  grad_only   — value_and_grad without the optimizer update/apply
  loss_only   — forward + losses only
  mom_bf16    — Adam with BOTH moments stored bf16 (optax mu_dtype covers mu
                only; scale_by_adam_lowp in train/optim.py covers nu too)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/train_step_ab.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402
from hyperpocket_tpu.models import FullModel  # noqa: E402
from hyperpocket_tpu.train.optim import make_optimizer, scale_by_adam_lowp  # noqa: E402
from hyperpocket_tpu.train.trainer import make_train_step  # noqa: E402
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

B = 64
WARMUP = 5
ITERS = 60
WINDOWS = 4


def timed(dispatch) -> float:
    """Median of WINDOWS interleave-ready windows, seconds per iteration."""
    times = []
    for _ in range(WINDOWS):
        out = dispatch(0)
        np.asarray(jax.device_get(out))
        t0 = time.monotonic()
        for i in range(ITERS):
            out = dispatch(i)
        np.asarray(jax.device_get(out))
        times.append((time.monotonic() - t0) / ITERS)
    return float(np.median(times))


def main():
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    import os

    os.environ["HPCD_TRUNK_FUSED_FWD"] = "0"  # baseline variants: XLA trunk fwd
    import optax

    model = FullModel.from_config({**FLAGSHIP_CONFIG, "compute_dtype": "bfloat16"})
    frozen_cfg = {**FLAGSHIP_CONFIG, "compute_dtype": "bfloat16"}
    frozen_cfg["target_network"] = {**frozen_cfg["target_network"],
                                    "freeze_layers_learning": True}
    model_frozen = FullModel.from_config(frozen_cfg)

    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    existing = jnp.asarray(rng.standard_normal((B, 1024, 3)), jnp.float32)
    missing = jnp.asarray(rng.standard_normal((B, 1024, 3)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((B, 2048, 3)), jnp.float32)
    epoch = jnp.asarray(100.0)

    opt_cfg = {"type": "Adam", "hyperparams": {"lr": 1e-4}}
    tx = make_optimizer(opt_cfg)
    tx_bf16 = make_optimizer(opt_cfg, moment_dtype="bfloat16")

    def mk_state(t):
        return {
            "p": jax.tree_util.tree_map(jnp.copy, params),
            "s": jax.jit(t.init)(params),
        }

    def step_dispatch(step_fn, st):
        def dispatch(i):
            st["p"], st["s"], loss, *_ = step_fn(
                st["p"], st["s"], existing, missing, gt,
                np.uint32(i), epoch, num_points=2048,
            )
            return loss
        return dispatch

    # ---- value_and_grad / loss-only (no donation needed) -------------------
    from hyperpocket_tpu.train.losses import kld_loss, reconstruction_loss

    def loss_fn(p, key):
        rec, mu, sigma = model.apply(p, existing, missing, key, epoch,
                                     num_output_points=2048, training=True)
        return reconstruction_loss(gt, rec, 0.05) + kld_loss(mu, sigma, B), 0.0

    @jax.jit
    def grad_only(p, i):
        key = jax.random.key(i, impl="rbg")
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, key)
        # cheap tree checksum keeps the whole backward live
        leaves = jax.tree_util.tree_leaves(g)
        return loss + sum(jnp.sum(jnp.abs(l[:1].ravel()[:8])) for l in leaves)

    @jax.jit
    def loss_only(p, i):
        key = jax.random.key(i, impl="rbg")
        return loss_fn(p, key)[0]

    variants = {}
    st_full = mk_state(tx)
    step_full = make_train_step(model, tx, 0.05, "rbg")
    variants["full"] = step_dispatch(step_full, st_full)

    st_mom = mk_state(tx_bf16)
    step_mom = make_train_step(model, tx_bf16, 0.05, "rbg")
    variants["mom_bf16"] = step_dispatch(step_mom, st_mom)

    # frozen heads: trainable mask like the Trainer builds
    import jax.tree_util as jtu
    mask = jtu.tree_map_with_path(
        lambda path, _: not ("hyper_network" in [getattr(p, "key", None) for p in path]
                             and "heads" in [getattr(p, "key", None) for p in path]),
        params,
    )
    tx_frozen = make_optimizer(opt_cfg, mask)
    st_frozen = mk_state(tx_frozen)
    step_frozen = make_train_step(model_frozen, tx_frozen, 0.05, "rbg")
    variants["frozen_head"] = step_dispatch(step_frozen, st_frozen)

    variants["grad_only"] = lambda i: grad_only(st_full["p"], np.uint32(i))
    variants["loss_only"] = lambda i: loss_only(st_full["p"], np.uint32(i))

    # chamfer isolation: same forward/backward graph with the NN-search term
    # replaced by a cheap elementwise surrogate — grad_only minus this is the
    # in-step cost of Chamfer fwd+bwd (standalone kernel timings over-count:
    # XLA overlaps the NN sweeps with decode/backbone work in the real step).
    def loss_fn_nochamfer(p, key):
        rec, mu, sigma = model.apply(p, existing, missing, key, epoch,
                                     num_output_points=2048, training=True)
        return jnp.sum(rec * rec) * 1e-6 + kld_loss(mu, sigma, B), 0.0

    @jax.jit
    def grad_nochamfer(p, i):
        key = jax.random.key(i, impl="rbg")
        (loss, _), g = jax.value_and_grad(loss_fn_nochamfer, has_aux=True)(p, key)
        leaves = jax.tree_util.tree_leaves(g)
        return loss + sum(jnp.sum(jnp.abs(l[:1].ravel()[:8])) for l in leaves)

    variants["grad_nochamfer"] = lambda i: grad_nochamfer(st_full["p"], np.uint32(i))

    # fused head-Adam (pallas dW+moment+param single pass, bf16 moments)
    from hyperpocket_tpu.train.trainer import init_head_adam_state, make_fused_train_step

    headw_mask = jtu.tree_map_with_path(
        lambda path, _: not ("hyper_network" in [getattr(q, "key", None) for q in path]
                             and "heads" in [getattr(q, "key", None) for q in path]
                             and "w" in [getattr(q, "key", None) for q in path]),
        params,
    )
    tx_headmask = make_optimizer(opt_cfg, headw_mask)
    fstep = make_fused_train_step(model, tx_headmask, 0.05, "rbg")
    st_fused = mk_state(tx_headmask)
    st_fused["h"] = init_head_adam_state(params, "bfloat16")

    def fused_dispatch(i):
        st_fused["p"], st_fused["s"], st_fused["h"], loss, *_ = fstep(
            st_fused["p"], st_fused["s"], st_fused["h"], existing, missing, gt,
            np.uint32(i), epoch, num_points=2048,
        )
        return loss

    variants["fused_head"] = fused_dispatch

    # fused head-Adam + bf16 moments for the REST of the params
    tx_both = make_optimizer(opt_cfg, headw_mask, moment_dtype="bfloat16")
    fstep2 = make_fused_train_step(model, tx_both, 0.05, "rbg")
    st_fused2 = mk_state(tx_both)
    st_fused2["h"] = init_head_adam_state(params, "bfloat16")

    def fused2_dispatch(i):
        st_fused2["p"], st_fused2["s"], st_fused2["h"], loss, *_ = fstep2(
            st_fused2["p"], st_fused2["s"], st_fused2["h"], existing, missing, gt,
            np.uint32(i), epoch, num_points=2048,
        )
        return loss

    variants["fused+mom16"] = fused2_dispatch

    # flash trunk: fused Pallas forward (pooled+argmax, zero activation HBM)
    # + the sparse XLA backward (round-4 candidate #3). Env toggle is read at
    # trace time, so trace this variant NOW with it on, then restore.
    import os

    os.environ["HPCD_TRUNK_FUSED_FWD"] = "1"
    tx_ff = make_optimizer(opt_cfg, moment_dtype="bfloat16")
    step_ff = make_train_step(model, tx_ff, 0.05, "rbg")
    st_ff = mk_state(tx_ff)
    ff_dispatch = step_dispatch(step_ff, st_ff)
    out = ff_dispatch(0)
    np.asarray(jax.device_get(out))

    @jax.jit
    def loss_only_ff(p, i):
        key = jax.random.key(i, impl="rbg")
        return loss_fn(p, key)[0]

    np.asarray(jax.device_get(loss_only_ff(st_full["p"], np.uint32(0))))
    os.environ["HPCD_TRUNK_FUSED_FWD"] = "0"
    variants["ffwd+mom16"] = ff_dispatch
    variants["loss_only_ff"] = lambda i: loss_only_ff(st_full["p"], np.uint32(i))

    # warm up everything first (compiles), then interleave timed windows
    for name, d in variants.items():
        for i in range(WARMUP):
            out = d(i)
        np.asarray(jax.device_get(out))
        print(f"warm {name}", flush=True)

    results = {name: timed(d) for name in list(variants) for d in [variants[name]]}
    base = results["full"]
    print("\n=== train-step decomposition (B=64 bf16, ms/step) ===")
    for name, dt in results.items():
        print(f"{name:12s} {dt * 1e3:7.3f} ms  ({dt / base * 100:5.1f}% of full)")
    print(f"optimizer+apply = full - grad_only = {(results['full'] - results['grad_only']) * 1e3:.3f} ms")
    print(f"backward = grad_only - loss_only = {(results['grad_only'] - results['loss_only']) * 1e3:.3f} ms")
    print(f"head-training cost = full - frozen_head = {(results['full'] - results['frozen_head']) * 1e3:.3f} ms")
    print(f"mom_bf16 delta = {(results['full'] - results['mom_bf16']) * 1e3:.3f} ms")
    if "grad_nochamfer" in results:
        print(f"in-step chamfer fwd+bwd = grad_only - grad_nochamfer = "
              f"{(results['grad_only'] - results['grad_nochamfer']) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()

"""Optimizer + LR-scheduler registry with torch-name compatibility.

The reference resolves optimizers/schedulers reflectively by class name from
``torch.optim`` (core/main.py:62-66); here the same config schema
(``{"type": "Adam", "hyperparams": {...}}``) maps onto optax transforms with
matching update semantics:

* Adam: L2 weight decay is *coupled* (added to the gradient before the
  moment estimates), like torch.optim.Adam.
* AdamW: decoupled decay, like torch.optim.AdamW.
* Schedulers step per *epoch* (scheduler.step() after each epoch,
  core/main.py:108): we expose ``make_lr_schedule`` returning
  ``lr_for_epoch(epoch)`` with torch's convention that epoch 1 runs at the
  base LR (the internal counter starts at 0).

The optimizer is wrapped in ``optax.inject_hyperparams`` so the per-epoch LR
is a leaf of the optimizer state — updated on the host between epochs, no
recompilation.
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                       moment_dtype="bfloat16") -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in ``moment_dtype``.

    optax's ``mu_dtype`` covers the first moment only; the flagship model's
    optimizer-state HBM traffic is dominated by the (2048, 19011) hypernet
    head (~312 MB/step of fp32 moment reads+writes), so halving BOTH moment
    widths is the traffic lever. Moment math runs in the grad dtype (fp32)
    and results are cast on store; bias correction and the update expression
    match torch/optax Adam exactly apart from the storage rounding
    (bf16 nu => ~0.4% relative sqrt(v) error; convergence must be verified
    per-config — see util_scripts/train_step_ab.py and CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    md = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=md)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        mu = jax.tree_util.tree_map(
            lambda g, m: (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(md),
            grads, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: (b2 * v.astype(g.dtype) + (1 - b2) * g * g).astype(md),
            grads, state.nu,
        )
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m.astype(jnp.float32) / bc1)
            / (jnp.sqrt(v.astype(jnp.float32) / bc2) + eps),
            mu, nu,
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(opt_config: dict, trainable_mask=None,
                   moment_dtype: str | None = None) -> optax.GradientTransformation:
    """Build an optax optimizer from a reference-schema optimizer config.

    ``trainable_mask``: optional pytree of bools matching the params; False
    leaves receive zero updates (``optax.set_to_zero`` via multi_transform —
    NOT ``optax.masked``, which would pass raw gradients through unscaled).
    The reference excludes frozen hypernetwork heads from the optimizer
    (full_model.py's ``parameters``); stop_gradient alone would not stop
    coupled weight decay.

    ``moment_dtype`` (config ``training.optimizer.moment_dtype`` /
    ``hyperparams`` untouched): store Adam moments in a narrower dtype via
    :func:`scale_by_adam_lowp` — an HBM-traffic optimization for
    head-dominated models; fp32 default preserves exact torch parity.
    """
    kind = opt_config["type"]
    hp = dict(opt_config.get("hyperparams", {}))
    lr = float(hp.pop("lr", 1e-3))

    if kind in ("Adam", "AdamW"):
        b1, b2 = hp.pop("betas", (0.9, 0.999))
        eps = float(hp.pop("eps", 1e-8))
        wd = float(hp.pop("weight_decay", 0.0))
        amsgrad = bool(hp.pop("amsgrad", False))
        moment_dtype = hp.pop("moment_dtype", moment_dtype)
        if amsgrad and moment_dtype is not None:
            raise ValueError(
                "moment_dtype is not supported with amsgrad=true "
                "(scale_by_amsgrad keeps fp32 moments); drop one of the two"
            )

        def build(learning_rate):
            parts = []
            if kind == "Adam" and wd:
                parts.append(optax.add_decayed_weights(wd))  # coupled L2
            if amsgrad:
                scaler = optax.scale_by_amsgrad(b1=float(b1), b2=float(b2), eps=eps)
            elif moment_dtype is not None:
                scaler = scale_by_adam_lowp(float(b1), float(b2), eps, moment_dtype)
            else:
                scaler = optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps)
            parts.append(scaler)
            if kind == "AdamW" and wd:
                parts.append(optax.add_decayed_weights(wd))  # decoupled
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    elif kind == "SGD":
        momentum = float(hp.pop("momentum", 0.0))
        wd = float(hp.pop("weight_decay", 0.0))
        nesterov = bool(hp.pop("nesterov", False))

        def build(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            if momentum:
                parts.append(optax.trace(decay=momentum, nesterov=nesterov))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    elif kind == "RMSprop":
        alpha = float(hp.pop("alpha", 0.99))
        eps = float(hp.pop("eps", 1e-8))
        wd = float(hp.pop("weight_decay", 0.0))

        def build(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    else:
        raise ValueError(f"unsupported optimizer type: {kind!r}")

    if trainable_mask is not None:
        import jax.tree_util as jtu

        labels = jtu.tree_map(lambda t: "train" if t else "freeze", trainable_mask)
        inner_build = build

        def build(learning_rate):  # noqa: F811 — frozen leaves get zero updates
            return optax.multi_transform(
                {"train": inner_build(learning_rate), "freeze": optax.set_to_zero()},
                labels,
            )

    return optax.inject_hyperparams(build)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Return a new opt state with the injected LR leaf replaced.

    Purely functional (``_replace`` on the inject_hyperparams state + a fresh
    hyperparams dict) — callers must reassign the result. In-place dict
    mutation would silently break if the state were donated or frozen.
    """
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lr}
    )


def make_lr_schedule(sched_config: dict | None, base_lr: float) -> Callable[[int], float]:
    """Return ``lr_for_epoch(epoch)`` for 1-indexed epochs.

    torch semantics: the scheduler's internal counter is ``epoch - 1`` while
    epoch ``e`` is running (scheduler.step() fires at the end of each epoch).
    """
    if not sched_config:
        return lambda epoch: base_lr
    kind = sched_config["type"]
    hp = dict(sched_config.get("hyperparams", {}))

    if kind == "StepLR":
        step_size = int(hp["step_size"])
        gamma = float(hp.get("gamma", 0.1))
        return lambda epoch: base_lr * gamma ** ((epoch - 1) // step_size)
    if kind == "MultiStepLR":
        milestones = sorted(int(m) for m in hp["milestones"])
        gamma = float(hp.get("gamma", 0.1))
        return lambda epoch: base_lr * gamma ** sum(1 for m in milestones if (epoch - 1) >= m)
    if kind == "ExponentialLR":
        gamma = float(hp["gamma"])
        return lambda epoch: base_lr * gamma ** (epoch - 1)
    if kind == "CosineAnnealingLR":
        t_max = int(hp["T_max"])
        eta_min = float(hp.get("eta_min", 0.0))
        return lambda epoch: eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * (epoch - 1) / t_max)
        ) / 2
    if kind in ("ConstantLR", "LambdaLR", "None"):
        return lambda epoch: base_lr
    raise ValueError(f"unsupported lr_scheduler type: {kind!r}")

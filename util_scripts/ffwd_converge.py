"""Convergence check for the flash-trunk training forward (real chip).

bf16 flagship config, 30 epochs on the 120-model ellipsoid corpus, run
twice in ONE process: HPCD_TRUNK_FUSED_FWD=0 (XLA trunk forward, the
convergence-verified baseline) vs =1 (fused Pallas pooled+argmax forward,
sparse backward). The kernel's bf16 chain agrees with XLA only to rounding,
so argmax routing can differ on near-ties — this run bounds the effect at
trajectory level. Equivalent = same loss scale/monotonicity and best-val
within the fp32-vs-bf16 spread already accepted (CLAUDE.md round-1 table).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/ffwd_converge.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from util_scripts.make_synthetic_dataset import make_ellipsoid_dataset  # noqa: E402

ROOT = "/tmp/ell_corpus120"
CAT = "02691156"


def make_config(results_root: str) -> dict:
    return {
        "mode": "training",
        "dataset": {"name": "shapenet", "path": ROOT, "classes": [CAT],
                    "is_rotated": False, "num_samples": 1, "gen_test_set": False},
        "training": {
            "optimizer": {"type": "Adam",
                          "hyperparams": {"lr": 0.0001, "weight_decay": 0,
                                          "betas": [0.9, 0.999], "amsgrad": False}},
            "lr_scheduler": {"type": "StepLR",
                             "hyperparams": {"step_size": 3000, "gamma": 0.01}},
            "dataloader": {
                "train": {"batch_size": 32, "shuffle": True, "num_workers": 2,
                          "drop_last": True},
                "val": {"batch_size": 32, "shuffle": False, "num_workers": 2,
                        "drop_last": False},
            },
            "state_save_frequency": 100,
            "loss_coef": 0.05,
            "max_epoch": 30,
            "matmul_precision": "highest",
        },
        "full_model": {
            "random_encoder": {"output_size": 128, "use_bias": True, "relu_slope": 0.2},
            "real_encoder": {"output_size": 128, "use_bias": True, "relu_slope": 0.2},
            "hyper_network": {"use_bias": True, "relu_slope": 0.2},
            "target_network": {"use_bias": True, "relu_slope": 0.2,
                               "freeze_layers_learning": False,
                               "layer_out_channels": [32, 64, 128, 64]},
            "target_network_input": {"constant": False,
                                     "normalization": {"enable": True,
                                                       "type": "progressive",
                                                       "epoch": 100}},
            "compute_dtype": "bfloat16",
        },
        "setup": {"seed": 2020, "gpu_id": 0},
        "telegram_logger": {"enable": False, "bot_token": "", "chat_id": ""},
        "results_root": results_root,
    }


def main():
    if not os.path.exists(os.path.join(ROOT, CAT)):
        t0 = time.time()
        make_ellipsoid_dataset(ROOT, n_models=120, seed=0)
        print(f"corpus built in {time.time() - t0:.0f}s", flush=True)

    from hyperpocket_tpu.train.trainer import Trainer
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    for mode, env in (("bf16-xla-fwd", "0"), ("bf16-fused-fwd", "1")):
        os.environ["HPCD_TRUNK_FUSED_FWD"] = env
        cfg = make_config(f"/tmp/conv_{mode}")
        t0 = time.time()
        tr = Trainer(cfg, use_mesh=False)
        tr.run(plot_samples=False)
        dt = time.time() - t0
        tl = tr.train_losses
        print(f"[{mode}] done in {dt:.0f}s; "
              f"train Loss_ALL {tl[0][0]:.1f} -> {tl[-1][0]:.1f}; "
              f"best val {tr.best_epoch_loss:.2f}", flush=True)


if __name__ == "__main__":
    main()

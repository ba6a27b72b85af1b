"""Evaluation: generative metrics and the experiment registry."""

from hyperpocket_tpu.eval.metrics import (
    EMD_CD,
    compute_all_metrics,
    jsd_between_point_cloud_sets,
    mmd_cov,
    pairwise_emd_cd,
)

__all__ = [
    "EMD_CD",
    "compute_all_metrics",
    "jsd_between_point_cloud_sets",
    "mmd_cov",
    "pairwise_emd_cd",
]

"""Model family: PointNet encoders, hypernetwork, target network, FullModel."""

from hyperpocket_tpu.models.encoder import init_encoder, encoder_forward, reparameterize
from hyperpocket_tpu.models.hyper_network import (
    init_hyper_network,
    hyper_network_forward,
    target_weight_count,
)
from hyperpocket_tpu.models.target_network import (
    target_network_forward,
    batched_target_network_forward,
)
from hyperpocket_tpu.models.full_model import FullModel

__all__ = [
    "init_encoder",
    "encoder_forward",
    "reparameterize",
    "init_hyper_network",
    "hyper_network_forward",
    "target_weight_count",
    "target_network_forward",
    "batched_target_network_forward",
    "FullModel",
]

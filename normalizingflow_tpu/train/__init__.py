from .checkpoint import load_checkpoint, save_checkpoint
from .fused import train_flow_fused
from .loop import TrainState, make_optimizer, make_train_step, train_flow
from .objectives import elbo, forward_kl, forward_kl_loss, reverse_kl

__all__ = [
    "load_checkpoint", "save_checkpoint",
    "TrainState", "make_optimizer", "make_train_step", "train_flow",
    "train_flow_fused",
    "elbo", "forward_kl", "forward_kl_loss", "reverse_kl",
]

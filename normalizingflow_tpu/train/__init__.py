from .checkpoint import load_checkpoint, save_checkpoint
from .fused import train_flow_fused
from .loop import make_optimizer
from .objectives import elbo, forward_kl, forward_kl_loss, reverse_kl

__all__ = [
    "load_checkpoint", "save_checkpoint",
    "make_optimizer",
    "train_flow_fused",
    "elbo", "forward_kl", "forward_kl_loss", "reverse_kl",
]

"""Training layer: losses, metrics, optimizer/step factory, checkpointing."""

from outdoor_nerf_depth_tpu.train import losses
from outdoor_nerf_depth_tpu.train import metrics

__all__ = ["losses", "metrics"]

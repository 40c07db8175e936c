"""Image helpers and visualization."""

from outdoor_nerf_depth_tpu.utils import image
from outdoor_nerf_depth_tpu.utils import vis

__all__ = ["image", "vis"]

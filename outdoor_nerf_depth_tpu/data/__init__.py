"""Data layer: COLMAP ingestion, camera/ray math, host-sharded ray batching."""

from outdoor_nerf_depth_tpu.data import cameras
from outdoor_nerf_depth_tpu.data import colmap
from outdoor_nerf_depth_tpu.data import rays

__all__ = ["cameras", "colmap", "rays"]

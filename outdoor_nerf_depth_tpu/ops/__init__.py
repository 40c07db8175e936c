"""Pure-array math for TPU volume rendering: no modules, no state, jit-safe."""

from outdoor_nerf_depth_tpu.ops import geometry
from outdoor_nerf_depth_tpu.ops import mathx
from outdoor_nerf_depth_tpu.ops import spaces
from outdoor_nerf_depth_tpu.ops import stepfuns
from outdoor_nerf_depth_tpu.ops import volren

__all__ = ["geometry", "mathx", "spaces", "stepfuns", "volren"]

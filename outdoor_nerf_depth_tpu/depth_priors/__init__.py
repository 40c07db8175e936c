"""Depth-prior generators: stereo matching and depth completion.

Capability parity with the reference's `depth-methods/` side stacks
(SURVEY.md section 2.4): CFNet/PCWNet-style cost-volume stereo (producing
`stereo_crop` and confidence-filtered `ste_conf` priors), std2019-style
RGB-D completion and MFF-Net-style guided completion (producing `mff_crop`
priors). All nets are JAX/flax, MXU-shaped (NHWC convs, GroupNorm instead of
BatchNorm — running BN stats are hostile to small per-device batches and
to the functional train step), and their inference CLIs write the uint16
depth-PNG contract the NeRF data layer consumes.
"""

from outdoor_nerf_depth_tpu.depth_priors import benchmark_data, completion, stereo

__all__ = ["benchmark_data", "completion", "stereo"]

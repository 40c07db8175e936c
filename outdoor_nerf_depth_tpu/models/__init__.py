"""Scene-field plugins sharing one renderer interface.

Every model is a flax module with the signature
  model.apply(vars, rng, rays, train_frac, compute_extras)
    -> (renderings: list[dict], ray_history: list[dict])
where `renderings[-1]` is the finest pass (rgb/depth/distance_mean/...) and
`ray_history[i]` carries the per-level quantities the losses need
(weights + tdist edges, or steps/lengths for point-sampled models).
"""

from outdoor_nerf_depth_tpu.models.mipnerf360 import ProposalModel
from outdoor_nerf_depth_tpu.models.nerfpp import InvertedSphereModel


def build(name: str, **overrides):
    """Construct a model plugin by name."""
    registry = {
        "mipnerf360": ProposalModel,
        "nerfpp": InvertedSphereModel,
    }
    try:
        from outdoor_nerf_depth_tpu.models.ngp import HashGridModel

        registry["ngp"] = HashGridModel
    except ImportError:
        pass
    if name not in registry:
        raise ValueError(f"unknown model {name!r}; have {sorted(registry)}")
    return registry[name](**overrides)


__all__ = ["ProposalModel", "InvertedSphereModel", "build"]

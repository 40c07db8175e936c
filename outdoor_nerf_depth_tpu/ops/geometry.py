"""Ray/sphere geometry for unbounded-scene parametrizations.

Capability parity with NeRF++'s scene geometry
(`/root/reference/nerf-methods/nerfplusplus/ddp_train_nerf.py:51-78` and
`nerfplusplus/ddp_model.py:16-45`): unit-sphere intersection and the
inverted-sphere background parametrization. Written for XLA: no data-dependent
raises — out-of-sphere configurations are clamped and reported via a mask the
caller can assert on host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-6


def intersect_unit_sphere(ray_o: jax.Array, ray_d: jax.Array):
    """Distance along each ray to its exit from the unit sphere.

    Assumes origins lie inside the sphere (the NeRF++ camera-normalization
    invariant). Returns (t_exit, valid) where `valid` flags rays whose
    closest-approach point actually lies inside the sphere; invalid rays get
    a clamped, finite t_exit instead of NaN so jit never sees an exception.
    """
    d_dot = jnp.sum(ray_d * ray_d, axis=-1)
    t_mid = -jnp.sum(ray_d * ray_o, axis=-1) / d_dot
    p_mid = ray_o + t_mid[..., None] * ray_d
    p_sq = jnp.sum(p_mid * p_mid, axis=-1)
    valid = p_sq < 1.0
    half_chord = jnp.sqrt(jnp.maximum(0.0, 1.0 - p_sq)) / jnp.sqrt(d_dot)
    return t_mid + half_chord, valid


def inverted_sphere_points(ray_o: jax.Array, ray_d: jax.Array, inv_r: jax.Array):
    """NeRF++ background parametrization: point at radius 1/inv_r on a ray.

    For each inverse radius `inv_r` in (0, 1], finds the point where the ray
    crosses the sphere of radius 1/inv_r by rotating the unit-sphere exit
    point (Rodrigues' formula around the plane normal of the ray), and
    returns:
      pts: [..., 4] — the unit direction of that point concatenated with
        inv_r (the 4D bg input (x', y', z', 1/r)),
      t_metric: [...] — the metric distance along the ray to that point,
        used to composite a real expected depth for the background.
    """
    d_dot = jnp.sum(ray_d * ray_d, axis=-1)
    t_mid = -jnp.sum(ray_d * ray_o, axis=-1) / d_dot
    p_mid = ray_o + t_mid[..., None] * ray_d
    p_mid_r = jnp.linalg.norm(p_mid, axis=-1)
    inv_d_norm = 1.0 / jnp.sqrt(d_dot)

    half_chord = jnp.sqrt(jnp.maximum(0.0, 1.0 - p_mid_r**2)) * inv_d_norm
    p_exit = ray_o + (t_mid + half_chord)[..., None] * ray_d

    # Rotate p_exit within the ray plane from angle asin(|p_mid|) down to
    # asin(|p_mid| * inv_r): the sphere crossing at radius 1/inv_r.
    axis = jnp.cross(ray_o, p_exit)
    axis = axis / jnp.maximum(_TINY, jnp.linalg.norm(axis, axis=-1, keepdims=True))
    # Clip asin inputs: |p_mid| can graze 1.0 from roundoff.
    safe_asin = lambda x: jnp.arcsin(jnp.clip(x, -1.0 + _TINY, 1.0 - _TINY))
    angle = (safe_asin(p_mid_r) - safe_asin(p_mid_r * inv_r))[..., None]

    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
    rotated = (
        p_exit * cos_a
        + jnp.cross(axis, p_exit) * sin_a
        + axis * jnp.sum(axis * p_exit, axis=-1, keepdims=True) * (1.0 - cos_a)
    )
    rotated = rotated / jnp.maximum(
        _TINY, jnp.linalg.norm(rotated, axis=-1, keepdims=True)
    )
    pts = jnp.concatenate([rotated, inv_r[..., None]], axis=-1)

    theta = safe_asin(p_mid_r * inv_r)
    t_metric = jnp.cos(theta) * inv_d_norm / jnp.maximum(_TINY, inv_r) + t_mid
    return pts, t_metric

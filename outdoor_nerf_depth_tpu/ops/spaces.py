"""Coordinate spaces, ray-distance warps, and frequency encodings.

Capability parity with the reference coordinate layer
(`/root/reference/nerf-methods/mipnerf360/internal/coord.py:21-147`): the
mip-NeRF 360 scene contraction, metric<->normalized distance bijections,
Gaussian tracking through nonlinear warps, and (integrated) positional
encodings. TPU-first choices:

* Gaussians are pushed through warps via `jax.linearize` once per point and
  the JVP is applied to covariance columns with `vmap` — one traced linear
  map, fused by XLA, instead of materializing Jacobians.
* IPE evaluates sin at two phase offsets rather than sin+cos pairs so the
  transcendental count stays minimal on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.ops import mathx

_EPS = jnp.finfo(jnp.float32).eps


def contract(x: jax.Array) -> jax.Array:
    """mip-NeRF 360 scene contraction (Eq. 10 of arxiv.org/abs/2111.12077).

    Identity inside the unit ball; maps all of space into radius 2 outside.
    """
    r_sq = jnp.maximum(_EPS, jnp.sum(x**2, axis=-1, keepdims=True))
    scale = (2.0 * jnp.sqrt(r_sq) - 1.0) / r_sq
    return jnp.where(r_sq <= 1.0, x, scale * x)


def uncontract(z: jax.Array) -> jax.Array:
    """Inverse of `contract` on its range (|z| < 2)."""
    r_sq = jnp.maximum(_EPS, jnp.sum(z**2, axis=-1, keepdims=True))
    return jnp.where(r_sq <= 1.0, z, z / (2.0 * jnp.sqrt(r_sq) - r_sq))


def track_gaussian(fn, mean: jax.Array, cov: jax.Array):
    """Push a Gaussian (mean, full cov) through `fn` by linearization.

    Linearizes `fn` at `mean` (extended Kalman update): the transformed
    covariance is J cov J^T, computed by applying the linearized map to the
    columns of cov twice via vmap — XLA sees one fused JVP, never an explicit
    Jacobian. `cov` must carry two trailing dims ([..., d, d]).
    """
    if mean.ndim + 1 != cov.ndim:
        raise ValueError(
            f"expected full covariance with one extra dim, got mean "
            f"{mean.shape} cov {cov.shape}"
        )
    fn_mean, jvp = jax.linearize(fn, mean)
    apply_cols = jax.vmap(jvp, in_axes=-1, out_axes=-2)
    fn_cov = apply_cols(apply_cols(cov))
    return fn_mean, fn_cov


# Named monotone warps for metric ray distance. Each entry: (fwd, inv).
_WARPS = {
    "reciprocal": (jnp.reciprocal, jnp.reciprocal),
    "log": (jnp.log, jnp.exp),
    "exp": (jnp.exp, jnp.log),
    "sqrt": (jnp.sqrt, jnp.square),
    "square": (jnp.square, jnp.sqrt),
}


def metric_to_normalized(warp, t_near, t_far):
    """Bijection between metric distance t and normalized distance s in [0,1].

    `warp` selects the spacing curve: None (linear), a name from
    {reciprocal, log, exp, sqrt, square}, 'piecewise' (linear near, 1/x far,
    valid for t_near=0), or a callable from the table above. Returns
    (t_to_s, s_to_t).
    """
    if warp is None:
        fwd = inv = lambda x: x
    elif warp == "piecewise" or getattr(warp, "__name__", None) == "piecewise":
        fwd = lambda x: jnp.where(x < 1.0, 0.5 * x, 1.0 - 0.5 / x)
        inv = lambda x: jnp.where(x < 0.5, 2.0 * x, 0.5 / (1.0 - x))
    else:
        name = warp if isinstance(warp, str) else warp.__name__
        if name not in _WARPS:
            raise ValueError(f"unknown ray-distance warp {name!r}")
        fwd, inv = _WARPS[name]

    s_near, s_far = fwd(t_near), fwd(t_far)
    t_to_s = lambda t: (fwd(t) - s_near) / (s_far - s_near)
    s_to_t = lambda s: inv(s * s_far + (1.0 - s) * s_near)
    return t_to_s, s_to_t


def expected_sin(mean: jax.Array, var: jax.Array) -> jax.Array:
    """E[sin(x)] for x ~ N(mean, var): exp(-var/2) sin(mean)."""
    return jnp.exp(-0.5 * var) * mathx.safe_sin(mean)


def integrated_pos_enc(
    mean: jax.Array, var: jax.Array, min_deg: int, max_deg: int
) -> jax.Array:
    """Integrated positional encoding of a diagonal Gaussian.

    Expected sinusoids of the Gaussian under frequencies 2^[min_deg, max_deg):
    output [..., 2 * d * n_freqs], ordered (all sin scales, all cos scales)
    with per-scale dims contiguous.
    """
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    out_shape = mean.shape[:-1] + (-1,)
    mean_s = (mean[..., None, :] * scales[:, None]).reshape(out_shape)
    var_s = (var[..., None, :] * scales[:, None] ** 2).reshape(out_shape)
    # cos(x) = sin(x + pi/2): one fused expected-sin over the doubled feature.
    phases = jnp.concatenate([mean_s, mean_s + 0.5 * jnp.pi], axis=-1)
    return expected_sin(phases, jnp.concatenate([var_s, var_s], axis=-1))


def pos_enc(
    x: jax.Array, min_deg: int, max_deg: int, append_identity: bool = True
) -> jax.Array:
    """Classic NeRF sinusoidal positional encoding at frequencies 2^deg."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    xs = (x[..., None, :] * scales[:, None]).reshape(x.shape[:-1] + (-1,))
    feat = jnp.sin(jnp.concatenate([xs, xs + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, feat], axis=-1)
    return feat


def project_and_diagonalize(mean: jax.Array, cov: jax.Array, basis: jax.Array):
    """Project a full-cov Gaussian onto `basis` columns; keep only marginals.

    Returns (basis^T-projected means, per-axis variances). `basis` is [d, m];
    the diagonal of basis^T cov basis is formed without the m x m product.
    """
    mean_p = mathx.matmul_hp(mean, basis)
    var_p = jnp.sum(basis * mathx.matmul_hp(cov, basis), axis=-2)
    return mean_p, var_p


@functools.lru_cache(maxsize=None)
def _unit_sphere_tesselation(base_shape: str, subdivisions: int):
    import numpy as np

    if base_shape == "icosahedron":
        phi = (np.sqrt(5.0) + 1.0) / 2.0
        verts = np.array(
            [
                (-1, 0, phi), (1, 0, phi), (-1, 0, -phi), (1, 0, -phi),
                (0, phi, 1), (0, phi, -1), (0, -phi, 1), (0, -phi, -1),
                (phi, 1, 0), (-phi, 1, 0), (phi, -1, 0), (-phi, -1, 0),
            ],
            dtype=np.float64,
        ) / np.sqrt(phi + 2.0)
        faces = np.array(
            [
                (0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
                (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
                (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
                (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11),
            ]
        )
    elif base_shape == "octahedron":
        verts = np.array(
            [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0)],
            dtype=np.float64,
        )
        # Faces = vertex triples adjacent to each cube corner.
        import itertools

        corners = np.array(list(itertools.product([-1, 1], repeat=3)))
        d = (
            np.sum(corners**2, 1)[:, None]
            + np.sum(verts**2, 1)[None, :]
            - 2 * corners @ verts.T
        )
        pairs = np.argwhere(np.isclose(d, 2.0))
        faces = np.sort(pairs[:, 1].reshape(3, -1).T, axis=1)
    else:
        raise ValueError(f"unknown base_shape {base_shape!r}")

    # Barycentric tesselation of each face, reprojected to the sphere.
    v = subdivisions
    bary = np.array(
        [(i, j, v - i - j) for i in range(v + 1) for j in range(v + 1 - i)],
        dtype=np.float64,
    ) / v
    pts = np.concatenate([bary @ verts[f] for f in faces], axis=0)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    # Deduplicate coincident vertices (first occurrence wins, preserving order).
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    first = np.array([np.argwhere(row <= 1e-4).min() for row in d2])
    pts = pts[np.unique(first)]
    return pts


def sphere_basis(
    base_shape: str = "icosahedron",
    subdivisions: int = 2,
    remove_symmetries: bool = True,
) -> jax.Array:
    """Geodesic-polyhedron direction basis, [3, m], for lifting 3D Gaussians.

    Tesselates an icosahedron/octahedron `subdivisions` times and (optionally)
    drops antipodal duplicates, matching the reference basis construction
    (`internal/geopoly.py:78-124`, including its xyz->zyx column flip) so
    models using it are weight-compatible in spirit.
    """
    import numpy as np

    verts = _unit_sphere_tesselation(base_shape, subdivisions)
    if remove_symmetries:
        d2 = np.sum((verts[:, None, :] + verts[None, :, :]) ** 2, -1)
        keep = np.any(np.triu(d2 < 1e-4), axis=1)
        verts = verts[keep]
    return jnp.asarray(verts[:, ::-1].T.copy(), dtype=jnp.float32)

"""Reflection directions and integrated directional encodings (Ref-NeRF).

Capability parity with the reference's Ref-NeRF extras
(`/root/reference/nerf-methods/mipnerf360/internal/ref_utils.py:22-177`):
vector reflection, weighted mean angular error, and the integrated
directional encoding (IDE) — spherical harmonics attenuated by a
von Mises-Fisher roughness, Eqs. 6-8 of arxiv.org/abs/2112.03907.

The SH coefficient table is built once in numpy at trace time; evaluation is
real-valued polynomials (no complex arithmetic on the VPU — the (x+iy)^m
powers are expanded into real/imaginary recurrences).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import mathx


def l2_normalize(x, eps=jnp.finfo(jnp.float32).eps):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x**2, -1, keepdims=True), eps))


def reflect(viewdirs, normals):
    """Reflect view directions about unit normals: 2(n.v)n - v."""
    return (
        2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True) * normals
        - viewdirs
    )


def weighted_mae_degrees(weights, normals, normals_gt):
    """Weighted mean angular error between unit normal fields, in degrees."""
    one = 1.0 - jnp.finfo(jnp.float32).eps
    cos = jnp.clip(jnp.sum(normals * normals_gt, -1), -one, one)
    return (weights * jnp.arccos(cos)).sum() / weights.sum() * 180.0 / jnp.pi


@functools.lru_cache(maxsize=None)
def _ide_tables(deg_view: int):
    """(ml_array [2, M], coefficient matrix [l_max+1, M]) for the IDE."""
    if deg_view > 5:
        raise ValueError("IDE is numerically unstable beyond degree 5")
    ml = []
    for i in range(deg_view):
        l = 2**i
        ml.extend((m, l) for m in range(l + 1))
    ml_array = np.array(ml).T  # [2, M]: rows (m, l)
    l_max = 2 ** (deg_view - 1)

    def binom(a, k):
        return np.prod(a - np.arange(k)) / math.factorial(k)

    def legendre_coeff(l, m, k):
        return (
            (-1) ** m
            * 2**l
            * math.factorial(l)
            / math.factorial(k)
            / math.factorial(l - k - m)
            * binom(0.5 * (l + k + m - 1.0), l)
        )

    mat = np.zeros((l_max + 1, ml_array.shape[1]))
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = (
                np.sqrt(
                    (2 * l + 1)
                    * math.factorial(l - m)
                    / (4 * np.pi * math.factorial(l + m))
                )
                * legendre_coeff(l, m, k)
            )
    return ml_array, mat


def generate_ide_fn(deg_view: int):
    """Returns ide(xyz, kappa_inv) -> [..., 2M] integrated dir encoding."""
    ml_array, mat = _ide_tables(deg_view)
    m_vals = jnp.asarray(ml_array[0], jnp.float32)
    l_vals = jnp.asarray(ml_array[1], jnp.float32)
    mat_j = jnp.asarray(mat, jnp.float32)
    l_max = mat.shape[0] - 1
    max_m = int(ml_array[0].max())

    def ide(xyz, kappa_inv):
        x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
        # Vandermonde in z times the coefficient matrix -> the z-polynomials.
        vmz = jnp.concatenate([z**i for i in range(l_max + 1)], axis=-1)
        poly = mathx.matmul_hp(vmz, mat_j)  # [..., M]

        # (x + i y)^m by real recurrence: re_0 = 1, im_0 = 0.
        res, ims = [jnp.ones_like(x)], [jnp.zeros_like(x)]
        for _ in range(max_m):
            re, im = res[-1], ims[-1]
            res.append(re * x - im * y)
            ims.append(re * y + im * x)
        re_all = jnp.concatenate(res, axis=-1)
        im_all = jnp.concatenate(ims, axis=-1)
        m_idx = ml_array[0]
        re_m = re_all[..., m_idx]
        im_m = im_all[..., m_idx]

        sigma = 0.5 * l_vals * (l_vals + 1.0)
        atten = jnp.exp(-sigma * kappa_inv)
        return jnp.concatenate(
            [re_m * poly * atten, im_m * poly * atten], axis=-1
        )

    return ide


def generate_dir_enc_fn(deg_view: int):
    """Plain (zero-roughness) directional SH encoding."""
    ide = generate_ide_fn(deg_view)

    def enc(xyz):
        return ide(xyz, jnp.zeros_like(xyz[..., :1]))

    return enc

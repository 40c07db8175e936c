"""Numerics primitives hardened for TPU/XLA.

Capability parity with the reference's numerics layer
(`/root/reference/nerf-methods/mipnerf360/internal/math.py:21-127`), designed
TPU-first:

* trig is range-reduced before hitting the VPU (large arguments NaN on TPU),
* `safe_exp` carries a custom JVP so gradients stay finite at the clamp,
* interpolation ships in two flavors: `sorted_interp` (comparison+reduction,
  no gathers -- the TPU fast path) and `gather_interp` (vmapped `jnp.interp`,
  the GPU-style path kept for equivalence testing),
* matmuls default to `Precision.HIGHEST` so the MXU runs the f32 passes needed
  by covariance projections.

Everything here is shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TRIG_PERIOD_CAP = 100.0 * jnp.pi
_EXP_CLAMP = 88.0  # exp(89) overflows f32.


def matmul_hp(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul (three-pass f32 on the MXU instead of bf16)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _range_reduce(x: jax.Array) -> jax.Array:
    # TPU transcendentals lose all precision (and may NaN) for |x| >> 1e5;
    # fold large args back into a fixed multiple of the period first.
    return jnp.where(jnp.abs(x) < _TRIG_PERIOD_CAP, x, x % _TRIG_PERIOD_CAP)


def safe_sin(x: jax.Array) -> jax.Array:
    """sin() with TPU-safe range reduction for large args."""
    return jnp.sin(_range_reduce(x))


def safe_cos(x: jax.Array) -> jax.Array:
    """cos() with TPU-safe range reduction for large args."""
    return jnp.cos(_range_reduce(x))


@jax.custom_jvp
def safe_exp(x: jax.Array) -> jax.Array:
    """exp() clamped to stay finite in f32."""
    return jnp.exp(jnp.minimum(x, _EXP_CLAMP))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
    # Keep the true (large) gradient above the clamp so optimization still
    # gets pushed back out of the saturated regime.
    (x,), (dx,) = primals, tangents
    y = safe_exp(x)
    return y, y * dx


def log_lerp(t, v_lo: float, v_hi: float):
    """Log-linear interpolation between two positive scalars, t clipped to [0,1]."""
    if v_lo <= 0 or v_hi <= 0:
        raise ValueError(f"log_lerp endpoints must be positive, got {v_lo}, {v_hi}")
    lo, hi = jnp.log(v_lo), jnp.log(v_hi)
    return jnp.exp(lo + jnp.clip(t, 0.0, 1.0) * (hi - lo))


def lr_schedule(
    step,
    lr_init: float,
    lr_final: float,
    max_steps: int,
    warmup_steps: int = 0,
    warmup_mult: float = 1.0,
):
    """Log-linear LR decay with an optional sine-eased warmup.

    Matches the semantics of the reference schedule
    (`internal/math.py:66-98`): lr(0)=lr_init, lr(max_steps)=lr_final,
    log-linear in between; when `warmup_steps>0` the rate is scaled by a
    smooth ease-in starting at `warmup_mult`.
    """
    if warmup_steps > 0:
        ease = jnp.sin(0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0.0, 1.0))
        scale = warmup_mult + (1.0 - warmup_mult) * ease
    else:
        scale = 1.0
    return scale * log_lerp(step / max_steps, lr_init, lr_final)


def bracket_pair(ge: jax.Array, vals: jax.Array):
    """Bracketing values for each query given a precomputed comparison mask.

    Args:
      ge: bool [..., Q, P] where ge[..., q, p] == (query_q >= knot_p).
      vals: [..., P] per-knot values, sorted along the last axis.

    Returns:
      (lo, hi): each [..., Q]. `lo` is vals at the last knot <= query (or
      vals[0] if the query precedes all knots); `hi` is vals at the first
      knot > query (or vals[-1] if the query follows all knots).

    This is the comparison+reduction primitive that replaces gathers for CDF
    inversion on TPU: O(Q*P) VPU work, zero dynamic addressing.
    """
    expand = vals[..., None, :]
    lo = jnp.max(jnp.where(ge, expand, vals[..., None, :1]), axis=-1)
    hi = jnp.min(jnp.where(ge, vals[..., None, -1:], expand), axis=-1)
    return lo, hi


def sorted_interp(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """Piecewise-linear interpolation where `xp`, `fp`, and `x` are sorted.

    TPU fast path: brute-force comparisons + min/max reductions instead of
    the gathers `jnp.interp` lowers to. Equivalent to `gather_interp` for
    in-range queries (pinned by tests).
    """
    ge = x[..., :, None] >= xp[..., None, :]
    xp_lo, xp_hi = bracket_pair(ge, xp)
    fp_lo, fp_hi = bracket_pair(ge, fp)
    t = jnp.clip(jnp.nan_to_num((x - xp_lo) / (xp_hi - xp_lo), nan=0.0), 0.0, 1.0)
    return fp_lo + t * (fp_hi - fp_lo)


def gather_interp(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """Gather-based batched jnp.interp (the GPU-friendly variant)."""
    flat = lambda a: a.reshape((-1, a.shape[-1]))
    out = jax.vmap(jnp.interp)(flat(x), flat(xp), flat(fp))
    return out.reshape(x.shape)


def searchsorted_pair(knots: jax.Array, queries: jax.Array):
    """Bracketing *indices* of each query within sorted `knots`.

    Returns (idx_lo, idx_hi) with knots[idx_lo] <= q < knots[idx_hi] for
    in-range q; out-of-range queries clamp both indices to the first/last
    knot. Same comparison+reduction scheme as `sorted_interp` (queries need
    not be sorted here).
    """
    n = knots.shape[-1]
    idx = jnp.arange(n)
    ge = queries[..., :, None] >= knots[..., None, :]
    idx_lo = jnp.max(jnp.where(ge, idx, 0), axis=-1)
    idx_hi = jnp.min(jnp.where(ge, n - 1, idx), axis=-1)
    return idx_lo, idx_hi

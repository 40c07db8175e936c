"""Pallas TPU kernel: fused alpha-compositing weights (fw + analytic bw).

TPU-native replacement for the reference's fused CUDA compositing kernels
(`/root/reference/nerf-methods/ngp-depth/models/csrc/volumerendering.cu:7-202`
and their autograd bridge `custom_functions.py:102-173`). The CUDA version
walks each ray's samples sequentially with early termination and reconstructs
gradients with an in-kernel suffix sum (`volumerendering.cu:135-146`). On TPU
both directions become dense linear algebra on the MXU:

  forward:   P = tau @ SU        (strictly-upper ones: exclusive prefix sum)
             T = exp(-P); w_i = T_i - T_{i+1} = T_i * (1 - exp(-tau_i))
  backward:  dL/dtau_k = g_k * T_{k+1} - sum_{i>k} g_i * w_i
             (suffix sum = (g*w) @ SL, strictly-lower ones)

A [R, S] block of rays multiplies one [S, S] constant triangular matrix —
one MXU pass each way, no scan, no atomics, fully static shapes. Early
termination is weight collapse (w -> 0 once T underflows), as everywhere in
this framework.

`weights_from_tau` is the public op (custom VJP). `weights_from_tau_reference`
is the pure-jnp ground truth used by the tests and as the non-TPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

_TILE_R = 128  # rays per grid program
_LANE = 128  # TPU lane width; S is padded to a multiple of this


def weights_from_tau_reference(tau):
    """Pure-jnp ground truth: w_i = T_i * (1 - exp(-tau_i)).

    T_i = exp(-sum_{j<i} tau_j). Matches
    `ops.volren.alpha_composite_weights` with metric optical depth `tau`.
    """
    p = jnp.concatenate(
        [jnp.zeros_like(tau[..., :1]), jnp.cumsum(tau[..., :-1], axis=-1)],
        axis=-1,
    )
    trans = jnp.exp(-p)
    return trans * (1.0 - jnp.exp(-tau))


def _fwd_kernel(tau_ref, su_ref, w_ref, e_ref):
    tau = tau_ref[:]
    # Exclusive prefix sum on the MXU: P[r, i] = sum_j tau[r, j] * [j < i].
    p = jax.lax.dot_general(
        tau,
        su_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Transmittance needs true-f32 accumulation: bf16-grade MXU passes
        # lose ~1e-3 of weight mass on O(10) optical depths.
        precision=jax.lax.Precision.HIGHEST,
    )
    trans = jnp.exp(-p)
    e = jnp.exp(-(p + tau))  # = T_{i+1}
    w_ref[:] = trans - e
    e_ref[:] = e


def _bwd_kernel(g_ref, w_ref, e_ref, sl_ref, dtau_ref):
    g = g_ref[:]
    gw = g * w_ref[:]
    # Suffix sum on the MXU: S[r, k] = sum_i gw[r, i] * [i > k].
    suffix = jax.lax.dot_general(
        gw,
        sl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dtau_ref[:] = g * e_ref[:] - suffix


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


@functools.lru_cache(maxsize=8)
def _triangular_np(s_pad: int, strictly_upper: bool):
    i = np.arange(s_pad)
    mask = (i[:, None] < i[None, :]) if strictly_upper else (i[:, None] > i[None, :])
    return np.asarray(mask, np.float32)


def _triangular(s_pad: int, strictly_upper: bool):
    # Convert at the call site: caching a jnp array would capture (and leak)
    # a tracer when first built inside a jit trace.
    return jnp.asarray(_triangular_np(s_pad, strictly_upper))


def _run_fwd(tau, su, interpret):
    # `su` is the [s_pad, s_pad] strictly-upper ones matrix, passed in by the
    # caller: custom_partitioning requires a const-free jaxpr, so the matrix
    # must be an operand rather than a closure constant.
    n_rays, s = tau.shape
    tau_p, pad_s = _pad_to(tau, 1, _LANE)
    tau_p, pad_r = _pad_to(tau_p, 0, _TILE_R)
    s_pad = s + pad_s
    assert su.shape == (s_pad, s_pad)
    grid = (tau_p.shape[0] // _TILE_R,)
    row_spec = pl.BlockSpec(
        (_TILE_R, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (s_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    w, e = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[row_spec, mat_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct(tau_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(tau_p.shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tau_p.shape[0] * s_pad * s_pad,
            bytes_accessed=4 * (3 * tau_p.size + s_pad * s_pad),
            transcendentals=2 * tau_p.size,
        ),
        interpret=interpret,
    )(tau_p, su)
    return w[:n_rays, :s], e[:n_rays, :s]


def _run_bwd(g, w, e, sl, interpret):
    n_rays, s = g.shape
    args = []
    for x in (g, w, e):
        x, pad_s = _pad_to(x, 1, _LANE)
        x, _ = _pad_to(x, 0, _TILE_R)
        args.append(x)
    s_pad = s + pad_s
    assert sl.shape == (s_pad, s_pad)
    grid = (args[0].shape[0] // _TILE_R,)
    row_spec = pl.BlockSpec(
        (_TILE_R, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (s_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    dtau = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, mat_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(args[0].shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * args[0].shape[0] * s_pad * s_pad,
            bytes_accessed=4 * (5 * args[0].size + s_pad * s_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args, sl)
    return dtau[:n_rays, :s]


# --- multi-chip partitioning -------------------------------------------------
#
# pallas_call is opaque to GSPMD: under a multi-chip jit XLA would all-gather
# the operands onto every chip before running the kernel. The op is trivially
# row-parallel (each ray is independent), so declare that with
# custom_partitioning: shard the ray axis, replicate the sample axis, run the
# kernel per-shard with no collectives.


def _row_sharding(mesh, sharding):
    """Keep the caller's ray-axis sharding; force the sample axis replicated."""
    try:
        row = sharding.spec[0] if len(sharding.spec) else None
    except AttributeError:  # non-Named shardings: replicate
        row = None
    return NamedSharding(mesh, PartitionSpec(row, None))


def _def_row_partition(fn, n_rows, n_out):
    """Declare `fn(row_arg_0.., matrix)` row-parallel over the first axis.

    The first `n_rows` args are [R, S] per-ray tensors sharded on R; the last
    arg is the small [S_pad, S_pad] triangular matrix, replicated.
    """
    f = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        row = _row_sharding(mesh, arg_shapes[0].sharding)
        return row if n_out == 1 else (row,) * n_out

    def part(mesh, arg_shapes, result_shape):
        row = _row_sharding(mesh, arg_shapes[0].sharding)
        repl = NamedSharding(mesh, PartitionSpec(None, None))
        outs = row if n_out == 1 else (row,) * n_out
        return mesh, fn, outs, (row,) * n_rows + (repl,)

    rule = (
        ", ".join(["i j"] * n_rows)
        + ", k l -> "
        + ", ".join(["i j"] * n_out)
    )
    f.def_partition(
        infer_sharding_from_operands=infer, partition=part, sharding_rule=rule
    )
    return f


@functools.lru_cache(maxsize=2)
def _sharded_fwd(interpret):
    return _def_row_partition(
        lambda tau, su: _run_fwd(tau, su, interpret), n_rows=1, n_out=2
    )


@functools.lru_cache(maxsize=2)
def _sharded_bwd(interpret):
    return _def_row_partition(
        lambda g, w, e, sl: _run_bwd(g, w, e, sl, interpret), n_rows=3, n_out=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def weights_from_tau(tau, interpret=False):
    """Compositing weights from metric optical depth. [..., S] -> [..., S].

    Differentiable w.r.t. `tau` with a hand-written backward (one Pallas
    kernel each way). Set `interpret=True` to run the kernels in the Pallas
    interpreter (CPU tests).
    """
    w, _ = _weights_fwd_impl(tau, interpret)
    return w


def _weights_fwd_impl(tau, interpret):
    shape = tau.shape
    flat = tau.reshape(-1, shape[-1]).astype(jnp.float32)
    # inf (opaque background) would NaN the dense prefix matmul (inf * 0 in
    # masked-out entries); 1e4 already underflows exp(-tau) to exactly 0.
    flat = jnp.minimum(flat, 1e4)
    s_pad = flat.shape[-1] + (-flat.shape[-1]) % _LANE
    su = _triangular(s_pad, strictly_upper=True)
    w, e = _sharded_fwd(interpret)(flat, su)
    return w.reshape(shape), e


def _weights_fwd(tau, interpret):
    shape = tau.shape
    w, e = _weights_fwd_impl(tau, interpret)
    return w, (w.reshape(-1, shape[-1]), e, shape)


def _weights_bwd(interpret, residuals, g):
    w_flat, e, shape = residuals
    g_flat = g.reshape(-1, shape[-1]).astype(jnp.float32)
    s_pad = shape[-1] + (-shape[-1]) % _LANE
    sl = _triangular(s_pad, strictly_upper=False)
    dtau = _sharded_bwd(interpret)(g_flat, w_flat, e, sl)
    return (dtau.reshape(shape),)


weights_from_tau.defvjp(_weights_fwd, _weights_bwd)

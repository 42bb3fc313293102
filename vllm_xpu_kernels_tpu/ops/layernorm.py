"""RMS norm family: plain, fused-add, and fused norm→quant epilogues.

Reference semantics: csrc/layernorm.cpp (plain + fused add),
csrc/layernorm_quant.cpp (norm fused with dynamic per-token / per-block /
MXFP4 / static-FP8 quant), schemas csrc/torch_bindings.cpp:22-77; golden
numerics per tests/test_fused_norm_quant.py:37-125 and
tests/test_layernorm.py.

Functional mapping of the reference's in-place contracts:

- ``rms_norm(result!, input, weight, eps)``          -> ``y = rms_norm(x, w, eps)``
- ``fused_add_rms_norm(input!, residual!, w, eps)``  -> ``(y, new_residual)``
  where ``new_residual = (x + residual)`` rounded to the input dtype and
  ``y`` is its norm (layernorm.cpp:501+; golden test_fused_norm_quant.py:43-48).
- quant variants return ``(q, scales[, new_residual])``.

TPU-first: one Pallas kernel per variant fuses add + norm + quant epilogue
into a single VMEM pass (one HBM read, one write) — the reference needs the
same fusion to avoid three kernel launches.  Norm math is float32
throughout; ``normed = x * rsqrt(mean(x²)+eps) * w``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import (
    register_op, use_pallas, interpret_mode, mosaic_safe)
from vllm_xpu_kernels_tpu.utils import quant_math as qm


# ---------------------------------------------------------------------------
# shared float32 math
# ---------------------------------------------------------------------------


def _rms_normed_f32(x2, weight, eps):
    xf = x2.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)


def _add_residual(x2, residual2):
    """z = x + residual rounded to the io dtype (the reference stores the
    updated residual in the activation dtype and re-reads it for the norm,
    test_fused_norm_quant.py:45-48)."""
    z = (x2.astype(jnp.float32) + residual2.astype(jnp.float32)).astype(x2.dtype)
    return z


def _per_token_quant_f32(normed, quant_dtype, scale_ub=None):
    absmax = jnp.max(jnp.abs(normed), axis=-1)
    if jnp.dtype(quant_dtype) == jnp.int8:
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(normed / s[:, None]), -128, 127).astype(jnp.int8)
        return q, s
    qmax = qm.fp8_max_value(quant_dtype)
    if scale_ub is not None:
        absmax = jnp.minimum(absmax, scale_ub.astype(jnp.float32).reshape(()))
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    q = jnp.clip(normed / s[:, None], -qmax, qmax).astype(quant_dtype)
    return q, s


def _per_group_quant_f32(normed, group_size, quant_dtype, scale_ue8m0):
    t, n = normed.shape
    g = normed.reshape(t, n // group_size, group_size)
    absmax = jnp.max(jnp.abs(g), axis=-1)
    if jnp.dtype(quant_dtype) == jnp.int8:
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(g / s[..., None]), -128, 127).astype(jnp.int8)
        return q.reshape(t, n), s
    qmax = qm.fp8_max_value(quant_dtype)
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    if scale_ue8m0:
        s = qm.ue8m0_round(s)
    q = jnp.clip(g / s[..., None], -qmax, qmax).astype(quant_dtype)
    return q.reshape(t, n), s


def _flatten(x):
    return x.reshape(-1, x.shape[-1]), x.shape


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------


@register_op("rms_norm", "layernorm")
def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Row-wise RMS norm on the last dim; supports 2D/3D/4D inputs
    (csrc/layernorm.cpp:11-130, schema csrc/torch_bindings.cpp:26-30)."""
    x2, shape = _flatten(x)
    if use_pallas():
        y = _pallas_rms_norm(mosaic_safe(x2), mosaic_safe(weight), eps
                             ).astype(x.dtype)
    else:
        y = _rms_normed_f32(x2, weight, eps).astype(x.dtype)
    return y.reshape(shape)


@register_op("fused_add_rms_norm", "layernorm")
def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
):
    """In-place fused add + RMS norm -> (normed, new_residual)
    (csrc/layernorm.cpp:501+, schema csrc/torch_bindings.cpp:33-36)."""
    x2, shape = _flatten(x)
    r2, _ = _flatten(residual)
    if use_pallas():
        if x.dtype == jnp.float16:
            # Mosaic has no f16; keep the residual sum exact in f16 via
            # XLA and run only the norm in the (bf16) kernel.
            z = _add_residual(x2, r2)
            y = _pallas_rms_norm(mosaic_safe(z), mosaic_safe(weight), eps
                                 ).astype(x.dtype)
        else:
            y, z = _pallas_fused_add_rms_norm(
                mosaic_safe(x2), mosaic_safe(r2), mosaic_safe(weight), eps)
            y, z = y.astype(x.dtype), z.astype(x.dtype)
    else:
        z = _add_residual(x2, r2)
        y = _rms_normed_f32(z, weight, eps).astype(x.dtype)
    return y.reshape(shape), z.reshape(shape)


@register_op("rms_norm_static_fp8_quant", "layernorm")
def rms_norm_static_fp8_quant(
    x: jax.Array,
    weight: jax.Array,
    scale: jax.Array,
    eps: float = 1e-6,
    quant_dtype=jnp.float8_e4m3fn,
) -> jax.Array:
    """RMS norm fused with static FP8 quant (csrc/torch_bindings.cpp:63-67)."""
    x2, shape = _flatten(x)
    normed = _rms_normed_f32(x2, weight, eps)
    inv = 1.0 / scale.astype(jnp.float32).reshape(())
    return qm.quant_fp8(normed, inv, quant_dtype).reshape(shape)


@register_op("fused_add_rms_norm_static_fp8_quant", "layernorm")
def fused_add_rms_norm_static_fp8_quant(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    scale: jax.Array,
    eps: float = 1e-6,
    quant_dtype=jnp.float8_e4m3fn,
):
    """Add + RMS norm + static FP8 quant -> (q, new_residual)
    (csrc/torch_bindings.cpp:70-77)."""
    x2, shape = _flatten(x)
    r2, _ = _flatten(residual)
    z = _add_residual(x2, r2)
    normed = _rms_normed_f32(z, weight, eps)
    inv = 1.0 / scale.astype(jnp.float32).reshape(())
    return qm.quant_fp8(normed, inv, quant_dtype).reshape(shape), z.reshape(shape)


@register_op("rms_norm_dynamic_per_token_quant", "layernorm")
def rms_norm_dynamic_per_token_quant(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    quant_dtype=jnp.float8_e4m3fn,
    scale_ub: jax.Array | None = None,
    residual: jax.Array | None = None,
):
    """RMS norm fused with dynamic per-token FP8/INT8 quant
    (csrc/torch_bindings.cpp:38-46, impl csrc/layernorm_quant.cpp).

    Returns (q, scales) or (q, scales, new_residual) when residual given.
    """
    x2, shape = _flatten(x)
    int8_pallas = (jnp.dtype(quant_dtype) == jnp.int8 and scale_ub is None
                   and use_pallas())
    if residual is not None:
        r2, _ = _flatten(residual)
        if int8_pallas:
            q, s, z = _pallas_fused_add_rms_norm_int8(
                mosaic_safe(x2), mosaic_safe(r2), mosaic_safe(weight), eps)
            return q.reshape(shape), s.reshape(-1), z.reshape(shape)
        z = _add_residual(x2, r2)
        normed = _rms_normed_f32(z, weight, eps)
        q, s = _per_token_quant_f32(normed, quant_dtype, scale_ub)
        return q.reshape(shape), s, z.reshape(shape)
    if int8_pallas:
        q, s = _pallas_fused_add_rms_norm_int8(
            mosaic_safe(x2), None, mosaic_safe(weight), eps)
        return q.reshape(shape), s.reshape(-1)
    normed = _rms_normed_f32(x2, weight, eps)
    q, s = _per_token_quant_f32(normed, quant_dtype, scale_ub)
    return q.reshape(shape), s


@register_op("rms_norm_per_block_quant", "layernorm")
def rms_norm_per_block_quant(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    group_size: int = 128,
    quant_dtype=jnp.float8_e4m3fn,
    scale_ub: jax.Array | None = None,
    residual: jax.Array | None = None,
    is_scale_transposed: bool = False,
    scale_ue8m0: bool = False,
):
    """RMS norm fused with per-(token, column-group) quant
    (csrc/torch_bindings.cpp:49-54).  Returns (q, scales[, new_residual])."""
    x2, shape = _flatten(x)
    new_res = None
    if residual is not None:
        r2, _ = _flatten(residual)
        z = _add_residual(x2, r2)
        normed = _rms_normed_f32(z, weight, eps)
        new_res = z.reshape(shape)
    else:
        normed = _rms_normed_f32(x2, weight, eps)
    q, s = _per_group_quant_f32(normed, group_size, quant_dtype, scale_ue8m0)
    if scale_ub is not None:
        s = jnp.minimum(s, scale_ub.astype(jnp.float32).reshape(()))
    if is_scale_transposed:
        s = s.T
    if new_res is not None:
        return q.reshape(shape), s, new_res
    return q.reshape(shape), s


@register_op("rms_norm_mxfp4_quant", "layernorm")
def rms_norm_mxfp4_quant(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    group_size: int = 32,
    residual: jax.Array | None = None,
):
    """RMS norm fused with MXFP4 quant (csrc/torch_bindings.cpp:56-60).
    Returns (packed_q [T, N/2], scales [T, N/32][, new_residual])."""
    from vllm_xpu_kernels_tpu.ops.quant import _mxfp4_quant_groups

    x2, shape = _flatten(x)
    new_res = None
    if residual is not None:
        r2, _ = _flatten(residual)
        z = _add_residual(x2, r2)
        normed = _rms_normed_f32(z, weight, eps)
        new_res = z.reshape(shape)
    else:
        normed = _rms_normed_f32(x2, weight, eps)
    q, s = _mxfp4_quant_groups(normed, group_size, 1e-10)
    if new_res is not None:
        return q, s, new_res
    return q, s


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _norm_block_t(t, n):
    """Token-block size bounded by VMEM: ~16 bytes/elem live across the
    in/out tiles and f32 intermediates; stay under ~4 MB per buffer set."""
    cap = max(8, (4 * 1024 * 1024) // (16 * max(n, 1)) // 8 * 8)
    return min(512, cap, max(8, t))


def _rms_norm_kernel(eps, x_ref, w_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    o_ref[:] = normed.astype(o_ref.dtype)


def _pallas_rms_norm(x2, weight, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, n = x2.shape
    block_t = _norm_block_t(t, n)
    return pl.pallas_call(
        functools.partial(_rms_norm_kernel, eps),
        grid=(pl.cdiv(t, block_t),),
        in_specs=[
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, n), x2.dtype),
        interpret=interpret_mode(),
    )(x2, weight)


def _fused_add_rms_norm_int8_kernel(eps, has_res, x_ref, r_ref, w_ref,
                                    q_ref, s_ref, z_ref):
    """(add+)norm + dynamic per-token int8 quant in one VMEM pass: the
    standalone XLA quant reads the normed activation twice (absmax pass
    + quant pass) and costs ~26 ms/step at Llama-3-8B prefill; fusing
    writes only the int8 codes + scales (+ residual)."""
    if has_res:
        zf = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
        z = zf.astype(z_ref.dtype)
        z_ref[:] = z
        zf = z.astype(jnp.float32)
    else:
        zf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(zf * zf, axis=-1, keepdims=True)
    normed = zf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(normed), axis=-1, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q_ref[:] = jnp.clip(jnp.round(normed * (1.0 / s)), -128, 127
                        ).astype(jnp.int8)
    s_ref[:] = s


def _pallas_fused_add_rms_norm_int8(x2, r2, weight, eps):
    """-> (q int8 [t,n], scales f32 [t,1][, new residual]) ; r2=None for
    the residual-free variant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, n = x2.shape
    block_t = _norm_block_t(t, n)
    has_res = r2 is not None
    in_specs = [pl.BlockSpec((block_t, n), lambda i: (i, 0))]
    operands = [x2]
    if has_res:
        in_specs.append(pl.BlockSpec((block_t, n), lambda i: (i, 0)))
        operands.append(r2)
    else:
        in_specs.append(pl.BlockSpec((block_t, n), lambda i: (i, 0)))
        operands.append(x2)          # dummy, unread
    in_specs.append(pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM))
    operands.append(weight)
    out = pl.pallas_call(
        functools.partial(_fused_add_rms_norm_int8_kernel, eps, has_res),
        grid=(pl.cdiv(t, block_t),),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, n), x2.dtype),
        ],
        interpret=interpret_mode(),
    )(*operands)
    q, s, z = out
    return (q, s, z) if has_res else (q, s)


def _fused_add_rms_norm_kernel(eps, x_ref, r_ref, w_ref, o_ref, z_ref):
    z = (x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)).astype(
        x_ref.dtype
    )
    z_ref[:] = z
    zf = z.astype(jnp.float32)
    var = jnp.mean(zf * zf, axis=-1, keepdims=True)
    normed = zf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    o_ref[:] = normed.astype(o_ref.dtype)


def _pallas_fused_add_rms_norm(x2, r2, weight, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, n = x2.shape
    block_t = _norm_block_t(t, n)
    return pl.pallas_call(
        functools.partial(_fused_add_rms_norm_kernel, eps),
        grid=(pl.cdiv(t, block_t),),
        in_specs=[
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
            pl.BlockSpec((block_t, n), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n), x2.dtype),
            jax.ShapeDtypeStruct((t, n), x2.dtype),
        ],
        interpret=interpret_mode(),
    )(x2, r2, weight)

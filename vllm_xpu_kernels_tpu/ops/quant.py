"""Quantization ops: FP8 static/dynamic/per-token/per-token-group, MXFP4,
and convert_fp8.

Reference semantics: csrc/quantization/fp8/fp8_quant.cpp (schemas
csrc/torch_bindings.cpp:146-184), csrc/quantization/fp4/mxfp4_quant.{h,cpp},
convert_fp8 csrc/cache.cpp:1396-1460.

Functional mapping: the reference writes into pre-allocated ``Tensor!``
outputs; here each op returns its outputs.  Scale formulas (exact):

- dynamic per-tensor / per-token: ``s = max(absmax/qmax, 1/(qmax*512))``
  with optional ``scale_ub`` clamping absmax first
  (fp8_quant.cpp:444-454, 357).
- per-token-group: absmax seeded with ``eps``; optional UE8M0 rounding
  ``exp2(ceil(log2(max(|s|,1e-10))))`` (fp8_quant.cpp:212-246).
- MXFP4: per-32-group ``s = exp2(ceil(log2(max(absmax/6, eps))))``, values
  clamped to ±6, RNE-style e2m1 encode, nibble-packed
  (mxfp4_quant.h:99-123).

TPU-first design: these are VPU-bound single-pass ops; the jnp expressions
here compile to fully fused XLA loops (one HBM read + one write), which is
already the roofline for a standalone quant op.  The wins from hand-written
Pallas come from *fusing* quant into producers (see ops/layernorm.py and
ops/activation.py epilogues) and consumers (kernels/gemm.py dequant-matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op
from vllm_xpu_kernels_tpu.utils import quant_math as qm


@register_op("static_scaled_fp8_quant", "quant")
def static_scaled_fp8_quant(
    x: jax.Array,
    scale: jax.Array,
    group_shape: tuple[int, int] | None = None,
    quant_dtype=jnp.float8_e4m3fn,
) -> jax.Array:
    """FP8 quant with a given scale (csrc/torch_bindings.cpp:147-150).

    ``scale`` may be scalar (per-tensor), per-token ``[M]`` / ``[M,1]``,
    per-channel ``[N]`` with group_shape=(-1,1), or 2-D blocked
    ``[M/gm, N/gn]`` (fp8_quant.cpp:481-660).
    """
    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    m = x2.shape[0]

    s = scale.astype(jnp.float32)
    if s.ndim == 0 or s.size == 1:
        full = jnp.broadcast_to(s.reshape(()), (m, n))
    elif s.ndim == 1:
        if group_shape is None:
            raise ValueError(
                "1D scale requires explicit group_shape to disambiguate "
                "per-channel vs per-token quantization"
            )
        gm, gn = group_shape
        gm = m if gm == -1 else gm
        gn = n if gn == -1 else gn
        full = jnp.repeat(
            jnp.repeat(s.reshape(m // gm, n // gn), gm, 0), gn, 1
        )
    else:
        gm, gn = m // s.shape[0], n // s.shape[1]
        full = jnp.repeat(jnp.repeat(s, gm, 0), gn, 1)

    q = qm.quant_fp8(x2, 1.0 / full, quant_dtype)
    return q.reshape(orig_shape)


@register_op("dynamic_scaled_fp8_quant", "quant")
def dynamic_scaled_fp8_quant(x: jax.Array, quant_dtype=jnp.float8_e4m3fn):
    """Per-tensor dynamic FP8 quant -> (q, scale[1])
    (csrc/torch_bindings.cpp:153-157, fp8_quant.cpp:336-390,667-723)."""
    qmax = qm.fp8_max_value(quant_dtype)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    q = qm.quant_fp8(x, 1.0 / s, quant_dtype)
    return q, s.reshape(1)


@register_op("dynamic_per_token_scaled_fp8_quant", "quant")
def dynamic_per_token_scaled_fp8_quant(
    x: jax.Array,
    scale_ub: jax.Array | None = None,
    quant_dtype=jnp.float8_e4m3fn,
):
    """Per-token dynamic FP8 quant -> (q, scales [num_tokens])
    (csrc/torch_bindings.cpp:160-167, fp8_quant.cpp:392-480)."""
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    qmax = qm.fp8_max_value(quant_dtype)
    absmax = jnp.max(jnp.abs(x2), axis=-1)
    if scale_ub is not None:
        absmax = jnp.minimum(absmax, scale_ub.astype(jnp.float32).reshape(()))
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    q = qm.quant_fp8(x2, (1.0 / s)[:, None], quant_dtype)
    return q.reshape(orig_shape), s


def _per_token_int8_kernel(x_ref, q_ref, s_ref):
    y = x_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1e-10)
    q_ref[:] = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127
                        ).astype(jnp.int8)
    s_ref[:] = s


@register_op("dynamic_per_token_scaled_int8_quant", "quant")
def dynamic_per_token_scaled_int8_quant(x: jax.Array):
    """Per-token dynamic symmetric int8 quant -> (q int8, scales
    [num_tokens]).  Activation-side half of the W8A8 int8 recipe
    (ops.gemm.int8_gemm_w8a8); the reference fuses int8 per-token quant
    into its norm kernels (csrc/layernorm_quant.cpp INT8 cases).

    Kernel tier: ONE Pallas pass (amax + quantize over whole rows) —
    XLA's standalone lowering is an amax-reduce kernel plus a quantize
    kernel, and the decode step is core-time bound (one kernel at a
    time), so the extra launch is pure serialized loss (round-5 trace:
    the un-fused act quant appeared as 2 kernels/layer)."""
    from vllm_xpu_kernels_tpu.registry import use_pallas

    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n)
    t = x2.shape[0]
    if (use_pallas() and n % 128 == 0 and t > 0
            and x2.dtype in (jnp.bfloat16, jnp.float32, jnp.float16)):
        from jax.experimental import pallas as pl
        from vllm_xpu_kernels_tpu.registry import interpret_mode

        bt = min(max(8, -(-t // 8) * 8),
                 max(8, (4 * 1024 * 1024) // (8 * n) // 8 * 8))
        q, s = pl.pallas_call(
            _per_token_int8_kernel,
            grid=(-(-t // bt),),
            in_specs=[pl.BlockSpec((bt, n), lambda i: (i, 0))],
            out_specs=[pl.BlockSpec((bt, n), lambda i: (i, 0)),
                       pl.BlockSpec((bt, 1), lambda i: (i, 0))],
            out_shape=[jax.ShapeDtypeStruct((t, n), jnp.int8),
                       jax.ShapeDtypeStruct((t, 1), jnp.float32)],
            interpret=interpret_mode(),
        )(x2)
        return q.reshape(orig_shape), s[:, 0]
    x2 = x2.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x2), axis=-1)
    s = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(x2 * (1.0 / s)[:, None]), -127, 127
                 ).astype(jnp.int8)
    return q.reshape(orig_shape), s


@register_op("per_token_group_fp8_quant", "quant")
def per_token_group_fp8_quant(
    x: jax.Array,
    group_size: int,
    eps: float = 1e-10,
    fp8_min: float | None = None,
    fp8_max: float | None = None,
    scale_ue8m0: bool = False,
    column_major_scales: bool = False,
    quant_dtype=jnp.float8_e4m3fn,
):
    """Per-(token, column-group) FP8 quant -> (q [M,N], scales)
    (csrc/torch_bindings.cpp:170-177, fp8_quant.cpp:157-271).

    scales is [M, N/group_size] (or its transpose when
    ``column_major_scales``, matching the reference's column-major scale
    output used for TMA-aligned GEMM consumers).
    """
    qmax = qm.fp8_max_value(quant_dtype) if fp8_max is None else fp8_max
    qmin = -qmax if fp8_min is None else fp8_min
    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    m = x2.shape[0]
    g = x2.reshape(m, n // group_size, group_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1), eps)
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    if scale_ue8m0:
        s = qm.ue8m0_round(s)
    q = qm.quant_fp8(g, (1.0 / s)[..., None], quant_dtype, qmin=qmin, qmax=qmax)
    q = q.reshape(orig_shape)
    scales = s.T if column_major_scales else s
    return q, scales


def _mxfp4_quant_groups(x2: jax.Array, group_size: int, eps: float):
    """Core MXFP4 group quant on a 2-D float array [M, N].

    Returns (packed [M, N/2] uint8, scales [M, N/group_size] float32).
    Numerics: mxfp4_quant.h:99-123.
    """
    if group_size != 32:
        raise ValueError(f"MXFP4 requires group_size == 32, got {group_size}")
    m, n = x2.shape
    g = x2.astype(jnp.float32).reshape(m, n // group_size, group_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1), eps)
    s = qm.ue8m0_round(absmax / qm.FP4_E2M1_MAX, eps)
    scaled = jnp.clip(g / s[..., None], -qm.FP4_E2M1_MAX, qm.FP4_E2M1_MAX)
    codes = qm.fp4_e2m1_encode(scaled).reshape(m, n)
    return qm.fp4_pack2(codes), s.reshape(m, n // group_size)


@register_op("per_token_group_quant_mxfp4", "quant")
def per_token_group_quant_mxfp4(
    x: jax.Array, group_size: int = 32, eps: float = 1e-10
):
    """MXFP4 (e2m1×2 packed + power-of-two scale per 32-group) quant
    (csrc/torch_bindings.cpp:180-184, mxfp4_quant.cpp:24-126).

    Returns (packed_q [..., N/2] uint8, scales [..., N/32] float32).
    """
    orig_shape = x.shape
    n = orig_shape[-1]
    q, s = _mxfp4_quant_groups(x.reshape(-1, n), group_size, eps)
    return (
        q.reshape(*orig_shape[:-1], n // 2),
        s.reshape(*orig_shape[:-1], n // group_size),
    )


def mxfp4_dequant(packed: jax.Array, scales: jax.Array, group_size: int = 32):
    """Inverse of per_token_group_quant_mxfp4 (test/reference helper, the
    analogue of the reference's MX dequant LUT, ref_moe_utils.py:23-124)."""
    codes = qm.fp4_unpack2(packed)
    vals = qm.fp4_e2m1_decode(codes)
    m = vals.shape[:-1]
    n = vals.shape[-1]
    g = vals.reshape(*m, n // group_size, group_size)
    return (g * scales[..., None]).reshape(*m, n)


@register_op("convert_fp8", "quant")
def convert_fp8(
    src: jax.Array, scale: float = 1.0, kv_dtype: str = "fp8", dst_dtype=None
):
    """FP8 <-> FP16/BF16/FP32 conversion with scale (test helper;
    csrc/torch_bindings.cpp:281-284, cache.cpp:1396-1460).

    fp8 -> float: ``dst = fp8_to_float(src) * scale``
    float -> fp8: ``dst = float_to_fp8(src / scale)``
    """
    fp8_t = jnp.float8_e5m2 if kv_dtype == "fp8_e5m2" else jnp.float8_e4m3fn
    if src.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        out_dtype = dst_dtype or jnp.float32
        return (src.astype(jnp.float32) * scale).astype(out_dtype)
    y = src.astype(jnp.float32) / scale
    y = jnp.clip(y, -qm.fp8_max_value(fp8_t), qm.fp8_max_value(fp8_t))
    return y.astype(fp8_t)

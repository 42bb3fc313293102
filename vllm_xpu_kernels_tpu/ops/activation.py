"""Activation ops + fused activation→quant epilogues.

Reference semantics: csrc/activation.cpp (gated activations on
``[num_tokens, 2*d] -> [num_tokens, d]``; gate = first half, up = second
half, except swigluoai which is interleaved gate=x[..., ::2], up=x[..., 1::2],
csrc/activation.cpp:313-346), fused quant epilogues
csrc/quantization/fused_kernels/fused_silu_mul_block_quant.cpp and
fused_silu_mul_mxfp4_quant.cpp, schemas csrc/torch_bindings.cpp:79-201.

TPU-first design note: plain elementwise activations are expressed directly
in jnp — on TPU, XLA fuses them into the producing matmul, which beats any
hand-written standalone kernel (a separate kernel would force an extra HBM
round-trip).  The fused act→quant epilogues DO get Pallas kernels: their
group-wise reductions + sub-byte packing are outside XLA's fusion
vocabulary, and fusing act+absmax+quant into one VMEM pass halves HBM
traffic on the MoE/MLP path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op, use_pallas, interpret_mode
from vllm_xpu_kernels_tpu.utils import quant_math as qm

# ---------------------------------------------------------------------------
# scalar activation math (float32 internal, matching the reference kernels)
# ---------------------------------------------------------------------------


def _silu(x):
    xf = x.astype(jnp.float32)
    return xf * jax.nn.sigmoid(xf)


def _gelu_erf(x):
    # csrc/activation.cpp:52-60 — exact GELU via erf
    xf = x.astype(jnp.float32)
    return xf * 0.5 * (1.0 + jax.lax.erf(xf * 0.7071067811865475))


def _gelu_tanh(x):
    # csrc/activation.cpp:62-73 — torch 'tanh' approximation
    xf = x.astype(jnp.float32)
    inner = 0.7978845608028654 * xf * (1.0 + 0.044715 * xf * xf)
    return 0.5 * xf * (1.0 + jnp.tanh(inner))


def _gelu_fast(x):
    # csrc/activation.cpp:22-28 (tanh arg: 0.79788456*x * (1 + 0.044715*x*x))
    xf = x.astype(jnp.float32)
    t = jnp.tanh(xf * 0.79788456 * (1.0 + 0.044715 * xf * xf))
    return 0.5 * xf * (1.0 + t)


def _gelu_new(x):
    # csrc/activation.cpp:30-36
    xf = x.astype(jnp.float32)
    t = jnp.tanh(0.79788456 * (xf + 0.044715 * xf * xf * xf))
    return 0.5 * xf * (1.0 + t)


def _gelu_quick(x):
    # csrc/activation.cpp:38-42 — x * sigmoid(1.702 x)
    xf = x.astype(jnp.float32)
    return xf * jax.nn.sigmoid(1.702 * xf)


def _fatrelu(x, threshold):
    xf = x.astype(jnp.float32)
    return jnp.where(xf > threshold, xf, 0.0)


def _split_gate_up(x):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


def _gated(x, act, act_first=True):
    gate, up = _split_gate_up(x)
    if act_first:
        y = act(gate) * up.astype(jnp.float32)
    else:
        y = gate.astype(jnp.float32) * act(up)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# public gated / unary activations
# ---------------------------------------------------------------------------


@register_op("silu_and_mul", "activation")
def silu_and_mul(x: jax.Array) -> jax.Array:
    """silu(x[..., :d]) * x[..., d:]  (csrc/torch_bindings.cpp:80)."""
    return _gated(x, _silu, act_first=True)


@register_op("mul_and_silu", "activation")
def mul_and_silu(x: jax.Array) -> jax.Array:
    """x[..., :d] * silu(x[..., d:])  (csrc/torch_bindings.cpp:109)."""
    return _gated(x, _silu, act_first=False)


@register_op("gelu_and_mul", "activation")
def gelu_and_mul(x: jax.Array) -> jax.Array:
    """gelu_erf(x[..., :d]) * x[..., d:]  (csrc/torch_bindings.cpp:112)."""
    return _gated(x, _gelu_erf, act_first=True)


@register_op("gelu_tanh_and_mul", "activation")
def gelu_tanh_and_mul(x: jax.Array) -> jax.Array:
    """gelu_tanh(x[..., :d]) * x[..., d:]  (csrc/torch_bindings.cpp:115)."""
    return _gated(x, _gelu_tanh, act_first=True)


@register_op("fatrelu_and_mul", "activation")
def fatrelu_and_mul(x: jax.Array, threshold: float = 0.0) -> jax.Array:
    """fatrelu(x[..., :d], t) * x[..., d:]  (csrc/torch_bindings.cpp:118)."""
    return _gated(x, functools.partial(_fatrelu, threshold=threshold))


@register_op("swigluoai_and_mul", "activation")
def swigluoai_and_mul(
    x: jax.Array, alpha: float = 1.702, limit: float = 7.0
) -> jax.Array:
    """GPT-OSS SwiGLU: interleaved gate/up with clamping
    (csrc/activation.cpp:277-294, 313-346).

    gate = x[..., ::2] clamped to (-inf, limit]; up = x[..., 1::2] clamped
    to [-limit, limit]; out = (up + 1) * gate * sigmoid(gate * alpha).
    """
    gate = x[..., 0::2].astype(jnp.float32)
    up = x[..., 1::2].astype(jnp.float32)
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return ((up + 1.0) * glu).astype(x.dtype)


@register_op("swiglustep_and_mul", "activation")
def swiglustep_and_mul(x: jax.Array, limit: float = 7.0) -> jax.Array:
    """silu(gate).clamp(max=limit) * up.clamp(±limit), split halves
    (csrc/activation.cpp:297-311, 348-376)."""
    gate, up = _split_gate_up(x)
    g = jnp.minimum(_silu(gate), limit)
    u = jnp.clip(up.astype(jnp.float32), -limit, limit)
    return (g * u).astype(x.dtype)


@register_op("relu2_no_mul", "activation")
def relu2_no_mul(x: jax.Array) -> jax.Array:
    """relu(x)^2, no gating (csrc/activation.cpp:44-50)."""
    xf = jnp.maximum(x.astype(jnp.float32), 0.0)
    return (xf * xf).astype(x.dtype)


@register_op("gelu_fast", "activation")
def gelu_fast(x: jax.Array) -> jax.Array:
    """Fast tanh GELU (csrc/activation.cpp:22-28)."""
    return _gelu_fast(x).astype(x.dtype)


@register_op("gelu_new", "activation")
def gelu_new(x: jax.Array) -> jax.Array:
    """'new' tanh GELU (csrc/activation.cpp:30-36)."""
    return _gelu_new(x).astype(x.dtype)


@register_op("gelu_quick", "activation")
def gelu_quick(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (csrc/activation.cpp:38-42)."""
    return _gelu_quick(x).astype(x.dtype)


# ---------------------------------------------------------------------------
# fused act -> quant epilogues
# ---------------------------------------------------------------------------


def _silu_mul_f32(x):
    gate, up = _split_gate_up(x)
    return _silu(gate) * up.astype(jnp.float32)


def _ref_silu_and_mul_quant(x, scale, quant_dtype):
    y = _silu_mul_f32(x)
    inv = 1.0 / scale.astype(jnp.float32).reshape(())
    return qm.quant_fp8(y, inv, quant_dtype)


def _ref_silu_and_mul_per_block_quant(
    x, group_size, quant_dtype, scale_ub, is_scale_transposed, scale_ue8m0
):
    y = _silu_mul_f32(x)  # [T, d]
    t, d = y.shape
    g = y.reshape(t, d // group_size, group_size)
    qmax = qm.fp8_max_value(quant_dtype)
    absmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1), 1e-10)
    s = jnp.maximum(absmax / qmax, qm.min_scaling_factor(quant_dtype))
    if scale_ue8m0:
        s = qm.ue8m0_round(s)
    if scale_ub is not None:
        s = jnp.minimum(s, scale_ub.astype(jnp.float32).reshape(()))
    q = qm.quant_fp8(g, (1.0 / s)[..., None], quant_dtype).reshape(t, d)
    scales = s.T if is_scale_transposed else s
    return q, scales


def _ref_silu_and_mul_mxfp4_quant(x, group_size, eps):
    from vllm_xpu_kernels_tpu.ops.quant import _mxfp4_quant_groups

    y = _silu_mul_f32(x)
    return _mxfp4_quant_groups(y, group_size, eps)


@register_op("silu_and_mul_quant", "activation")
def silu_and_mul_quant(
    x: jax.Array, scale: jax.Array, quant_dtype=jnp.float8_e4m3fn
) -> jax.Array:
    """Fused SiLU·mul + static FP8 quant (csrc/torch_bindings.cpp:84-86)."""
    if use_pallas():
        return _pallas_silu_mul_static_quant(x, scale, quant_dtype)
    return _ref_silu_and_mul_quant(x, scale, quant_dtype)


@register_op("silu_and_mul_per_block_quant", "activation")
def silu_and_mul_per_block_quant(
    x: jax.Array,
    group_size: int,
    quant_dtype=jnp.float8_e4m3fn,
    scale_ub: jax.Array | None = None,
    is_scale_transposed: bool = False,
    scale_ue8m0: bool = False,
):
    """Fused SiLU·mul + per-(token,group) dynamic FP8/INT8 quant
    (csrc/torch_bindings.cpp:89-101).  Returns (q [T,d], scales)."""
    return _ref_silu_and_mul_per_block_quant(
        x, group_size, quant_dtype, scale_ub, is_scale_transposed, scale_ue8m0
    )


@register_op("silu_and_mul_per_token_quant", "activation")
def silu_and_mul_per_token_quant(x: jax.Array, quant_dtype=jnp.int8):
    """Fused SiLU·mul + dynamic per-token int8 quant -> (q [T,d],
    scales [T] f32).  TPU-native extension: the activation-side half of
    the W8A8 recipe fused into the gated activation (the reference fuses
    quant into silu for its fp8 recipes, fused_silu_mul_block_quant.cpp;
    the int8 per-token case is what the MXU-native path wants)."""
    assert jnp.dtype(quant_dtype) == jnp.int8
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    if use_pallas():
        from vllm_xpu_kernels_tpu.registry import mosaic_safe

        q, s = _pallas_silu_mul_per_token_int8(mosaic_safe(x2))
        return (q.reshape(*orig_shape[:-1], q.shape[-1]), s.reshape(-1))
    y = _silu_mul_f32(x2)
    absmax = jnp.max(jnp.abs(y), axis=-1)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(y / s[:, None]), -128, 127).astype(jnp.int8)
    return q.reshape(*orig_shape[:-1], q.shape[-1]), s


@register_op("silu_and_mul_mxfp4_quant", "activation")
def silu_and_mul_mxfp4_quant(
    x: jax.Array, group_size: int = 32, eps: float = 1e-10
):
    """Fused SiLU·mul + MXFP4 quant (csrc/torch_bindings.cpp:103-107).
    Returns (packed_q [T, d/2] uint8, scales [T, d/group] float32)."""
    return _ref_silu_and_mul_mxfp4_quant(x, group_size, eps)


# ---------------------------------------------------------------------------
# Pallas kernel: fused silu_mul + static fp8 quant (single VMEM pass)
# ---------------------------------------------------------------------------


def _silu_mul_per_token_int8_kernel(x_ref, q_ref, s_ref):
    d = q_ref.shape[1]
    gate = x_ref[:, :d].astype(jnp.float32)
    up = x_ref[:, d:].astype(jnp.float32)
    y = gate * jax.nn.sigmoid(gate) * up
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q_ref[:] = jnp.clip(jnp.round(y * (1.0 / s)), -128, 127
                        ).astype(jnp.int8)
    s_ref[:] = s


def _pallas_silu_mul_per_token_int8(x2):
    from jax.experimental import pallas as pl

    t, d2 = x2.shape
    d = d2 // 2
    # VMEM: in tile (block_t, 2d) + f32 work; cap ~4 MB
    block_t = min(256, max(8, (4 * 1024 * 1024) // (12 * d2) // 8 * 8),
                  max(8, t))
    return pl.pallas_call(
        _silu_mul_per_token_int8_kernel,
        grid=(pl.cdiv(t, block_t),),
        in_specs=[pl.BlockSpec((block_t, d2), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, d), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(x2)


def _silu_mul_static_quant_kernel(qmax, scale_ref, x_ref, o_ref):
    gate = x_ref[:, : o_ref.shape[1]].astype(jnp.float32)
    up = x_ref[:, o_ref.shape[1] :].astype(jnp.float32)
    y = gate * jax.nn.sigmoid(gate) * up
    inv = 1.0 / scale_ref[0]
    o_ref[:] = jnp.clip(y * inv, -qmax, qmax).astype(o_ref.dtype)


def _pallas_silu_mul_static_quant(x, scale, quant_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vllm_xpu_kernels_tpu.registry import mosaic_safe

    orig_shape = x.shape
    # Mosaic has no f16 type at all — run f16 inputs in bf16 (the fp8
    # quant output dominates the precision budget)
    x2 = mosaic_safe(x).reshape(-1, orig_shape[-1])
    t, d2 = x2.shape
    d = d2 // 2
    qmax = qm.fp8_max_value(quant_dtype)
    block_t = min(256, max(8, t))
    grid = (pl.cdiv(t, block_t),)
    out = pl.pallas_call(
        functools.partial(_silu_mul_static_quant_kernel, qmax),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_t, d2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, d), quant_dtype),
        interpret=interpret_mode(),
    )(scale.reshape(1).astype(jnp.float32), x2)
    return out.reshape(*orig_shape[:-1], d)

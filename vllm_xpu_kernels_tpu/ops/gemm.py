"""Dense quantized GEMM family — TPU-native replacement of the reference's
oneDNN matmul layer (reference ops: csrc/xpu/torch_bindings.cpp:14-38, impls
csrc/xpu/onednn/onednn_matmul.cpp + fp8_gemm_w8a8.h / fp8_gemm_w8a16.h /
fp4_gemm_w4a4.h / int4_gemm_w4a16.h / int4_gemm_w4a8.h; golden numerics per
tests/test_fp8_gemm_onednn.py, test_int4_gemm_onednn.py,
test_fp4_gemm_onednn.py).

Routing (TPU-first):

- per-tensor / per-token / per-channel scales: scales factor out of the
  contraction, so we run a plain XLA matmul (fp8/int8 upcast to bf16 — exact)
  and apply scales as an XLA-fused epilogue.  This is the idiomatic TPU
  formulation; a hand-written kernel cannot beat XLA's matmul here.
- K-grouped / 2-D block scales and int4/fp4 sub-byte weights: fused
  dequant-matmul Pallas kernel (kernels/quant_matmul.py) — the dequant must
  live inside the K loop.

Weight layout conventions (ours, TPU-native — see quantization/repack.py for
converters from GPTQ/AWQ/MX checkpoint formats):

- fp8 weights: plain ``[K, N]``.
- int4 / fp4 weights: split-K packed int8 ``[K/2, N]``.
- act-order (GPTQ ``g_idx``): a K-permutation applied to activations
  (``gptq_repack_for_tpu`` returns it), not a kernel argument.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import (
    register_op, use_pallas, mosaic_safe, mosaic_safe_dtype)
from vllm_xpu_kernels_tpu.kernels import quant_matmul as qmm
from vllm_xpu_kernels_tpu.utils import quant_math as qm


def _flatten_batch(a):
    if a.ndim == 2:
        return a, None
    lead = a.shape[:-1]
    return a.reshape(-1, a.shape[-1]), lead


def _unflatten(out, lead):
    if lead is None:
        return out
    return out.reshape(*lead, out.shape[-1])


def _classify_a_scale(s, M, K):
    """-> (row [M,1]|None, group [M, K/g]|None, g)."""
    if s is None:
        return None, None, 0
    s = jnp.asarray(s, jnp.float32)
    if s.ndim == 0 or s.size == 1:
        return s.reshape(1, 1), None, 0
    if s.ndim == 1 and s.shape[0] == M:
        return s.reshape(M, 1), None, 0
    if s.ndim == 2 and s.shape == (M, 1):
        return s, None, 0
    if s.ndim == 2 and s.shape[0] == M and K % s.shape[1] == 0:
        return None, s, K // s.shape[1]
    raise ValueError(f"bad A scale shape {s.shape} for M={M}, K={K}")


def _classify_b_scale(s, K, N):
    """-> (col [1,N]|None, group [K/g, N]|None, g)."""
    if s is None:
        return None, None, 0
    s = jnp.asarray(s, jnp.float32)
    if s.ndim == 0 or s.size == 1:
        return s.reshape(1, 1), None, 0
    if s.ndim == 1 and s.shape[0] == N:
        return s.reshape(1, N), None, 0
    if s.ndim == 2 and (s.shape == (N, 1) or s.shape == (1, N)):
        return s.reshape(1, N), None, 0
    if s.ndim == 2 and K % s.shape[0] == 0:
        gk = K // s.shape[0]
        if s.shape[1] != N:
            if N % s.shape[1] != 0:
                raise ValueError(f"bad B scale shape {s.shape}")
            s = jnp.repeat(s, N // s.shape[1], axis=1)
        return None, s, gk
    raise ValueError(f"bad B scale shape {s.shape} for K={K}, N={N}")


def _xla_scaled_matmul(a16, b16, row, col, bias, out_dtype):
    out = jnp.dot(a16, b16, preferred_element_type=jnp.float32)
    if row is not None:
        out = out * row
    if col is not None:
        out = out * col
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


@register_op("fp8_gemm", "gemm")
def fp8_gemm(
    A: jax.Array,
    B: jax.Array,
    out_dtype=jnp.bfloat16,
    A_scale: Optional[jax.Array] = None,
    B_scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """W8A8 FP8 GEMM: ``dequant(A) @ dequant(B) + bias``
    (reference: csrc/xpu/torch_bindings.cpp:14-17, fp8_gemm_w8a8.h:86-150).

    A: [..., M, K] fp8; B: [K, N] fp8.  Scales: per-tensor scalar,
    per-token [M], per-channel [N], per-token-group [M, K/g] (mxfp8), or
    per-block [K/gk, N/gn] (DeepSeek-style, optionally UE8M0 power-of-two).
    """
    a2, lead = _flatten_batch(A)
    M, K = a2.shape
    N = B.shape[1]
    a_row, a_grp, gka = _classify_a_scale(A_scale, M, K)
    b_col, b_grp, gkb = _classify_b_scale(B_scale, K, N)
    if a_grp is None and b_grp is None:
        if use_pallas():
            out = qmm.quant_matmul_pallas(
                a2, B, a_kind="fp8", b_kind="fp8", out_dtype=jnp.float32)
            if a_row is not None:
                out = out * a_row
            if b_col is not None:
                out = out * b_col
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            return _unflatten(out.astype(out_dtype), lead)
        out = _xla_scaled_matmul(
            a2.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
            a_row, b_col, bias, out_dtype)
        return _unflatten(out, lead)
    # group/block path — fused dequant matmul.
    if use_pallas():
        a_kind = "fp8"
        if a_grp is not None and gka < 128:
            # small activation scale groups (mxfp8): pre-dequantize A with
            # XLA — exact for power-of-two (UE8M0) scales, and A is the
            # small operand so the bf16 materialization is cheap.
            a2 = (a2.astype(jnp.float32)
                  * jnp.repeat(a_grp, gka, axis=1)).astype(jnp.bfloat16)
            a_grp, gka, a_kind = None, 0, "dense"
        pend_epi = a_row is not None or b_col is not None
        out = qmm.quant_matmul_pallas(
            a2, B,
            a_kind=a_kind, b_kind="fp8",
            a_scale=a_grp, a_group_k=gka,
            b_scale=b_grp, b_group_k=gkb,
            bias=None if pend_epi else bias,
            out_dtype=(jnp.float32 if pend_epi
                       else mosaic_safe_dtype(out_dtype)),
        )
        if pend_epi:
            if a_row is not None:
                out = out * a_row
            if b_col is not None:
                out = out * b_col
            if bias is not None:
                out = out + bias.astype(jnp.float32)
        return _unflatten(out.astype(out_dtype), lead)
    af = a2.astype(jnp.float32)
    if a_grp is not None:
        af = af * jnp.repeat(a_grp, gka, axis=1)
    elif a_row is not None:
        af = af * a_row
    bf = B.astype(jnp.float32)
    if b_grp is not None:
        bf = bf * jnp.repeat(b_grp, gkb, axis=0)
    elif b_col is not None:
        bf = bf * b_col
    out = jnp.dot(af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if a_grp is not None and a_row is not None:
        out = out * a_row
    if b_grp is not None and b_col is not None:
        out = out * b_col
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)


@register_op("fp8_gemm_w8a16", "gemm")
def fp8_gemm_w8a16(
    A: jax.Array,
    B: jax.Array,
    B_scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Weight-only FP8 GEMM: high-precision A × fp8 B
    (reference: csrc/xpu/torch_bindings.cpp:19-22, fp8_gemm_w8a16.h:13-99).

    A: [..., M, K] f16/bf16/f32; B: [K, N] fp8; B_scale per-tensor,
    per-channel [N], or K-grouped [K/g, N].  Output dtype = A dtype.
    """
    a2, lead = _flatten_batch(A)
    M, K = a2.shape
    N = B.shape[1]
    b_col, b_grp, gkb = _classify_b_scale(B_scale, K, N)
    out_dtype = A.dtype
    a2 = mosaic_safe(a2) if use_pallas() else a2
    if b_grp is None:
        if use_pallas():
            if M >= 512:
                # prefill shapes: the fused kernel re-upcasts every weight
                # tile per M-block (ceil(M/bm) redundant VPU passes);
                # dequantize once with the fast bit-trick and run a plain
                # XLA bf16 GEMM at full MXU rate instead.
                b16 = qmm.fp8_dequant_pallas(B)
                out = jnp.dot(a2.astype(jnp.bfloat16), b16,
                              preferred_element_type=jnp.float32)
            else:
                # decode shapes: Pallas kernel with the fast in-kernel fp8
                # upcast (XLA's e4m3 convert runs ~4x slower on v5e, see
                # kernels/quant_matmul.fp8_upcast_f32)
                out = qmm.quant_matmul_pallas(
                    a2, B, a_kind="dense", b_kind="fp8",
                    out_dtype=jnp.float32)
            if b_col is not None:
                out = out * b_col
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            return _unflatten(out.astype(out_dtype), lead)
        out = _xla_scaled_matmul(
            a2.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
            None, b_col, bias, out_dtype)
        return _unflatten(out, lead)
    if use_pallas():
        out = qmm.quant_matmul_pallas(
            a2, B, a_kind="dense", b_kind="fp8",
            b_scale=b_grp, b_group_k=gkb, bias=bias,
            out_dtype=mosaic_safe_dtype(out_dtype))
        return _unflatten(out.astype(out_dtype), lead)
    bf = B.astype(jnp.float32) * jnp.repeat(b_grp, gkb, axis=0)
    out = jnp.dot(a2.astype(jnp.bfloat16), bf.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)


@register_op("int8_gemm_w8a8", "gemm")
def int8_gemm_w8a8(
    A: jax.Array,
    B: jax.Array,
    A_scale: Optional[jax.Array] = None,
    B_scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """W8A8 int8 GEMM on the MXU's native int8 path.

    A: [..., M, K] int8; B: [K, N] int8; scales per-tensor, per-token [M]
    (A) / per-channel [N] (B).  The int32 contraction is exact, so scales
    factor out:  out = (A·B)·a_scale⊗b_scale + bias.

    TPU-native counterpart of the reference's W8A8 recipe
    (csrc/xpu/onednn/fp8_gemm_w8a8.h:86-150): v5e has no fp8 unit but a
    first-class int8 MXU mode — the weight stream runs at ~740 GB/s (90%
    of HBM peak) vs 311 GB/s for upcasting e4m3, making int8 the
    speed-of-light 8-bit serving recipe on this hardware.
    """
    a2, lead = _flatten_batch(A)
    M, K = a2.shape
    N = B.shape[1]
    a_row, a_grp, _ = _classify_a_scale(A_scale, M, K)
    b_col, b_grp, _ = _classify_b_scale(B_scale, K, N)
    assert a_grp is None and b_grp is None, (
        "int8_gemm_w8a8 takes per-tensor/per-token/per-channel scales")
    if use_pallas():
        from vllm_xpu_kernels_tpu.registry import mosaic_safe_dtype

        out = qmm.int8_matmul_pallas(
            a2, B, a_row=a_row, b_col=b_col, bias=bias,
            out_dtype=mosaic_safe_dtype(out_dtype))
        return _unflatten(out.astype(out_dtype), lead)
    acc = jnp.dot(a2.astype(jnp.int32), B.astype(jnp.int32),
                  preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32)
    if a_row is not None:
        out = out * a_row
    if b_col is not None:
        out = out * b_col
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)


@register_op("int8_gemm_w8a8_silu_mul", "gemm")
def int8_gemm_w8a8_silu_mul(
    A: jax.Array,
    B: jax.Array,                       # [K, 2I] in the gu256 layout
    A_scale: Optional[jax.Array] = None,
    B_scale: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """W8A8 gated-MLP GEMM1 with the activation fused into the epilogue:
    ``silu(gate) * up`` -> [..., I] bf16, where ``B`` stores the fused
    [gate | up] weight 256-column interleaved (``gu256_perm``) so every
    GEMM output block holds whole (gate, up) pairs.  The [M, 2I]
    intermediate never touches HBM — at Llama-3-8B 4k-token prefill that
    is ~470 MB/layer of eliminated write+read traffic (the reference
    reaches the same fusion from the other side with its
    fused_silu_mul_quant kernels, csrc/quantization/fused_kernels/).
    Output columns come out in PLAIN (un-interleaved) order."""
    a2, lead = _flatten_batch(A)
    M, K = a2.shape
    N = B.shape[1]
    assert N % 512 == 0, N
    a_row, a_grp, _ = _classify_a_scale(A_scale, M, K)
    b_col, b_grp, _ = _classify_b_scale(B_scale, K, N)
    assert a_grp is None and b_grp is None
    if use_pallas():
        from vllm_xpu_kernels_tpu.registry import mosaic_safe_dtype

        out = qmm.int8_matmul_pallas(
            a2, B, a_row=a_row, b_col=b_col,
            out_dtype=mosaic_safe_dtype(out_dtype), act_gu=True)
        return _unflatten(out.astype(out_dtype), lead)
    f = jnp.dot(a2.astype(jnp.int32), B.astype(jnp.int32),
                preferred_element_type=jnp.int32).astype(jnp.float32)
    if a_row is not None:
        f = f * a_row
    if b_col is not None:
        f = f * b_col
    f4 = f.reshape(M, N // 512, 2, 256)
    gate = f4[:, :, 0, :].reshape(M, N // 2)
    up = f4[:, :, 1, :].reshape(M, N // 2)
    out = gate * jax.nn.sigmoid(gate) * up
    return _unflatten(out.astype(out_dtype), lead)


def _int4_dequant_ref(B_packed, B_scale, B_zp, group_size):
    """jnp reference: split-K packed int4 -> f32 dequantized [K, N]."""
    codes = qmm.unpack_int4_splitk_grouped(B_packed, group_size).astype(
        jnp.float32)
    K = codes.shape[0]
    if B_zp is None:
        zp = 8.0
    else:
        zp = jnp.repeat(B_zp.astype(jnp.float32), group_size, axis=0)
    s = jnp.repeat(B_scale.astype(jnp.float32), group_size, axis=0)
    assert s.shape[0] == K
    return (codes - zp) * s


@register_op("int4_gemm_w4a16", "gemm")
def int4_gemm_w4a16(
    A: jax.Array,
    B: jax.Array,
    bias: Optional[jax.Array],
    B_scale: jax.Array,
    B_zp: Optional[jax.Array],
    group_size: int,
    g_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """GPTQ/AWQ weight-only int4 GEMM
    (reference: csrc/xpu/torch_bindings.cpp:30-32, int4_gemm_w4a16.h).

    B: [K/2, N] split-K packed int8 (quantization.repack converters).
    B_zp: None => symmetric (zero-point 8, the reference's oneDNN broadcast
    scalar, _quantize_convert.py:216-219); else [K/g, N] uint8 codes.
    g_idx: K-permutation for act-order, applied to A's columns (the
    reference shuffles weights and permutes in-kernel; we permute A with an
    XLA gather — same contraction, reference _quantize_convert.py:82-90).
    """
    a2, lead = _flatten_batch(A)
    if g_idx is not None:
        a2 = jnp.take(a2, g_idx, axis=1)
    out_dtype = A.dtype
    M = a2.shape[0]
    if use_pallas():
        if M >= 512:
            # prefill shapes: dequantize once, plain XLA bf16 GEMM (the
            # fused kernel re-decodes every tile per M-block)
            b16 = qmm.packed_dequant_pallas(
                B, B_scale.astype(jnp.float32), group_size, "int4sk",
                zp=(8.0 if B_zp is None else B_zp))
            out = jnp.dot(mosaic_safe(a2).astype(jnp.bfloat16), b16,
                          preferred_element_type=jnp.float32)
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            return _unflatten(out.astype(out_dtype), lead)
        out = qmm.quant_matmul_pallas(
            mosaic_safe(a2), B, a_kind="dense", b_kind="int4sk",
            b_scale=B_scale.astype(jnp.float32), b_group_k=group_size,
            b_zp=(8.0 if B_zp is None else B_zp),
            bias=bias, out_dtype=mosaic_safe_dtype(out_dtype))
        return _unflatten(out.astype(out_dtype), lead)
    bf = _int4_dequant_ref(B, B_scale, B_zp, group_size)
    out = jnp.dot(a2.astype(jnp.float32), bf,
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)


@register_op("int4_gemm_w4a8", "gemm")
def int4_gemm_w4a8(
    A: jax.Array,
    A_scale: jax.Array,
    A_zp: Optional[jax.Array],
    B: jax.Array,
    B_scale: jax.Array,
    B_zp: Optional[jax.Array],
    group_size: int,
    g_idx: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Dynamic per-token int8 activations × int4 weights
    (reference: csrc/xpu/torch_bindings.cpp:34-38, int4_gemm_w4a8.h).

    A: [..., M, K] int8/uint8 codes; A_scale [M] per-token; A_zp [M] int
    (asymmetric) or None.  The per-token affine factors out of the
    contraction:  ``(A - zp·1ᵀ) @ W = A@W − zp ⊗ colsum(W)`` — we compute
    ``colsum(W)`` by appending a ones-row to A (one extra M row), so the
    whole thing is a single fused kernel pass + an O(MN) epilogue.
    """
    a2, lead = _flatten_batch(A)
    M, K = a2.shape
    if g_idx is not None:
        a2 = jnp.take(a2, g_idx, axis=1)
    a_row = jnp.asarray(A_scale, jnp.float32).reshape(M, 1)
    has_zp = A_zp is not None
    if has_zp:
        a2 = jnp.concatenate(
            [a2, jnp.ones((1, K), a2.dtype)], axis=0)
    if use_pallas():
        if M >= 512:
            # prefill shapes: dequantize once, bf16 GEMM (the fused
            # kernel re-decodes every weight tile per M-block); int8
            # activations upcast losslessly to bf16
            b16 = qmm.packed_dequant_pallas(
                B, B_scale.astype(jnp.float32), group_size, "int4sk",
                zp=(8.0 if B_zp is None else B_zp))
            p = jnp.dot(a2.astype(jnp.bfloat16), b16,
                        preferred_element_type=jnp.float32)
        elif a2.dtype == jnp.int8:
            # decode shapes: native s8 x s8 MXU dot on the unsigned
            # nibble codes; the quant offset folds into a per-group
            # rowsum correction (kernels/quant_matmul.int4_matmul_pallas)
            p = qmm.int4_matmul_pallas(
                a2, B, B_scale.astype(jnp.float32),
                group_size, b_zp=(8.0 if B_zp is None else B_zp))
        else:
            # uint8 (asymmetric) activations don't fit the s8 MXU mode
            p = qmm.quant_matmul_pallas(
                a2, B, a_kind="int8", b_kind="int4sk",
                b_scale=B_scale.astype(jnp.float32), b_group_k=group_size,
                b_zp=(8.0 if B_zp is None else B_zp),
                out_dtype=jnp.float32)
    else:
        bf = _int4_dequant_ref(B, B_scale, B_zp, group_size)
        p = jnp.dot(a2.astype(jnp.float32), bf,
                    preferred_element_type=jnp.float32)
    if has_zp:
        colsum = p[M]
        out = p[:M] - jnp.asarray(A_zp, jnp.float32).reshape(M, 1) * colsum
    else:
        out = p
    out = out * a_row
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)


@register_op("fp4_gemm", "gemm")
def fp4_gemm(
    A: jax.Array,
    B: jax.Array,
    A_scale: jax.Array,
    B_scale: jax.Array,
    out_dtype=jnp.bfloat16,
    bias: Optional[jax.Array] = None,
    group_size: int = 32,
) -> jax.Array:
    """W4A4 MXFP4 GEMM
    (reference: csrc/xpu/torch_bindings.cpp:24-27, fp4_gemm_w4a4.h:12-134).

    A: [..., M, K/2] lane-packed e2m1 (output of per_token_group_quant_mxfp4,
    low nibble = even k); A_scale [M, K/32] power-of-two floats.
    B: [K/2, N] split-K packed e2m1; B_scale [K/32, N or N/gn] floats.
    Activations are dequantized by XLA (exact: e2m1×2^e fits bf16) and the
    weight dequant is fused into the Pallas K loop.
    """
    a2, lead = _flatten_batch(A)
    M = a2.shape[0]
    K = a2.shape[1] * 2
    N = B.shape[1]
    # unpack interleaved activation nibbles -> [M, K] codes, decode, scale
    codes = qm.fp4_unpack2(a2.astype(jnp.uint8))
    a_deq = qmm.e2m1_decode_f32(codes)
    a_scale = jnp.asarray(A_scale, jnp.float32).reshape(M, K // group_size)
    a_deq = a_deq * jnp.repeat(a_scale, group_size, axis=1)
    _, b_grp, gkb = _classify_b_scale(B_scale, K, N)
    if use_pallas():
        out = qmm.quant_matmul_pallas(
            a_deq.astype(jnp.bfloat16), B,
            a_kind="dense", b_kind="fp4sk",
            b_scale=b_grp, b_group_k=gkb,
            bias=bias, out_dtype=mosaic_safe_dtype(out_dtype))
        return _unflatten(out.astype(out_dtype), lead)
    b_codes = qmm.unpack_int4_splitk_grouped(B, gkb)
    b_deq = qmm.e2m1_decode_f32(b_codes) * jnp.repeat(b_grp, gkb, axis=0)
    out = jnp.dot(a_deq.astype(jnp.bfloat16), b_deq.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return _unflatten(out.astype(out_dtype), lead)

"""Shared quantization numerics (FP8 e4m3fn/e5m2, MX FP4 e2m1, UE8M0 scales).

Semantics match the reference kernel library bit-for-bit where it defines
them (cited per function):

- FP8 convert-with-scale clamps to the target dtype's finite range before
  conversion (reference: csrc/quantization/fp8/quant_utils.h
  ``ConvertWithScaleOp``).
- UE8M0 scale rounding is ``exp2(ceil(log2(max(|s|, eps))))``
  (reference: csrc/quantization/fp8/fp8_quant.cpp:243-246,
  csrc/quantization/fp4/mxfp4_quant.h:105).
- FP4 E2M1 encoding uses midpoint thresholds with strict ``>`` comparisons
  (reference: csrc/quantization/fp4/mxfp4_quant.h:17-28), i.e. values at an
  exact midpoint round toward the smaller magnitude.
- Nibble packing: ``byte[i] = fp4[2i+1] << 4 | fp4[2i]``
  (reference: csrc/quantization/fp4/mxfp4_quant.h:30-33).

Everything here is pure jnp and usable both inside Pallas kernel bodies and
in reference implementations.
"""

from __future__ import annotations

import jax.numpy as jnp

FP8_E4M3_MAX = 448.0
FP8_E5M2_MAX = 57344.0
FP4_E2M1_MAX = 6.0

# e2m1 magnitudes for codes 0..7 and the midpoints between adjacent codes.
_E2M1_VALUES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
_E2M1_MIDPOINTS = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)


def fp8_max_value(dtype) -> float:
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float8_e4m3fn:
        return FP8_E4M3_MAX
    if dtype == jnp.float8_e5m2:
        return FP8_E5M2_MAX
    if dtype == jnp.int8:
        return 127.0
    raise ValueError(f"unsupported quant dtype {dtype}")


def min_scaling_factor(dtype) -> float:
    """Scale floor: 1/(qmax*512) (reference: fp8/quant_utils.h:35-37)."""
    return 1.0 / (fp8_max_value(dtype) * 512.0)


def quant_fp8(x, inv_scale, dtype=jnp.float8_e4m3fn, qmin=None, qmax=None):
    """clamp(x*inv_scale) -> fp8/int8. x is float32-ish; inv_scale = 1/scale."""
    qmax_v = fp8_max_value(dtype) if qmax is None else qmax
    qmin_v = -qmax_v if qmin is None else qmin
    y = x.astype(jnp.float32) * inv_scale
    y = jnp.clip(y, qmin_v, qmax_v)
    if jnp.dtype(dtype) == jnp.int8:
        # SYCL float->int8 conversion rounds to nearest even via the
        # reference's ConvertWithScaleOp; match round-half-even.
        y = jnp.round(y)
    return y.astype(dtype)


def ue8m0_round(scale, eps: float = 1e-10):
    """Round a positive scale up to a power of two (UE8M0 family)."""
    s = jnp.maximum(jnp.abs(scale.astype(jnp.float32)), eps)
    return jnp.exp2(jnp.ceil(jnp.log2(s)))


def e8m0_encode(scale):
    """Positive power-of-two scale -> UE8M0 exponent byte (the MX spec's
    1-byte shared-scale storage, bias 127; the reference stores MXFP4
    group scales exactly so).  Exponents are clamped to the bf16-normal
    range [-126, 127] so the in-kernel byte->bf16 decode (exp << 7 bit
    shift) never lands subnormal."""
    e = jnp.round(jnp.log2(jnp.maximum(
        scale.astype(jnp.float32), 1e-38))).astype(jnp.int32)
    return jnp.clip(e + 127, 1, 254).astype(jnp.uint8)


def e8m0_decode(b):
    """UE8M0 exponent byte -> float32 power-of-two scale."""
    return jnp.exp2(b.astype(jnp.float32) - 127.0)


def fp4_e2m1_encode(x):
    """float -> e2m1 code (uint8 in [0,15]); x must already be in [-6, 6]."""
    a = jnp.abs(x.astype(jnp.float32))
    sign = jnp.where(x < 0, jnp.uint8(8), jnp.uint8(0))
    code = jnp.zeros(x.shape, jnp.uint8)
    for m in _E2M1_MIDPOINTS:
        code = code + (a > m).astype(jnp.uint8)
    return code | sign


def fp4_e2m1_decode(code):
    """e2m1 code (uint8) -> float32 value."""
    mag_lut = jnp.asarray(_E2M1_VALUES, jnp.float32)
    mag = mag_lut[(code & 0x7).astype(jnp.int32)]
    return jnp.where((code & 0x8) != 0, -mag, mag)


def fp4_pack2(codes):
    """[..., 2k] e2m1 codes -> [..., k] packed uint8 (low nibble = even idx)."""
    lo = codes[..., 0::2].astype(jnp.uint8)
    hi = codes[..., 1::2].astype(jnp.uint8)
    return lo | (hi << 4)


def fp4_unpack2(packed):
    """[..., k] packed uint8 -> [..., 2k] e2m1 codes."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)

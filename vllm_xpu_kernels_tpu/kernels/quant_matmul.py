"""Fused dequant-matmul Pallas kernel — the TPU-native replacement for the
reference's oneDNN quantized GEMM layer (reference:
csrc/xpu/onednn/onednn_matmul.cpp, fp8_gemm_w8a8.h, fp8_gemm_w8a16.h,
int4_gemm_w4a16.h, int4_gemm_w4a8.h).

One generalized kernel covers every weight/activation recipe:

- the K grid dimension steps one **scale group** at a time (bk = group
  size); raw quantized tiles are upcast losslessly (fp8/int4 codes are
  exactly representable in bf16), matmul'd on the MXU, and the group scales
  are applied **post-dot** to the f32 partial product as a rank-1
  ``a_scale[bm,1] · b_scale[1,bn]`` factor before accumulation.  This is
  both faster (O(bm·bn) scaling instead of O(bm·bk + bk·bn) dequant) and
  more accurate (no re-rounding of dequantized values to bf16) than
  dequant-then-matmul.
- per-tensor / per-row / per-col scales are applied as an XLA epilogue
  *outside* the kernel; only K-grouped scales come here.
- int4 weights use this engine's own "split-K" packing: byte ``b[k, n]``
  holds ``w[k, n]`` in its low nibble and ``w[k + K/2, n]`` in its high
  nibble, so a packed [K/2, N] tile unpacks to [K, N] with a single
  sublane-axis concat — no in-register interleave (which the TPU vector
  unit cannot do cheaply).  Repack utilities from GPTQ/AWQ layouts live in
  ``vllm_xpu_kernels_tpu.quantization.repack``.
- int4 zero-points are subtracted pre-dot (they vary per column within a
  group): ``b = codes − zp[1, bn]`` broadcasts over sublanes on the VPU.

The reference's oneDNN LRU primitive cache (lru_cache.h:14-95) has no
analogue here: XLA's jit cache memoizes each (shape, dtype, recipe)
specialization.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_xpu_kernels_tpu.registry import interpret_mode


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# in-kernel dequant helpers (pure jnp; also used by the jnp reference path)
# ---------------------------------------------------------------------------


def unpack_nibbles_i8(packed):
    """[rows, N] packed bytes -> (lo, hi) int8 nibble arrays in [0, 15],
    extracted in PACKED int32 lanes: one and/shift covers four bytes (the
    i8<->i32 bitcasts regroup sublanes, irrelevant for bytewise-uniform
    mask ops).  Requires rows % 4 == 0 (Mosaic int8 sublane packing)."""
    from jax.experimental.pallas import tpu as pltpu

    p32 = pltpu.bitcast(packed, jnp.int32)
    lo = pltpu.bitcast(p32 & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast((p32 >> 4) & 0x0F0F0F0F, jnp.int8)
    return lo, hi


def unpack_int4_splitk(packed):
    """One *group's* packed tile [g/2, N] -> [g, N] int32 codes in [0, 15].

    Low nibble = rows [0, g/2), high nibble = rows [g/2, g).  The kernel's
    K grid steps one scale group at a time, so each tile is one group.

    The nibble extraction runs in PACKED int32 lanes — one and/shift
    covers FOUR bytes (the i8<->i32 bitcasts regroup sublanes, which is
    irrelevant for bytewise-uniform mask ops) — instead of widening every
    byte to int32 first (Mosaic has no 8-bit shifts).  Measured 488 ->
    900+ GB/s on the w4a8 weight stream.
    """
    from jax.experimental.pallas import tpu as pltpu

    if packed.shape[0] % 4 == 0:
        lo, hi = unpack_nibbles_i8(packed)
        return jnp.concatenate([lo, hi], axis=0).astype(jnp.int32)
    p = packed.astype(jnp.uint8).astype(jnp.int32)
    return jnp.concatenate([p & 0xF, p >> 4], axis=0)


def unpack_int4_splitk_grouped(packed, group_size):
    """Full-matrix jnp unpack of the per-group split-K layout:
    [K/2, N] -> [K, N] uint8 codes (reference-path twin of the in-kernel
    per-tile unpack)."""
    g = group_size
    k2, n = packed.shape
    p = packed.reshape(k2 * 2 // g, g // 2, n).astype(jnp.uint8)
    return jnp.concatenate([p & 0xF, p >> 4], axis=1).reshape(k2 * 2, n)


def fp8_upcast_f32(x):
    """fp8 -> f32 inside a kernel, fast.

    Mosaic's generic e4m3->float cast runs ~76 GB/s on v5e (no native fp8
    unit); this integer bit-trick reconstructs the f32 pattern directly
    (sign<<24 | (exp:mant)<<20 + bias-shift, with a two-op subnormal fix)
    and measures ~4x faster (311 GB/s in the w8a16 GEMM).  Exact for every
    e4m3 code except NaN (0x7f/0xff -> ±480; quantized weights are
    NaN-free by construction).  e5m2 already has a fast native path (it is
    truncated f16).
    """
    from jax.experimental.pallas import tpu as pltpu

    if x.dtype == jnp.float8_e4m3fn:
        u = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
        me = u & 0x7F
        h = ((u & 0x80) << 24) | ((me << 20) + (120 << 23))
        f = pltpu.bitcast(h, jnp.float32)
        sgn = jnp.where(u >= 128, jnp.float32(-0.015625),
                        jnp.float32(0.015625))
        return jnp.where(me < 8, f * 2.0 - sgn, f)
    return x.astype(jnp.float32)


def e4m3_pairs_to_bf16(raw):
    """e4m3 bytes -> bf16 values assembled as HALFWORD PAIRS in i32
    lanes — two values per lane op instead of :func:`fp8_upcast_f32`'s
    one-per-i32-lane widen (the 4x lane waste is why the f32 trick tops
    out ~311 GB/s).

    bf16 field: sign<<15 | (e4m3 exp:mant << 4) + (120 << 7); the
    subnormal half (e == 0) is fixed in bf16 arithmetic (f*2 - sgn*2^-6,
    selected by |f| < 2^-6 — every normal maps to >= 2^-6).  Exact for
    all codes except NaN (0x7f/0xff -> +-480, same as fp8_upcast_f32).

    raw: [k, n] e4m3 (k % 4 == 0).  Returns bf16 [k, n] in SIGMA row
    order (byte pairs of each i32 word land as rows 4w,4w+1 then
    4w+2,4w+3 across the two output halves — :func:`e4m3_sigma_perm`
    gives the original-row index per output row; GEMM callers fold it
    into the activation column permutation like the packed-int4 paths).
    """
    from jax.experimental.pallas import tpu as pltpu

    p32 = pltpu.bitcast(raw, jnp.int32)              # [k/4, n]

    def halves(p):
        uh = (p32 >> p) & 0x00FF00FF if p else p32 & 0x00FF00FF
        mag = ((uh & 0x007F007F) << 4) + 0x3C003C00
        sg = (uh & 0x00800080) << 8
        # per-halfword NORMAL mask: exp bits (u & 0x78) nonzero
        t = uh & 0x00780078
        nm = (((t + 0x00780078) >> 7) & 0x00010001) * 0x0000FFFF
        return mag | sg, nm

    h_e, nm_e = halves(0)
    h_o, nm_o = halves(8)

    def interleave(a, b):
        out_a = (a & 0x0000FFFF) | (b << 16)
        out_b = ((a >> 16) & 0x0000FFFF) | (b & ~0x0000FFFF)
        return jnp.concatenate([out_a, out_b], axis=0)

    bits = interleave(h_e, h_o)
    nm = interleave(nm_e, nm_o)
    f = pltpu.bitcast(bits, jnp.bfloat16)
    sign_bits = jnp.int32(0x80008000 - 2 ** 32)
    sgn = pltpu.bitcast(0x3C803C80 | (bits & sign_bits), jnp.bfloat16)
    # subnormal fix in bf16 ARITHMETIC (exact), selected by INT masks —
    # Mosaic has no bf16 vector compare on this target
    fix = pltpu.bitcast(f * jnp.bfloat16(2.0) - sgn, jnp.int32)
    return pltpu.bitcast((bits & nm) | (fix & ~nm), jnp.bfloat16)


def e4m3_planes_to_bf16(raw):
    """Interleave-free variant of :func:`e4m3_pairs_to_bf16`: the even-
    and odd-byte planes are emitted as the two sublane HALVES of the
    output instead of being re-interleaved in-lane (the interleave's
    mask/shift/or chain was pure overhead — the MXU dot is K-order
    invariant, so the caller folds the plane order into a row/column
    permutation, ideally a LOAD-TIME weight row permutation that costs
    nothing at run time).

    raw: [k, n] e4m3 (k % 4 == 0).  Returns bf16 [k, n]; output row j
    holds original row ``4*(jj//2) + 2*(jj%2) + (j >= k/2)`` with
    ``jj = j % (k/2)`` (:func:`e4m3_planes_perm`)."""
    from jax.experimental.pallas import tpu as pltpu

    p32 = pltpu.bitcast(raw, jnp.int32)              # [k/4, n]

    def halves(p):
        uh = (p32 >> p) & 0x00FF00FF if p else p32 & 0x00FF00FF
        mag = ((uh & 0x007F007F) << 4) + 0x3C003C00
        sg = (uh & 0x00800080) << 8
        t = uh & 0x00780078
        nm = (((t + 0x00780078) >> 7) & 0x00010001) * 0x0000FFFF
        return mag | sg, nm

    h_e, nm_e = halves(0)
    h_o, nm_o = halves(8)
    bits = jnp.concatenate([h_e, h_o], axis=0)
    nm = jnp.concatenate([nm_e, nm_o], axis=0)
    f = pltpu.bitcast(bits, jnp.bfloat16)
    sign_bits = jnp.int32(0x80008000 - 2 ** 32)
    sgn = pltpu.bitcast(0x3C803C80 | (bits & sign_bits), jnp.bfloat16)
    fix = pltpu.bitcast(f * jnp.bfloat16(2.0) - sgn, jnp.int32)
    return pltpu.bitcast((bits & nm) | (fix & ~nm), jnp.bfloat16)


@functools.lru_cache(maxsize=64)
def e4m3_planes_perm(k_dim: int):
    """Original row index per output row of :func:`e4m3_planes_to_bf16`."""
    j = np.arange(k_dim)
    half = k_dim // 2
    jj = j % half
    return 4 * (jj // 2) + 2 * (jj % 2) + (j // half)


@functools.lru_cache(maxsize=64)
def e4m3_planes_block_perm(k_dim: int, bk: int):
    """Tile-local planes perm expanded over the whole K axis: index i of
    the PERMUTED stream <- original row; use its argsort to pre-permute
    stored weight rows so the in-kernel planes decode emits natural
    order."""
    tiles = k_dim // bk
    sig = e4m3_planes_perm(bk)
    return (np.arange(tiles)[:, None] * bk + sig[None, :]).reshape(-1)


@functools.lru_cache(maxsize=64)
def e4m3_sigma_perm(k_dim: int):
    """Original row index for each output row of
    :func:`e4m3_pairs_to_bf16` (verified against the f32 trick on v5e).
    """
    j = np.arange(k_dim)
    half = k_dim // 2
    w = (j % half) // 2
    return 4 * w + 2 * (j // half) + (j % half) % 2


@functools.lru_cache(maxsize=64)
def e4m3_block_perm(k_dim: int, bk: int):
    """Activation column permutation matching per-K-tile sigma order of
    :func:`e4m3_pairs_to_bf16` (the GEMM's B tiles convert tile-local)."""
    tiles = k_dim // bk
    sig = e4m3_sigma_perm(bk)
    return (np.arange(tiles)[:, None] * bk + sig[None, :]).reshape(-1)


def e2m1_decode_f32(code):
    """Arithmetic e2m1 decode (no LUT gather — VPU-friendly).

    code: integer array of 4-bit codes in [0, 15].
    value = (-1)^s · (e == 0 ? 0.5·m : (1 + 0.5·m)·2^(e-1)).
    Matches the midpoint table in utils/quant_math.py (reference:
    csrc/quantization/fp4/mxfp4_quant.h:17-28).
    """
    c = code.astype(jnp.int32)
    sign = jnp.where((c & 0x8) != 0, -1.0, 1.0)
    e = ((c >> 1) & 0x3).astype(jnp.float32)
    m = (c & 0x1).astype(jnp.float32)
    mag = jnp.where(e == 0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2(e - 1.0))
    return sign * mag


def e2m1_decode_bits_f32(c):
    """e2m1 decode by integer assembly of the f32 bit pattern — no exp2,
    no f32 arithmetic: sign<<31 | (126+e)<<23 | m<<22 for normals, the
    e==0 row handled by a select (0 or 0.5).  ~half the vector ops of
    :func:`e2m1_decode_f32`; bit-exact against it for all 16 codes.

    c: int32 array of 4-bit codes in [0, 15].
    """
    from jax.experimental.pallas import tpu as pltpu

    e = (c >> 1) & 0x3
    m = c & 0x1
    sgn = (c & 0x8) << 28
    bits = jnp.where(e == 0, m * 0x3F000000, ((126 + e) << 23) + (m << 22))
    return pltpu.bitcast(sgn | bits, jnp.float32)


def packed_plane_to_bf16(raw, plane, kind):
    """One nibble plane of packed int4/fp4 bytes -> bf16 values, built by
    integer assembly of bf16 PAIRS inside i32 lanes — no per-element
    widening, no f32 arithmetic, ~7 integer ops per element (every op is
    halfword-uniform, so four packed codes are processed per i32 lane op).

    - ``kind='int4'``: codes c in [0,15] -> bf16(c - 8) EXACTLY via the
      magic-number trick: 0x4300 | c bitcasts to 128 + c (c rides the
      bf16 mantissa), then subtract 136.
    - ``kind='mxfp4'``: e2m1 decode: sign<<15 | (126+e)<<7 | m<<6, with
      the mantissa bit suppressed when e == 0 and the +-0 row zeroed by
      halfword masks built from (code & 7) != 0.

    raw: [pb, bn] int8 packed bytes (pb % 4 == 0); plane: 0 = low nibble,
    4 = high.  Returns [pb, bn] bf16 in "sigma order": out row j holds the
    code of packed row ``4*(jj//2) + 2*(j // (pb/2)) + jj%2`` where
    ``jj = j % (pb/2)`` — the caller folds sigma into its activation
    column permutation (the MXU dot is order-invariant over K) and its
    scale-group reshape, so the order never needs fixing up in VMEM.
    Assumes little-endian sublane<->byte bitcast order (verified against
    the jnp reference on real v5e hardware by the grouped-GEMM tests).
    """
    from jax.experimental.pallas import tpu as pltpu

    p32 = pltpu.bitcast(raw, jnp.int32)          # [pb/4, bn]
    q = (p32 >> plane) & 0x0F0F0F0F if plane else p32 & 0x0F0F0F0F

    if kind == "int4":
        def halves(p):
            qh = (q >> p) & 0x00FF00FF
            return qh | 0x43004300
    else:
        # bytewise-shared prep: 4 codes per op.  T = em + (e != 0), so
        # that (T + 0xFB) << 6 is the bf16 exp|mant field: the e2m1 field
        # values 252,254,255,256..259 are affine in em except the e==0
        # step, which (e != 0) supplies; m<<6 suppression at e==0 and
        # the 0.5 subnormal both fall out of the same affine form.
        u = (q >> 1) | (q >> 2)
        tb = (q & 0x07070707) + (u & 0x01010101)
        nzb = (q | u) & 0x01010101
        sgb = q & 0x08080808

        def halves(p):
            th = (tb >> p) & 0x00FF00FF
            bits = (th + 0x00FB00FB) << 6
            nzm = ((nzb >> p) & 0x00010001) * 0x0000FFFF
            sg = ((sgb >> p) & 0x00080008) << 12
            return (bits & nzm) | sg

    be = halves(0)
    bo = halves(8)
    out_a = (be & 0x0000FFFF) | (bo << 16)       # bf16(c0) | bf16(c1)<<16
    out_b = ((be >> 16) & 0x0000FFFF) | (bo & ~0x0000FFFF)
    out32 = jnp.concatenate([out_a, out_b], axis=0)      # [pb/2, bn]
    vals = pltpu.bitcast(out32, jnp.bfloat16)            # [pb, bn]
    if kind == "int4":
        vals = vals - jnp.bfloat16(136.0)
    return vals


def _to_mxu_operand(tile, kind, zp, mm_dtype):
    """Raw storage tile -> MXU-ready values (packed kinds unpack along
    sublanes; zp is a [1, bn] ref slice or float const, subtracted pre-dot)."""
    if kind in ("int4sk", "fp4sk"):
        codes = unpack_int4_splitk(tile)
        if kind == "fp4sk":
            x = e2m1_decode_f32(codes)
        else:
            # Mosaic has no uint8->bf16 cast; widen through int32.
            x = codes.astype(jnp.int32).astype(jnp.float32)
    elif tile.dtype in (jnp.int8, jnp.uint8):
        x = tile.astype(jnp.int32).astype(jnp.float32)
    elif tile.dtype == jnp.float8_e4m3fn:
        x = fp8_upcast_f32(tile)
    else:
        x = tile
    if zp is not None:
        zf = (zp if isinstance(zp, float)
              else zp.astype(jnp.int32).astype(jnp.float32))
        x = x.astype(jnp.float32) - zf
    if x.dtype == jnp.float16 and mm_dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)   # Mosaic has no f16->bf16 cast
    return x.astype(mm_dtype)


def _qmm_kernel(spec, *refs):
    """refs: [a, b, (a_scale), (b_scale), (b_zp), (bias), out, acc]."""
    import jax.experimental.pallas as pl

    it = iter(refs)
    a_ref = next(it)
    b_ref = next(it)
    a_s_ref = next(it) if spec["a_scale_group"] else None
    b_s_ref = next(it) if spec["b_scale_group"] else None
    b_z_ref = next(it) if spec["b_zp_group"] else None
    bias_ref = next(it) if spec["has_bias"] else None
    o_ref = next(it)
    acc_ref = next(it)

    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mm_dtype = jnp.float32 if spec["mm_f32"] else jnp.bfloat16
    a = _to_mxu_operand(a_ref[...], spec["a_kind"], None, mm_dtype)
    S = spec["b_sub"]
    if spec.get("b_e4m3_planes"):
        # interleave-free halfword-pair assembly: plane row order, folded
        # into a load-time weight row permutation (or the caller's A
        # column permutation)
        b = e4m3_planes_to_bf16(b_ref[...]).astype(mm_dtype)
        b_s_post = b_s_ref
    elif spec.get("b_e4m3_pairs"):
        # halfword-pair e4m3->bf16 assembly (2 values per i32 lane; the
        # f32 bit-trick widens each byte to a full i32 lane).  Tile rows
        # come out in sigma order — the caller permuted A's columns to
        # match (K-group scales are constant within a tile, so post-dot
        # scaling is unaffected).
        b = e4m3_pairs_to_bf16(b_ref[...]).astype(mm_dtype)
        b_s_post = b_s_ref
    elif S > 1:
        # small-group (MX) mode: the K step spans S scale groups; dequantize
        # B in VMEM with a sublane broadcast-reshape.  Exact for power-of-two
        # (UE8M0) scales since fp8/fp4/int4 values fit bf16 losslessly.
        bn = b_ref.shape[-1]
        g = None
        raw = b_ref[...]
        if spec["b_kind"] in ("int4sk", "fp4sk"):
            g = raw.shape[0] * 2 // S
            lo, hi = unpack_nibbles_i8(raw)
            codes = jnp.concatenate(
                [lo.reshape(S, g // 2, bn), hi.reshape(S, g // 2, bn)],
                axis=1).astype(jnp.int32)
            x = (e2m1_decode_f32(codes) if spec["b_kind"] == "fp4sk"
                 else codes.astype(jnp.float32))
        else:
            g = raw.shape[0] // S
            up = (fp8_upcast_f32(raw) if raw.dtype == jnp.float8_e4m3fn
                  else raw.astype(jnp.float32))
            x = up.reshape(S, g, bn)
        if b_z_ref is not None:
            x = x - b_z_ref[...].astype(jnp.int32).astype(jnp.float32)
        elif spec["b_zp_const"] is not None:
            x = x - spec["b_zp_const"]
        x = x * b_s_ref[...].astype(jnp.float32)     # [S, 1, bn] broadcast
        b = x.reshape(S * g, bn).astype(mm_dtype)
        b_s_post = None
    else:
        b = _to_mxu_operand(
            b_ref[...], spec["b_kind"],
            (b_z_ref[0] if b_z_ref is not None else spec["b_zp_const"]),
            mm_dtype,
        )
        b_s_post = b_s_ref
    part = jnp.dot(a, b, preferred_element_type=jnp.float32)
    # scales arrive as 3-D blocks with a leading grid-mapped group axis of
    # size 1 (Mosaic's 2-D tiling rules reject (bm, 1)/(1, bn) blocks).
    if a_s_ref is not None:
        part = part * a_s_ref[0].astype(jnp.float32)   # [bm, 1]
    if b_s_post is not None:
        part = part * b_s_post[0].astype(jnp.float32)  # [1, bn]
    acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if bias_ref is not None:
            out = out + bias_ref[...].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def fp8_dequant_pallas(b: jax.Array, out_dtype=jnp.bfloat16,
                       block_k: int = 512, block_n: int = 1024):
    """[K, N] e4m3 -> bf16 in one streaming pass (fast bit-trick upcast).

    Prefill-shape GEMMs (large M) pay the in-K-loop upcast once per
    M-block — ceil(M/bm) redundant VPU passes over every weight byte.
    Materializing the bf16 weights first costs one extra HBM round trip
    (~2x weight bytes) and lets the matmul run as a plain XLA bf16 GEMM
    at full MXU rate; the op layer routes on M (ops/gemm.py).
    """
    import jax.experimental.pallas as pl

    K, N = b.shape
    bk = min(block_k, _round_up(K, 8))
    bn = min(block_n, _round_up(N, 128))

    def kernel(b_ref, o_ref):
        o_ref[...] = fp8_upcast_f32(b_ref[...]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(K, bk), pl.cdiv(N, bn)),
        in_specs=[pl.BlockSpec((bk, bn), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((bk, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((K, N), out_dtype),
        interpret=interpret_mode(),
    )(b)


def packed_dequant_pallas(b_packed, scales, group_size, kind,
                          zp=None, out_dtype=jnp.bfloat16,
                          block_n: int = 1024):
    """Split-K packed int4/fp4 [K/2, N] + group scales [K/g, N] -> bf16
    [K, N] in one streaming pass (the prefill-shape counterpart of
    fp8_dequant_pallas: large-M GEMMs dequantize once instead of
    re-decoding every weight tile per M-block).

    kind: 'int4sk' (codes - zp) | 'fp4sk' (e2m1 x scale).  zp: float
    constant or [K/g, N] array.
    """
    import jax.experimental.pallas as pl

    K = b_packed.shape[0] * 2
    N = b_packed.shape[1]
    g = group_size
    assert K % g == 0 and g % 2 == 0 and (g // 2) % 8 == 0, (K, g)
    bn = min(block_n, _round_up(N, 128))
    has_zp_arr = isinstance(zp, jax.Array)
    spec = dict(kind=kind, has_zp_arr=has_zp_arr,
                zp_const=None if has_zp_arr or zp is None else float(zp))

    def kernel(*refs):
        it = iter(refs)
        b_ref = next(it)
        s_ref = next(it)
        z_ref = next(it) if spec["has_zp_arr"] else None
        o_ref = next(it)
        codes = unpack_int4_splitk(b_ref[...])
        if spec["kind"] == "fp4sk":
            x = e2m1_decode_f32(codes)
        else:
            x = codes.astype(jnp.int32).astype(jnp.float32)
        if z_ref is not None:
            x = x - z_ref[0].astype(jnp.int32).astype(jnp.float32)
        elif spec["zp_const"] is not None:
            x = x - spec["zp_const"]
        o_ref[...] = (x * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((g // 2, bn), lambda i, j: (i, j)),
        pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j)),
    ]
    operands = [b_packed, scales.reshape(K // g, 1, N)]
    if has_zp_arr:
        in_specs.append(pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j)))
        operands.append(zp.reshape(K // g, 1, N))
    return pl.pallas_call(
        kernel,
        grid=(K // g, pl.cdiv(N, bn)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((K, N), out_dtype),
        interpret=interpret_mode(),
    )(*operands)


def gu256_perm(inter: int) -> np.ndarray:
    """Column permutation storing a fused [gate | up] weight as
    256-column interleaved pairs [g0,u0,g1,u1,...]: any N block that is
    a multiple of 512 then holds whole (gate, up) pairs, so the int8
    GEMM epilogue can apply the gated activation in-block
    (``int8_matmul_pallas(act_gu=True)``) and the [M, 2I] intermediate
    never round-trips HBM.  256 = 2 lane tiles keeps every epilogue
    slice 128-aligned for both block sizes the VMEM clamp picks."""
    assert inter % 256 == 0, inter
    idx = []
    for i in range(inter // 256):
        idx.append(np.arange(i * 256, (i + 1) * 256))
        idx.append(np.arange(inter + i * 256, inter + (i + 1) * 256))
    return np.concatenate(idx)


def int8_matmul_pallas(
    a: jax.Array,                # [M, K] int8
    b: jax.Array,                # [K, N] int8
    # Tuned on v5e at prefill shapes (M=4096, K=4096, N=6144/14336):
    # fatter blocks reach 350-374 TOPS (89-95% of int8 peak) vs ~270 at
    # (256, 512, 2048).  Small M/N/K are clamped below.
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 4096,
    a_row=None,                  # [M, 1] f32 per-token scales (optional)
    b_col=None,                  # [1, N] f32 per-channel scales (optional)
    bias=None,                   # [N] f32 (optional)
    out_dtype=None,              # fused-epilogue output dtype
    act_gu=False,                # gated-act epilogue over the gu256 layout
) -> jax.Array:
    """Native W8A8 int8 GEMM -> exact s32, on the MXU's int8 path.

    No dequant, no upcast: the s8 operands feed the MXU directly, so the
    weight stream runs at byte-DMA speed (measured 740 GB/s on v5e —
    90% of HBM peak — vs 484 GB/s for the upcast-to-bf16 w8a16 path and
    311 GB/s for the e4m3 bit-trick).  Scales/bias are the caller's XLA
    epilogue.  This is the TPU-native analogue of the reference's W8A8
    oneDNN recipe (csrc/xpu/onednn/fp8_gemm_w8a8.h:86-150): the systolic
    array has a first-class int8 mode, so 8-bit serving should quantize
    activations rather than upcast weights.

    ``act_gu=True`` (requires the fused epilogue): ``b`` is a gated-MLP
    [gate | up] weight stored in the 256-column-interleaved ``gu256``
    layout (see :func:`gu256_perm`); the final K step applies
    ``silu(gate) * up`` on the dequantized f32 block and writes a
    [M, N/2] bf16 result — the [M, N] intermediate (235 MB/layer at
    Llama-3-8B 4k-token prefill) never touches HBM.  Epilogue slices are
    256-lane aligned, so any clamped bn that is a multiple of 512 works.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    N = b.shape[1]
    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, _round_up(N, 128))

    def pick_bk(limit):
        bk = min(limit, K)
        while K % bk != 0:
            bk -= 128
        return bk

    bk = pick_bk(block_k)

    def vmem_bytes(bn, bk):
        # double-buffered s8 operands + s32 acc + double-buffered out
        return 2 * (bm * bk + bk * bn) + 4 * bm * bn + 2 * 2 * bm * bn

    # stay under the 16 MB scoped-VMEM limit (e.g. K=14336 picks
    # bk=3584, which with bn=1024 overflowed by 384 KB)
    while vmem_bytes(bn, bk) > 14 * 1024 * 1024 and bn > 512:
        bn //= 2
    while vmem_bytes(bn, bk) > 14 * 1024 * 1024 and bk > 1024:
        bk = pick_bk(bk // 2)
    assert bk >= 128 or bk == K, (K, bk)

    # Fused scale/bias epilogue: writing the s32 accumulator to HBM and
    # scaling in XLA costs an extra s32 round trip per GEMM (s32 write +
    # s32 read + narrow write ~= 2.5x the output bytes); applying the
    # per-token/per-channel scales in the last K step writes the narrow
    # dtype once.
    fused = out_dtype is not None
    has_bias = bias is not None
    if act_gu:
        assert fused and not has_bias, "act_gu needs the fused epilogue"
        assert bn % 512 == 0 and N % bn == 0, (bn, N)
    if fused:
        ar = (jnp.broadcast_to(
            jnp.asarray(1.0 if a_row is None else a_row, jnp.float32
                        ).reshape(-1, 1), (M, 1)))
        bc = (jnp.broadcast_to(
            jnp.asarray(1.0 if b_col is None else b_col, jnp.float32
                        ).reshape(1, -1), (1, N)))
        if has_bias:
            # scale row + bias row ride as one [2, N] operand; the
            # bias-less path skips the concat entirely (it showed up as
            # a loop-invariant pad+concat per GEMM per decode step)
            bc2 = jnp.concatenate(
                [bc, jnp.asarray(bias, jnp.float32).reshape(1, N)], axis=0)
        else:
            bc2 = bc

    def kernel(*refs):
        if fused:
            a_ref, b_ref, ar_ref, bc_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            if fused:
                out = (acc_ref[:].astype(jnp.float32)
                       * ar_ref[...] * bc_ref[0:1])
                if has_bias:
                    out = out + bc_ref[1:2]
                if act_gu:
                    # gu256 layout: the block is [g,u,g,u,...] in
                    # 256-lane groups; every slice boundary is
                    # 128-aligned (no relayout)
                    np_ = bn // 512
                    gate = jnp.concatenate(
                        [out[:, i * 512:i * 512 + 256]
                         for i in range(np_)], axis=-1)
                    up = jnp.concatenate(
                        [out[:, i * 512 + 256:(i + 1) * 512]
                         for i in range(np_)], axis=-1)
                    out = gate * jax.lax.logistic(gate) * up
                o_ref[:] = out.astype(o_ref.dtype)
            else:
                o_ref[:] = acc_ref[:]

    in_specs = [pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))]
    operands = [a, b]
    if fused:
        in_specs += [pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
                     pl.BlockSpec((2 if has_bias else 1, bn),
                                  lambda i, j, k: (0, j))]
        operands += [ar, bc2]
    bn_out = bn // 2 if act_gu else bn
    n_out = N // 2 if act_gu else N
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn_out), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (M, n_out), out_dtype if fused else jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=a.size + b.size + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*operands)


def int8_lm_head_argmax_pallas(
    a: jax.Array,                # [M, K] int8 (per-token quantized acts)
    b: jax.Array,                # [K, V] int8 lm_head
    b_col: jax.Array,            # [V] f32 per-vocab-channel scales
    block_n: int = 1024,
) -> jax.Array:
    """Greedy decode's ``argmax(lm_head(x))`` fused into the int8 GEMM's
    epilogue -> token ids [M] int32, WITHOUT materializing the [M, V]
    f32 logits (the largest single HBM write+read of a greedy decode
    step: 2 x M*V*4 B = 32 MB at Llama-3-8B batch 32).

    The N grid runs sequentially with a running (best value, best index)
    pair in VMEM scratch; ties resolve to the lowest index like
    ``jnp.argmax``.  The per-token activation scale is positive and
    constant per row, so it cannot change the argmax and is skipped; the
    per-channel weight scale is applied per block.  Tail N-blocks mask
    pad columns with -inf via a global-column iota.

    Race target: BASELINE.md round-4 residual item 5 ("logits argmax +
    loop bookkeeping ~0.35 ms"); reference methodology
    benchmark/benchmark_cutlass_flash_attn_decode.py:272-277.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    V = b.shape[1]
    bm = _round_up(M, 8)
    if bm != M:
        a = jnp.pad(a, ((0, bm - M), (0, 0)))
    bn = min(block_n, _round_up(V, 128))
    nj = -(-V // bn)
    bc = b_col.astype(jnp.float32).reshape(1, V)

    def kernel(a_ref, b_ref, s_ref, o_ref, bv_ref, bi_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            bv_ref[:] = jnp.full_like(bv_ref, -jnp.inf)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        acc = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = acc.astype(jnp.float32) * s_ref[0:1]          # [bm, bn]
        col = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        x = jnp.where(col < V, x, -jnp.inf)
        m = jnp.max(x, axis=-1, keepdims=True)            # [bm, 1]
        idx = jnp.min(jnp.where(x == m, col, jnp.int32(2 ** 30)),
                      axis=-1, keepdims=True)
        better = m > bv_ref[...]
        bi_ref[...] = jnp.where(better, idx, bi_ref[...])
        bv_ref[...] = jnp.where(better, m, bv_ref[...])

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.broadcast_to(bi_ref[...], o_ref.shape)

    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j: (0, 0)),
            pl.BlockSpec((K, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 128), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bm, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, 1), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * V * K,
            bytes_accessed=a.size + b.size + bm * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(a, b, bc)
    return out[:M, 0]


def int4_matmul_pallas(
    a: jax.Array,                # [M, K] int8 (per-token quantized acts)
    b_packed: jax.Array,         # [K/2, N] int8, group-major split-K codes
    b_scale: jax.Array,          # [K/g, N] f32 per-group scales
    group_size: int,
    b_zp=8.0,                    # float const | [K/g, N] array (GPTQ zps)
    block_n: int = 1024,
    block_k: int = 1024,         # in K units; rounded to a group multiple
) -> jax.Array:
    """W4A8 on the MXU's native s8 path -> f32 (scales applied per group).

    The w8a8 lesson applies twice over: never upcast what the systolic
    array can consume directly.  The 4-bit codes stay UNSIGNED nibbles
    [0, 15] (they fit int8), feed the s8 x s8 MXU mode, and the quant
    offset folds out of the contraction per group:

        sum_k a_k (c_k - zp) = dot(a, c) - zp * rowsum_g(a)

    so the per-byte unpack chain is bitcast -> &0xF / >>4 -> concat ->
    int8 cast, with NO per-element subtract and NO int->float convert of
    the weight stream (the f32 work is the O(bm x bn) scaled accumulate,
    not O(bk x bn) dequant).  The generic bf16-dot w4a8 path measured
    1396 tok/s on 8B decode vs 1675 for w8a8 despite HALF the weight
    bytes — this kernel exists to close that gap.

    Reference role: csrc/xpu/onednn/int4_gemm_w4a8.h.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    N = b_packed.shape[1]
    g = group_size
    n_groups = K // g
    assert K % g == 0 and b_scale.shape == (n_groups, N)
    bm = _round_up(M, 8)
    bn = min(block_n, _round_up(N, 128))
    # groups per K step: packed block [S*g/2, bn] stays ~<=512 KB and S
    # must divide the group count (block index maps need uniform steps)
    s_cap = max(1, (512 * 1024) // max((g // 2) * bn, 1))
    S = min(max(block_k // g, 1), s_cap, n_groups)
    while n_groups % S:
        S -= 1
    zp_arr = isinstance(b_zp, jax.Array)
    spec = dict(S=S, g=g, zp_const=None if zp_arr else float(b_zp),
                zp_arr=zp_arr)

    def kernel(*refs):
        it = iter(refs)
        a_ref = next(it)
        b_ref = next(it)
        s_ref = next(it)
        z_ref = next(it) if spec["zp_arr"] else None
        o_ref = next(it)
        acc_ref = next(it)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        g_, S_ = spec["g"], spec["S"]
        for s in range(S_):
            a_g = a_ref[:, s * g_:(s + 1) * g_]
            # nibble extraction in PACKED int32 lanes — one and/shift
            # handles FOUR bytes (the i8->i32 bitcast regroups sublanes;
            # mask/shift ops are bytewise-uniform so the grouping is
            # irrelevant, and the i8 bitcast back restores positions).
            # ~4x fewer VPU ops than widen-per-byte: the old chain held
            # this kernel at 488 GB/s vs the 740 GB/s DMA floor.
            p32 = pltpu.bitcast(
                b_ref[s * (g_ // 2):(s + 1) * (g_ // 2), :], jnp.int32)
            lo = pltpu.bitcast(p32 & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((p32 >> 4) & 0x0F0F0F0F, jnp.int8)
            codes = jnp.concatenate([lo, hi], axis=0)
            part = jax.lax.dot_general(
                a_g, codes, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            rs = jnp.sum(a_g.astype(jnp.int32), axis=1, keepdims=True
                         ).astype(jnp.float32)
            if spec["zp_arr"]:
                part = part - rs * z_ref[s].astype(jnp.float32)
            else:
                part = part - rs * spec["zp_const"]
            acc_ref[:] += part * s_ref[s].astype(jnp.float32)   # [1, bn]

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    in_specs = [
        pl.BlockSpec((bm, S * g), lambda i, j, k: (i, k)),
        pl.BlockSpec((S * g // 2, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((S, 1, bn), lambda i, j, k: (k, 0, j)),
    ]
    operands = [a, b_packed, b_scale.reshape(n_groups, 1, N)]
    if zp_arr:
        in_specs.append(
            pl.BlockSpec((S, 1, bn), lambda i, j, k: (k, 0, j)))
        operands.append(b_zp.reshape(n_groups, 1, N).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn), n_groups // S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=a.size + b_packed.size + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*operands)


def quant_matmul_pallas(
    a: jax.Array,
    b: jax.Array,
    *,
    a_kind: str = "dense",
    b_kind: str = "dense",
    a_scale: Optional[jax.Array] = None,   # [M, K/g] group scales
    a_group_k: int = 0,
    b_scale: Optional[jax.Array] = None,   # [K/g, N] (N-dense)
    b_zp=None,                             # [K/g, N] array | float const
    b_group_k: int = 0,
    bias: Optional[jax.Array] = None,      # [N]
    out_dtype=jnp.bfloat16,
    mm_f32: bool = False,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    b_preperm: bool = False,   # B rows pre-permuted at load for the
    # planes decode (stored = w[argsort(e4m3_planes_block_perm(K, bk))],
    # so the in-kernel decode emits natural K order) — zero runtime
    # reorder; selects the planes path unconditionally
) -> jax.Array:
    """out[M, N] = dequant(a)[M, K] @ dequant(b)[K, N] (+ bias).

    ``a`` is [M, K] (packed kinds: [M, K/2]); ``b`` is [K, N] (packed kinds:
    [K/2, N] split-K layout).  Group scales must share one group size ``g``
    (the op layer expands the coarser one); the K grid then steps one group
    at a time.  Per-tensor / per-row / per-col scales are the caller's
    epilogue.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = a.shape[0]
    K = a.shape[1] * (2 if a_kind in ("int4sk", "fp4sk") else 1)
    N = b.shape[1]
    assert b.shape[0] * (2 if b_kind in ("int4sk", "fp4sk") else 1) == K, (
        a.shape, b.shape, a_kind, b_kind)

    # K-step selection.  Mosaic tiling wants bk % 128 == 0 (or bk == K).
    # - A group scales are applied post-dot => bk == a_group_k (>= 128;
    #   smaller activation groups are pre-dequantized by the op layer).
    # - B group scales: post-dot when the group is >= 128; groups < 128
    #   (MX recipes) use the in-kernel dequant mode with S = bk/g subgroups.
    if a_group_k:
        assert a_group_k % 128 == 0 or a_group_k == K, (
            "activation scale groups < 128 must be pre-dequantized by the "
            "op layer", a_group_k)
    b_sub = 1
    if a_group_k and b_group_k:
        if b_group_k >= 128:
            g = min(a_group_k, b_group_k)
            if a_group_k != g:
                a_scale = jnp.repeat(a_scale, a_group_k // g, axis=1)
            if b_group_k != g:
                b_scale = jnp.repeat(b_scale, b_group_k // g, axis=0)
                if isinstance(b_zp, jax.Array):
                    b_zp = jnp.repeat(b_zp, b_group_k // g, axis=0)
            bk = g
        else:
            bk = a_group_k
            assert bk % b_group_k == 0, (a_group_k, b_group_k)
            b_sub = bk // b_group_k
    elif a_group_k:
        bk = a_group_k
    elif b_group_k:
        # Use the in-kernel dequant mode with as large a K step as fits —
        # fewer grid steps amortize per-step overhead.  (Post-dot scaling
        # would force bk == group; dequant-in-VMEM rounds dequantized
        # values to bf16, which matches the reference's dequant-then-matmul
        # numerics and is exact for power-of-two scales.)
        step = b_group_k * 128 // math.gcd(b_group_k, 128)
        step = min(step, K)
        bk = max(step, min(block_k, K) // step * step)
        while K % bk != 0:
            bk -= step
        b_sub = bk // b_group_k
    else:
        base = 2 if (a_kind in ("int4sk", "fp4sk")
                     or b_kind in ("int4sk", "fp4sk")) else 1
        bk = max(base, min(block_k, K) // base * base)
        while K % bk != 0:
            bk -= base
    assert K % bk == 0 and bk >= 1, (K, bk)

    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, _round_up(N, 128))
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)

    apack = 2 if a_kind in ("int4sk", "fp4sk") else 1
    bpack = 2 if b_kind in ("int4sk", "fp4sk") else 1

    in_specs = [
        pl.BlockSpec((bm, bk // apack), lambda i, j, k: (i, k)),
        pl.BlockSpec((bk // bpack, bn), lambda i, j, k: (k, j)),
    ]
    # e4m3 halfword-pair upcast: ~2x the f32 bit-trick's lane density on
    # the weight stream; tile rows land in sigma order, folded into a
    # one-time activation column permutation (same pattern as the packed
    # int4 paths).  Constant within a K tile, so group scales are
    # unaffected.
    from vllm_xpu_kernels_tpu.envs import VXK_E4M3_PAIRS, VXK_E4M3_PLANES

    pair_ok = (b_kind == "fp8" and b.dtype == jnp.float8_e4m3fn
               and b_sub == 1 and not mm_f32 and a_kind == "dense"
               and b_zp is None and bk % 4 == 0)
    b_e4m3_planes = pair_ok and (VXK_E4M3_PLANES() or b_preperm)
    b_e4m3_pairs = pair_ok and not b_e4m3_planes and VXK_E4M3_PAIRS()
    if b_e4m3_planes and not b_preperm:
        a = jnp.take(a, jnp.asarray(e4m3_planes_block_perm(K, bk)), axis=1)
    elif b_e4m3_pairs:
        a = jnp.take(a, jnp.asarray(e4m3_block_perm(K, bk)), axis=1)
    operands = [a, b]
    spec = dict(
        a_kind=a_kind, b_kind=b_kind,
        a_scale_group=a_scale is not None,
        b_scale_group=b_scale is not None,
        b_zp_group=isinstance(b_zp, jax.Array),
        b_zp_const=float(b_zp) if isinstance(b_zp, (int, float)) else None,
        has_bias=bias is not None,
        mm_f32=mm_f32,
        b_sub=b_sub,
        b_e4m3_pairs=b_e4m3_pairs,
        b_e4m3_planes=b_e4m3_planes,
    )
    # group scales go in as 3-D arrays with a leading group axis stepped by
    # the K grid (block size 1) — Mosaic's last-two-dims tiling rules allow
    # (bm, 1)/(1, bn) only as the trailing dims of a 3-D block.
    if a_scale is not None:
        assert a_scale.shape == (M, K // bk), (a_scale.shape, M, K, bk)
        in_specs.append(
            pl.BlockSpec((1, bm, 1), lambda i, j, k: (k, i, 0)))
        operands.append(a_scale.T.reshape(K // bk, M, 1))
    if b_scale is not None:
        ng = K // bk * b_sub
        assert b_scale.shape == (ng, N), (b_scale.shape, K, bk, b_sub, N)
        in_specs.append(
            pl.BlockSpec((b_sub, 1, bn), lambda i, j, k: (k, 0, j)))
        operands.append(b_scale.reshape(ng, 1, N))
    if spec["b_zp_group"]:
        ng = K // bk * b_sub
        in_specs.append(
            pl.BlockSpec((b_sub, 1, bn), lambda i, j, k: (k, 0, j)))
        operands.append(b_zp.reshape(ng, 1, N))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, N))

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(a.size * a.dtype.itemsize
                            + b.size * b.dtype.itemsize
                            + M * N * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*operands)
    return out

"""Grouped (per-expert) matmul Pallas kernel for the fused MoE pipeline.

TPU-native replacement for the reference's persistent CUTLASS-SYCL grouped
GEMM (reference: csrc/xpu/grouped_gemm/xe_2/grouped_gemm_xe2_interface.hpp:71-350,
atomic tile scheduler moe_tile_scheduler.hpp).  A TPU core executes grids
sequentially, so instead of a work-stealing scheduler the tokens are
pre-sorted into the block-aligned expert-bucketed layout that
``moe_align_block_size`` defines, and each M-block's expert id rides in as
a scalar-prefetch array consumed by the B-operand ``index_map`` — the
pipeline then streams exactly one expert weight slab per block, double
buffered.

Recipes (mirroring grouped_gemm_xe2_interface.hpp:174-350):
- bf16/f16 dense weights
- fp8 (e4m3/e5m2) weights + per-expert scalar or per-channel [E, N]
  scales, or K-grouped [E, K/g, N] scales (mxfp8's e8m0 32-groups and
  block-fp8's f32 128-blocks, N-expanded host-side — reference recipes
  fused_moe_interface.py:33-60, ref_moe_utils.py:66-165)
- int4 split-K packed weights + per-expert K-group scales [E, K/g, N]
- mxfp4 (e2m1 split-K packed + power-of-two group scales)
- optional per-expert bias [E, N]
- w8a8: int8 weights x int8 activations on the native s8 MXU mode

Performance structure (v5e, decode-sized token counts — the regime is
weight-bandwidth bound, every routed expert's full weights stream per
step):

- Packed sub-byte weights unpack with the packed-int32-lane nibble trick
  and dequantize the lo/hi nibble planes SEPARATELY — two MXU dots per
  K-step against column-permuted activations — instead of re-interleaving
  the planes into K order in VMEM (the reshape+concat relayout chain was
  the dominant cost: GPT-OSS mxfp4 experts measured 75 GB/s with the
  interleave vs 8x that without).  The column permutation of the
  activations is one static gather per call, O(R*K) bytes.
- e2m1 decodes via integer bit assembly of the f32 pattern
  (sign<<31 | (126+e)<<23 | m<<22, subnormal half handled by a select)
  rather than exp2()-based arithmetic.
- Invalid M-blocks (expert id -1: EP non-local buckets and alignment
  tail) FREEZE every operand index map to the previous step's block, so
  the pipeline skips their DMAs entirely (same trick as the decode
  kernel's frozen tail KV pages); compute is skipped with pl.when.
- Per-row scales (``row_scales``: per-token activation quant scales
  and/or routing weights) fold into the final-K epilogue, so the caller
  never materializes an f32 [R, N] intermediate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_xpu_kernels_tpu.registry import interpret_mode
from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
    e2m1_decode_bits_f32,
    fp8_upcast_f32,
    packed_plane_to_bf16,
    unpack_nibbles_i8,
)


def _cdiv(a, b):
    return -(-a // b)


def _scale_f32(raw):
    """Scale block -> f32: UE8M0 exponent bytes (the MX spec's 1-byte
    storage — half the scale stream of bf16, a quarter of f32) decode
    with one shift+bitcast (f32 exponent field = the byte); float dtypes
    pass through."""
    from jax.experimental.pallas import tpu as pltpu

    if raw.dtype == jnp.uint8:
        return pltpu.bitcast(raw.astype(jnp.int32) << 23, jnp.float32)
    return raw.astype(jnp.float32)


def _gmm_kernel(spec, ebv_ref, ebf_ref, *refs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed = spec["quant"] in ("int4", "mxfp4")
    native = spec.get("native_e2m1", False)
    it = iter(refs)
    if packed and not native:
        a_lo_ref = next(it)
        a_hi_ref = next(it)
    else:
        a_ref = next(it)
    b_ref = next(it)
    s_ref = next(it) if spec["has_scale"] else None
    rsp_ref = next(it) if spec.get("has_row_scale_pre") else None
    rs_ref = next(it) if spec["has_row_scale"] else None
    bias_ref = next(it) if spec["has_bias"] else None
    o_ref = next(it)
    acc_ref = next(it)

    i = pl.program_id(0)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = ebv_ref[i] >= 0

    @pl.when(valid)
    def _():
        if spec["quant"] == "w8a8":
            # native s8xs8 MXU contraction, exact s32 accumulation —
            # per-expert channel scales and per-token activation scales
            # apply in the final K step (they factor out of the sum)
            acc_ref[:] += jax.lax.dot_general(
                a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return
        s2d = spec.get("s2d", False)
        if packed and native:
            # mxfp4 via the NATIVE e2m1 upcast: one bitcast+astype
            # converts BOTH nibble planes (row-interleaved order — folded
            # into the host-side activation column permutation), one fat
            # [bm, bk] dot instead of two half-plane dots.  Interleaved
            # row j's scale group is j // g (both nibbles of a packed
            # byte row share a group), so the pow2 scales broadcast over
            # contiguous g-row spans — 16-row-tile aligned for g % 16
            # == 0, no relayout.  Measured faster than the halfword
            # bit-assembly on v5e (the e2m1 field build was the grouped
            # mxfp4 bound at ~200 GB/s).
            S = spec["b_sub"]
            gg = spec["g"]
            raw = b_ref[0]                       # [pb, bn] packed bytes
            bn = raw.shape[-1]
            vals = pltpu.bitcast(
                raw, jnp.float4_e2m1fn).astype(jnp.bfloat16)  # [2pb, bn]
            sv = _scale_f32(s_ref[0][:, None, :] if s2d
                            else s_ref[...]).astype(jnp.bfloat16)
            x = (vals.reshape(S, gg, bn) * sv).reshape(2 * raw.shape[0],
                                                       bn)
            a = a_ref[...]
            if a.dtype == jnp.float16:
                a = a.astype(jnp.float32)
            acc_ref[:] += jnp.dot(a.astype(jnp.bfloat16), x,
                                  preferred_element_type=jnp.float32)
            return
        if packed:
            S = spec["b_sub"]
            raw = b_ref[0]                       # [pb, bn] packed bytes
            bn = raw.shape[-1]
            s = _scale_f32(s_ref[0][:, None, :] if s2d
                           else s_ref[...])             # [S, 1, bn]

            def amx(r):
                x = r[...]
                if x.dtype == jnp.float16:
                    x = x.astype(jnp.float32)  # Mosaic has no f16->bf16
                return x.astype(jnp.bfloat16)

            if spec["fast_packed"]:
                # bf16 values assembled directly in packed i32 lanes
                # (sigma row order — folded into the host-side activation
                # column permutation and the scale reshape below)
                gg = spec["g"]
                pb = raw.shape[0]
                if spec["quant"] == "mxfp4":
                    # e8m0 (pow2) scales multiply in the bf16 domain —
                    # exact (pow2 x e2m1 never rounds), no f32 pass.
                    # bf16 tiles are (16, 128), so a per-(g/4 = 8)-row
                    # broadcast would relayout every weight tile; instead
                    # PAIRS of scale groups expand once into a 16-row-
                    # aligned half-plane, shared by both nibble planes.
                    sv = jnp.broadcast_to(
                        s.astype(jnp.bfloat16).reshape(S // 2, 2, 1, bn),
                        (S // 2, 2, gg // 4, bn)).reshape(
                            S // 2, gg // 2, bn)

                    def deq(plane):
                        v = packed_plane_to_bf16(raw, plane, "mxfp4")
                        x = v.reshape(2, S // 2, gg // 2, bn) * sv
                        return x.reshape(pb, bn)
                else:
                    def deq(plane):
                        v = packed_plane_to_bf16(raw, plane, "int4")
                        x = v.astype(jnp.float32).reshape(2, S, gg // 4,
                                                          bn)
                        return (x * s[None]).reshape(raw.shape).astype(
                            jnp.bfloat16)

                acc_ref[:] += (
                    jnp.dot(amx(a_lo_ref), deq(0),
                            preferred_element_type=jnp.float32)
                    + jnp.dot(amx(a_hi_ref), deq(4),
                              preferred_element_type=jnp.float32))
                return

            lo8, hi8 = unpack_nibbles_i8(raw)

            def deq(c8):
                if spec["quant"] == "mxfp4":
                    x = e2m1_decode_bits_f32(c8.astype(jnp.int32))
                else:
                    # unsigned codes [0,15] - 8 (i8->f32 is the fast
                    # native cast; the -8 rides the f32 lane)
                    x = c8.astype(jnp.float32) - 8.0
                x = (x.reshape(S, -1, bn) * s).reshape(raw.shape)
                return x.astype(jnp.bfloat16)

            acc_ref[:] += (
                jnp.dot(amx(a_lo_ref), deq(lo8),
                        preferred_element_type=jnp.float32)
                + jnp.dot(amx(a_hi_ref), deq(hi8),
                          preferred_element_type=jnp.float32))
            return
        a = a_ref[...]
        if a.dtype == jnp.float16:
            a = a.astype(jnp.float32)   # Mosaic has no f16->bf16 cast
        a = a.astype(jnp.bfloat16)                   # [bm, bk]
        raw = b_ref[0]                               # [bk, bn]
        if spec["quant"] in ("fp8", "fp8_channel"):
            bf = fp8_upcast_f32(raw)
            if spec.get("fp8_group"):
                # K-grouped scales (mxfp8 e8m0 / block-fp8 f32) dequant
                # in-loop: [b_sub, 1|, bn] broadcast over g-row spans
                bn = raw.shape[-1]
                sv = (s_ref[0][:, None, :] if spec.get("s2d")
                      else s_ref[...])
                bf = (bf.reshape(spec["b_sub"], spec["g"], bn)
                      * _scale_f32(sv)).reshape(raw.shape)
            b = bf.astype(jnp.bfloat16)
        else:
            b = raw.astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if spec["quant"] == "w8a8":
            out = out.astype(jnp.float32)
        if (spec["quant"] in ("fp8", "fp8_channel", "w8a8")
                and s_ref is not None and not spec.get("fp8_group")):
            out = out * s_ref[0].astype(jnp.float32)   # [1, bn] per-channel
        if rsp_ref is not None:
            # pre-bias row scale (w8a8 GEMM2 with bias: the act-quant
            # dequant factor applies BEFORE the bias, the routing weight
            # after — (acc*chan*a_s + bias) * w)
            out = out * rsp_ref[0].astype(jnp.float32)     # [bm, 1]
        if spec["bias_first"]:
            # second-GEMM order: (x@W + bias) * routing_weight
            if bias_ref is not None:
                out = out + bias_ref[0].astype(jnp.float32)
            if rs_ref is not None:
                out = out * rs_ref[0].astype(jnp.float32)  # [bm, 1]
        else:
            if rs_ref is not None:
                out = out * rs_ref[0].astype(jnp.float32)  # [bm, 1]
            if bias_ref is not None:
                out = out + bias_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _splitk_perm(k_dim: int, group_size: int):
    """Column permutation matching the per-group split-K nibble planes:
    lo plane packed row p <- original column (p//(g/2))*g + p%(g/2);
    hi plane adds g/2.  Returns (perm_lo, perm_hi) numpy index arrays."""
    h = group_size // 2
    p = np.arange(k_dim // 2)
    lo = (p // h) * group_size + p % h
    return lo, lo + h


@functools.lru_cache(maxsize=64)
def _interleave_perm(k_dim: int, group_size: int):
    """Original K index for each native-e2m1-interleaved row j: the
    bitcast emits (lo, hi) nibbles of packed byte row r as rows 2r and
    2r+1 (verified on v5e), and split-K packing put orig rows
    (G*g + w | G*g + g/2 + w) in byte row G*(g/2) + w."""
    j = np.arange(k_dim)
    r = j // 2
    h = group_size // 2
    return (r // h) * group_size + r % h + (j % 2) * h


@functools.lru_cache(maxsize=64)
def _splitk_perm_sigma(k_dim: int, group_size: int, pb: int):
    """_splitk_perm composed with the block-local sigma row order that
    :func:`packed_plane_to_bf16` emits (bf16 pairs assembled from i32
    lanes land as [bytes 0,1 of every word | bytes 2,3])."""
    p = np.arange(k_dim // 2)
    blk, j = p // pb, p % pb
    half, jj = j // (pb // 2), j % (pb // 2)
    r = blk * pb + 4 * (jj // 2) + 2 * half + (jj % 2)
    h = group_size // 2
    lo = (r // h) * group_size + r % h
    return lo, lo + h


def _pick_bn(n: int, cap: int) -> int:
    """Largest lane-block <= cap: prefer multiples of 128 that divide n
    (zero padded-fetch waste), else n itself, else min-waste multiple."""
    if n <= cap:
        return n
    best, best_waste = 128, None
    c = cap - cap % 128
    while c >= 128:
        waste = _cdiv(n, c) * c - n
        if best_waste is None or waste < best_waste:
            best, best_waste = c, waste
            if waste == 0:
                break
        c -= 128
    return best


def _pick_bk(k_dim: int, bn: int, eff_bytes: float, step: int,
             cap_bytes: float = 4 * 1024 * 1024) -> int:
    """Fattest K-block with B-block bytes <= cap (double-buffered by the
    pipeline), a multiple of ``step``, dividing K; falls back to whole K
    ("block dims equal the array dims" satisfies Mosaic for any size)."""
    limit = max(step, int(cap_bytes / (bn * eff_bytes)) // step * step)
    bk = min(limit, k_dim // step * step)
    while bk > 0 and k_dim % bk != 0:
        bk -= step
    return bk if bk > 0 else k_dim


def grouped_matmul_pallas(
    a: jax.Array,               # [R, K] block-aligned expert-sorted rows
    b: jax.Array,               # [E, K, N] | packed [E, K/2, N]
    expert_blocks: jax.Array,   # [R/bm] int32 expert per M-block (-1 skip)
    *,
    scales: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    row_scales: Optional[jax.Array] = None,   # [R] f32 epilogue fold
    row_scales_pre: Optional[jax.Array] = None,  # [R] f32, before bias
    bias_first: bool = False,  # (x@W + bias) * row_scales epilogue order
    quant: str = "none",   # none | fp8 | fp8_channel | w8a8 | int4 | mxfp4
    group_size: int = 0,
    block_m: int = 128,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out[r] = row_scales[r] * (a[r] @ dequant(b[expert_of_block(r)]))
    (+ bias).

    Block sizes auto-tune for the weight-bandwidth-bound MoE regime on
    v5e: fewer, fatter grid steps (a ~4 MiB weight block per step), lane
    blocks that divide N exactly when possible."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, k_dim = a.shape
    e = b.shape[0]
    n = b.shape[2]
    packed = quant in ("int4", "mxfp4")
    # K-grouped fp8 scales (mxfp8 / block-fp8 recipes): [E, K/g, N]
    fp8_group = (quant == "fp8" and group_size > 0 and scales is not None
                 and not packed)
    K = b.shape[1] * (2 if packed else 1)
    assert k_dim == K, (a.shape, b.shape, quant)
    assert r % block_m == 0, (r, block_m)
    bm = block_m
    bn = _pick_bn(n, block_n or (2048 if packed else 1024))
    if packed:
        g = group_size
        # pb = bk/2 is the activation-plane block's lane dim: multiple of
        # 128 (Mosaic minor-dim tiling) => bk multiple of lcm(2g, 256).
        # Scoped-VMEM budget: the in-kernel dequant chain holds ~6-7x the
        # packed block bytes (i32 assembly temps + two bf16 planes + the
        # double-buffered operand); int4 adds an f32 [pb, bn] temp.
        step = 2 * g * 256 // _gcd(2 * g, 256)
        cap = int((1.8 if quant == "mxfp4" else 1.0) * 1024 * 1024)
        bk = _pick_bk(K, bn, 0.5, min(step, K), cap_bytes=cap)
        if bk % step != 0 and bk != K:
            bk = K
        while (bk // 2) * bn > cap and bn > 256:
            # whole-K fallback (no 128-aligned divisor of K): shrink the
            # lane block instead to stay under the 16 MB scoped limit
            bn = _pick_bn(n, bn - 128)
        b_sub = bk // g
    else:
        # K-grouped fp8 scales: the K-block must cover whole scale groups
        g = group_size
        step = (g * 128 // _gcd(g, 128)) if fp8_group else 128
        bk = _pick_bk(K, bn, jnp.dtype(b.dtype).itemsize, min(step, K))
        if fp8_group and bk % g != 0:
            bk = K
        b_sub = bk // g if fp8_group else 1
    nj = _cdiv(n, bn)
    nk = K // bk
    grid = (r // bm, nj, nk)
    nb = grid[0]

    # packed fast path: bf16 assembly in i32 lanes needs 4-row byte words
    # and scale groups that tile the sigma reshape cleanly
    fast_packed = (packed and bk // 2 % 4 == 0 and group_size % 32 == 0
                   and (bk // 2) % (group_size // 2) == 0
                   and b_sub % 2 == 0)
    # mxfp4: the chip's native e2m1 upcast (bitcast + astype) beats the
    # halfword bit-assembly — one conversion covers both nibble planes
    # and feeds ONE fat dot
    from vllm_xpu_kernels_tpu.envs import VXK_MXFP4_NATIVE

    native_e2m1 = (quant == "mxfp4" and VXK_MXFP4_NATIVE()
                   and group_size % 16 == 0 and bk % group_size == 0)
    spec = dict(
        quant=quant, b_sub=b_sub, g=group_size,
        fast_packed=fast_packed, native_e2m1=native_e2m1,
        fp8_group=fp8_group,
        has_scale=scales is not None,
        has_row_scale_pre=row_scales_pre is not None,
        has_row_scale=row_scales is not None,
        has_bias=bias is not None,
        bias_first=bias_first,
        s2d=(scales is not None and (packed or fp8_group)
             and (b_sub == K // group_size or b_sub % 8 == 0)),
    )

    # Invalid blocks (expert -1) freeze every index map to the LAST VALID
    # block's final step, so consecutive equal indices skip the DMA for
    # the whole invalid tail; compute is skipped in-kernel via pl.when.
    eb = expert_blocks.astype(jnp.int32)
    mask = eb >= 0
    lv = jnp.max(jnp.where(mask, jnp.arange(nb, dtype=jnp.int32), -1))
    e_last = jnp.where(lv >= 0, eb[jnp.maximum(lv, 0)], 0)
    ebf = jnp.where(mask, eb, e_last)

    def frz(ebv, i, x, last):
        return jnp.where(ebv[i] >= 0, x, last)

    def b_map(i, j, k, ebv, ebf):
        return (ebf[i], frz(ebv, i, k, nk - 1), frz(ebv, i, j, nj - 1))

    in_specs = []
    operands = []
    if packed and native_e2m1:
        pb = bk // 2
        a_n = jnp.take(a, jnp.asarray(_interleave_perm(K, group_size)),
                       axis=1)

        def a_map(i, j, k, ebv, ebf):
            return (i, frz(ebv, i, k, nk - 1))

        in_specs.append(pl.BlockSpec((bm, bk), a_map))
        operands.append(a_n)
        in_specs.append(pl.BlockSpec((1, pb, bn), b_map))
        operands.append(b)
    elif packed:
        pb = bk // 2
        if fast_packed:
            lo_idx, hi_idx = _splitk_perm_sigma(K, group_size, pb)
        else:
            lo_idx, hi_idx = _splitk_perm(K, group_size)
        a_lo = jnp.take(a, jnp.asarray(lo_idx), axis=1)
        a_hi = jnp.take(a, jnp.asarray(hi_idx), axis=1)

        def a_map(i, j, k, ebv, ebf):
            return (i, frz(ebv, i, k, nk - 1))

        in_specs += [pl.BlockSpec((bm, pb), a_map),
                     pl.BlockSpec((bm, pb), a_map)]
        operands += [a_lo, a_hi]
        in_specs.append(pl.BlockSpec((1, pb, bn), b_map))
        operands.append(b)
    else:
        def a_map(i, j, k, ebv, ebf):
            return (i, frz(ebv, i, k, nk - 1))

        in_specs.append(pl.BlockSpec((bm, bk), a_map))
        operands.append(a)
        in_specs.append(pl.BlockSpec((1, bk, bn), b_map))
        operands.append(b)
    if scales is not None:
        if packed or fp8_group:
            ng = K // group_size
            assert scales.shape == (e, ng, n), (scales.shape, e, ng, n)
            if b_sub == ng or b_sub % 8 == 0:
                # Consume the [E, ng, N] scale stack AS STORED with a
                # (1, b_sub, bn) block (legal when b_sub spans the whole
                # group axis or is sublane-aligned).  The old
                # reshape(e*ng, 1, n) form padded the middle dim-1 to 8
                # sublanes — a PHYSICAL 8x relayout copy of the whole
                # scale array per call (~150 us on gpt-oss-20b experts).
                def s_map3(i, j, k, ebv, ebf):
                    return (ebf[i], frz(ebv, i, k, nk - 1),
                            frz(ebv, i, j, nj - 1))

                in_specs.append(pl.BlockSpec((1, b_sub, bn), s_map3))
                operands.append(scales)
            else:
                s3 = scales.reshape(e * ng, 1, n)

                def s_map(i, j, k, ebv, ebf):
                    return (ebf[i] * (ng // b_sub)
                            + frz(ebv, i, k, nk - 1),
                            0, frz(ebv, i, j, nj - 1))

                in_specs.append(pl.BlockSpec((b_sub, 1, bn), s_map))
                operands.append(s3)
        else:
            # fp8/w8a8: per-expert scalar or per-channel -> [E, 1, N]
            s = scales.astype(jnp.float32)
            if s.ndim == 1:
                s = jnp.broadcast_to(s[:, None], (e, n))
            s3 = s.reshape(e, 1, n)

            def s_map(i, j, k, ebv, ebf):
                return (ebf[i], 0, frz(ebv, i, j, nj - 1))

            in_specs.append(pl.BlockSpec((1, 1, bn), s_map))
            operands.append(s3)
    def rs_map(i, j, k, ebv, ebf):
        return (i, 0, 0)

    if row_scales_pre is not None:
        in_specs.append(pl.BlockSpec((1, bm, 1), rs_map))
        operands.append(row_scales_pre.astype(jnp.float32
                                              ).reshape(nb, bm, 1))
    if row_scales is not None:
        # (bm, 1)/(1, bn) 2-D blocks are rejected by Mosaic tiling; ride
        # as 3-D with a leading grid-mapped axis (see quant_matmul).
        in_specs.append(pl.BlockSpec((1, bm, 1), rs_map))
        operands.append(row_scales.astype(jnp.float32).reshape(nb, bm, 1))
    if bias is not None:
        def bias_map(i, j, k, ebv, ebf):
            return (ebf[i], 0, frz(ebv, i, j, nj - 1))

        in_specs.append(pl.BlockSpec((1, 1, bn), bias_map))
        operands.append(bias.reshape(e, 1, n))

    out = pl.pallas_call(
        functools.partial(_gmm_kernel, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, ebv, ebf:
                                   (i, j)),
            scratch_shapes=[pltpu.VMEM(
                (bm, bn),
                jnp.int32 if quant == "w8a8" else jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(eb, ebf, *operands)
    return out


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a

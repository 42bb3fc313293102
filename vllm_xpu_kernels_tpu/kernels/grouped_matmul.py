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
- fp8 (e4m3/e5m2) weights + per-expert scalar or per-channel [E, N] scales
- int4 split-K packed weights + per-expert K-group scales [E, K/g, N]
- mxfp4 (e2m1 split-K packed + power-of-two group scales)
- optional per-expert bias [E, N]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import interpret_mode
from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
    e2m1_decode_f32,
    fp8_upcast_f32,
)


def _cdiv(a, b):
    return -(-a // b)


def _gmm_kernel(spec, expert_blk_ref, *refs):
    import jax.experimental.pallas as pl

    it = iter(refs)
    a_ref = next(it)
    b_ref = next(it)
    s_ref = next(it) if spec["has_scale"] else None
    bias_ref = next(it) if spec["has_bias"] else None
    o_ref = next(it)
    acc_ref = next(it)

    i = pl.program_id(0)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = expert_blk_ref[i] >= 0

    @pl.when(valid)
    def _():
        if spec["quant"] == "w8a8":
            # native s8xs8 MXU contraction, exact s32 accumulation —
            # per-expert channel scales applied in the final K step,
            # per-token activation scales by the caller (they factor out)
            acc_ref[:] += jax.lax.dot_general(
                a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return
        a = a_ref[...]
        if a.dtype == jnp.float16:
            a = a.astype(jnp.float32)   # Mosaic has no f16->bf16 cast
        a = a.astype(jnp.bfloat16)                   # [bm, bk]
        raw = b_ref[0]                               # [bk(/2), bn]
        if spec["quant"] in ("int4", "mxfp4"):
            S = spec["b_sub"]
            bn = raw.shape[-1]
            g = raw.shape[0] * 2 // S
            from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
                unpack_nibbles_i8)
            lo, hi = unpack_nibbles_i8(raw)
            codes = jnp.concatenate(
                [lo.reshape(S, g // 2, bn), hi.reshape(S, g // 2, bn)],
                axis=1).astype(jnp.int32)
            if spec["quant"] == "mxfp4":
                x = e2m1_decode_f32(codes)
            else:
                x = codes.astype(jnp.float32) - 8.0
            x = x * s_ref[...].astype(jnp.float32)   # [S, 1, bn] broadcast
            b = x.reshape(S * g, bn).astype(jnp.bfloat16)
        elif spec["quant"] in ("fp8", "fp8_channel"):
            b = fp8_upcast_f32(raw).astype(jnp.bfloat16)
        else:
            b = raw.astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if spec["quant"] == "w8a8":
            out = out.astype(jnp.float32)
        if (spec["quant"] in ("fp8", "fp8_channel", "w8a8")
                and s_ref is not None):
            out = out * s_ref[0].astype(jnp.float32)   # [1, bn] per-channel
        if bias_ref is not None:
            out = out + bias_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def grouped_matmul_pallas(
    a: jax.Array,               # [R, K] block-aligned expert-sorted rows
    b: jax.Array,               # [E, K, N] | packed [E, K/2, N]
    expert_blocks: jax.Array,   # [R/bm] int32 expert per M-block (-1 skip)
    *,
    scales: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    quant: str = "none",   # none | fp8 | fp8_channel | w8a8 | int4 | mxfp4
    group_size: int = 0,
    block_m: int = 128,
    block_n: int = 1024,
    block_k: int = 2048,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out[r] = a[r] @ dequant(b[expert_of_block(r)]) (+ bias).

    Default block sizes are tuned for the weight-bandwidth-bound MoE
    regime on v5e: fewer, fatter grid steps (bn=1024, bk=2048 measured
    498 GB/s expert-weight stream vs 293 at 512/512 — mixtral-8x7b
    shapes, 10 M-blocks)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, k_dim = a.shape
    e = b.shape[0]
    n = b.shape[2]
    packed = quant in ("int4", "mxfp4")
    K = b.shape[1] * (2 if packed else 1)
    assert k_dim == K, (a.shape, b.shape, quant)
    assert r % block_m == 0, (r, block_m)
    bm = block_m
    bn = min(block_n, _round_up(n, 128))
    if (packed or quant == "none" or quant.startswith("fp8")
            or quant == "w8a8"):
        if packed:
            g = group_size
            step = g * 128 // _gcd(g, 128)
            step = min(step, K)
            bk = max(step, min(block_k, K) // step * step)
            while bk > 0 and K % bk != 0:
                bk -= step
            if bk <= 0:
                # no 128-aligned divisor (e.g. GPT-OSS K=2880): take the
                # whole K in one step — "block dims equal the array dims"
                # satisfies Mosaic tiling for any size
                bk = K
            b_sub = bk // g
        else:
            base = 1
            bk = max(base, min(block_k, K) // base * base)
            while K % bk != 0:
                bk -= base
            b_sub = 1
    grid = (r // bm, _cdiv(n, bn), K // bk)

    spec = dict(
        quant=quant, b_sub=b_sub,
        has_scale=scales is not None,
        has_bias=bias is not None,
    )

    def a_map(i, j, k, eb):
        return (i, k)

    def b_map(i, j, k, eb):
        return (jnp.maximum(eb[i], 0), k, j)

    in_specs = [
        pl.BlockSpec((bm, bk), a_map),
        pl.BlockSpec((1, bk // (2 if packed else 1), bn), b_map),
    ]
    operands = [a, b]
    if scales is not None:
        if packed:
            ng = K // group_size
            assert scales.shape == (e, ng, n), (scales.shape, e, ng, n)
            s3 = scales.reshape(e * ng, 1, n)

            def s_map(i, j, k, eb):
                return (jnp.maximum(eb[i], 0) * (ng // b_sub) + k, 0, j)

            in_specs.append(pl.BlockSpec((b_sub, 1, bn), s_map))
            operands.append(s3)
        else:
            # fp8/w8a8: per-expert scalar or per-channel -> [E, 1, N]
            s = scales.astype(jnp.float32)
            if s.ndim == 1:
                s = jnp.broadcast_to(s[:, None], (e, n))
            s3 = s.reshape(e, 1, n)

            def s_map(i, j, k, eb):
                return (jnp.maximum(eb[i], 0), 0, j)

            in_specs.append(pl.BlockSpec((1, 1, bn), s_map))
            operands.append(s3)
    if bias is not None:
        def bias_map(i, j, k, eb):
            return (jnp.maximum(eb[i], 0), 0, j)

        in_specs.append(pl.BlockSpec((1, 1, bn), bias_map))
        operands.append(bias.reshape(e, 1, n))

    out = pl.pallas_call(
        functools.partial(_gmm_kernel, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, eb: (i, j)),
            scratch_shapes=[pltpu.VMEM(
                (bm, bn),
                jnp.int32 if quant == "w8a8" else jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(expert_blocks.astype(jnp.int32), *operands)
    return out


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a

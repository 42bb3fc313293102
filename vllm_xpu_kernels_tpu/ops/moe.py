"""MoE stack: routing, alignment/permutation, grouped GEMM, fused pipeline.

Reference surface being reproduced (SURVEY.md §2.8-2.10):

- routing: ``topk_softmax`` / ``topk_sigmoid`` (csrc/moe/topk.cpp:29-878),
  ``grouped_topk`` (csrc/moe/grouped_topk.cpp, DeepSeek node-limited
  routing) — goldens per tests/ops/topk_op.py and grouped_topk_op.py.
- layout: ``moe_align_block_size`` (csrc/moe/moe_align_sum_kernels.cpp:31-957),
  ``remap_hidden_states`` (csrc/moe/remap_hidden_states.cpp),
  ``moe_gather`` (csrc/moe/moe_gather.cpp), ``moe_sum``,
  ``init_expert_map`` (csrc/moe/init_expert_map.cpp:9-78),
  ``fused_moe_prologue`` (csrc/moe/fused_moe_prologue.hpp:155-559).
- compute: ``grouped_gemm`` (csrc/xpu/grouped_gemm/…, persistent
  atomic-tile-scheduler kernel) and the fused pipeline ``tpu_fused_moe``
  (reference: XpuFusedMoe._apply_kernel, fused_moe_interface.py:308-393).

TPU-first translation:

- routing ops are tiny reductions — pure jnp; XLA's fused top_k is the
  performance ceiling (ties break toward lower index, matching the
  reference's stable sort).
- the reference's persistent grouped-GEMM kernel claims tiles via global
  atomics — impossible and unnecessary on a TPU core that executes grids
  sequentially.  Instead the fused pipeline gathers tokens into the
  block-aligned expert-sorted layout that ``moe_align_block_size`` already
  defines, and a Pallas kernel (kernels/grouped_matmul.py) maps each
  M-block to its expert's weight slab via a scalar-prefetched
  ``expert_ids`` index_map.
- the standalone ``grouped_gemm`` op (exact rows_per_expert layout, no
  padding) keeps reference-parity semantics with an XLA segment-masked
  implementation; the fused pipeline is the performance path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op, use_pallas, mosaic_safe
from vllm_xpu_kernels_tpu import ops as _ops


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# routing
# ---------------------------------------------------------------------------


def _topk_route(scores, topk, renormalize, bias):
    """scores [T, E] f32 -> (weights f32 [T,k], ids int32 [T,k]).  Selection
    uses biased scores, weights use unbiased scores (reference:
    tests/ops/topk_op.py:25-35)."""
    if bias is not None:
        sel = scores + bias.astype(jnp.float32)[None, :]
        _, ids = jax.lax.top_k(sel, topk)
        w = jnp.take_along_axis(scores, ids, axis=-1)
    else:
        w, ids = jax.lax.top_k(scores, topk)
    if renormalize:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w.astype(jnp.float32), ids.astype(jnp.int32)


@register_op("topk_softmax", "moe")
def topk_softmax(
    gating_output: jax.Array,
    topk: int,
    renormalize: bool = False,
    bias: Optional[jax.Array] = None,
):
    """Fused softmax gating + top-k (csrc/moe/topk.cpp ``MoeSoftmax`` +
    ``MoeTopK``; schema csrc/moe/torch_bindings.cpp)."""
    scores = jax.nn.softmax(gating_output.astype(jnp.float32), axis=-1)
    return _topk_route(scores, topk, renormalize, bias)


@register_op("topk_sigmoid", "moe")
def topk_sigmoid(
    gating_output: jax.Array,
    topk: int,
    renormalize: bool = False,
    bias: Optional[jax.Array] = None,
):
    """Sigmoid gating + top-k (csrc/moe/topk.cpp ``MoeSigmoid``)."""
    scores = jax.nn.sigmoid(gating_output.astype(jnp.float32))
    return _topk_route(scores, topk, renormalize, bias)


@register_op("grouped_topk", "moe")
def grouped_topk(
    gating_output: jax.Array,          # [T, E]
    topk: int,
    renormalize: bool,
    num_expert_group: int,
    topk_group: int,
    scoring_func: str = "softmax",
    routed_scaling_factor: float = 1.0,
    e_score_correction_bias: Optional[jax.Array] = None,
):
    """DeepSeek node-limited two-level routing
    (csrc/moe/grouped_topk.cpp:217-390; golden
    tests/ops/grouped_topk_op.py:11-67)."""
    t, e = gating_output.shape
    g = num_expert_group
    if scoring_func == "softmax":
        scores = jax.nn.softmax(gating_output.astype(jnp.float32), axis=-1)
    elif scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(gating_output.astype(jnp.float32))
    else:
        raise ValueError(f"Unsupported scoring function: {scoring_func}")
    original = scores
    if e_score_correction_bias is not None:
        scores = scores + e_score_correction_bias.astype(jnp.float32)[None, :]
        grp = scores.reshape(t, g, e // g)
        group_scores = jnp.sum(jax.lax.top_k(grp, 2)[0], axis=-1)
    else:
        group_scores = jnp.max(scores.reshape(t, g, e // g), axis=-1)
    _, group_idx = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.zeros((t, g), jnp.bool_).at[
        jnp.arange(t)[:, None], group_idx].set(True)
    score_mask = jnp.repeat(group_mask, e // g, axis=-1)
    masked = jnp.where(score_mask, scores, -jnp.inf)
    if e_score_correction_bias is not None:
        _, ids = jax.lax.top_k(masked, topk)
        w = jnp.take_along_axis(original, ids, axis=-1)
    else:
        w, ids = jax.lax.top_k(masked, topk)
    if renormalize:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = w * routed_scaling_factor
    return w.astype(jnp.float32), ids.astype(jnp.int32)


# ---------------------------------------------------------------------------
# layout / permutation
# ---------------------------------------------------------------------------


@register_op("moe_align_block_size", "moe")
def moe_align_block_size(
    topk_ids: jax.Array,        # [T, K] int32
    num_experts: int,
    block_size: int,
    expert_map: Optional[jax.Array] = None,
    pad_sorted_ids: bool = False,
):
    """Sort token(+topk) slots into block-aligned per-expert buckets
    (csrc/moe/moe_align_sum_kernels.cpp:31-957; golden
    tests/ops/moe_align_block_size_ops.py docstring example).

    Returns (sorted_token_ids [max_pad], expert_ids [max_blocks],
    num_tokens_post_pad [1]).  Padding slots hold ``topk_ids.size``.
    With ``expert_map`` (EP), expert_ids are remapped to local indices
    (-1 for non-local blocks).
    """
    numel = topk_ids.size
    max_pad = numel + num_experts * (block_size - 1)
    if pad_sorted_ids:
        max_pad = _cdiv(max_pad, block_size) * block_size
    if numel < num_experts:
        max_pad = min(numel * block_size, max_pad)
    max_blocks = _cdiv(max_pad, block_size)

    e_flat = topk_ids.reshape(-1).astype(jnp.int32)
    cnt = jnp.bincount(e_flat, length=num_experts)
    padded_cnt = _cdiv_j(cnt, block_size) * block_size
    starts_pad = jnp.concatenate(
        [jnp.zeros(1, cnt.dtype), jnp.cumsum(padded_cnt)[:-1]])
    starts_raw = jnp.concatenate(
        [jnp.zeros(1, cnt.dtype), jnp.cumsum(cnt)[:-1]])
    order = jnp.argsort(e_flat, stable=True).astype(jnp.int32)
    e_sorted = e_flat[order]
    rank = jnp.arange(numel, dtype=jnp.int32) - starts_raw[e_sorted]
    pos = (starts_pad[e_sorted] + rank).astype(jnp.int32)
    sorted_ids = jnp.full((max_pad,), numel, jnp.int32).at[pos].set(
        order, mode="drop")
    total = jnp.sum(padded_cnt).astype(jnp.int32)
    block_starts = jnp.arange(max_blocks, dtype=jnp.int32) * block_size
    ends = jnp.cumsum(padded_cnt)
    expert_ids = jnp.searchsorted(ends, block_starts, side="right"
                                  ).astype(jnp.int32)
    expert_ids = jnp.where(block_starts < total,
                           jnp.clip(expert_ids, 0, num_experts - 1), 0)
    if expert_map is not None:
        expert_ids = expert_map[expert_ids]
    return sorted_ids, expert_ids, total.reshape(1)


def _cdiv_j(a, b):
    return -(-a // b)


@register_op("batched_moe_align_block_size", "moe")
def batched_moe_align_block_size(
    max_tokens_per_batch: int,
    block_size: int,
    expert_num_tokens: jax.Array,   # [E]
):
    """Block alignment for the batched-expert format: expert ``e`` owns the
    contiguous slot range ``[e*max_tokens_per_batch, ...)`` with
    ``expert_num_tokens[e]`` valid entries
    (csrc/moe/torch_bindings.cpp:22-31, moe_align_sum_kernels.cpp batched
    variant).  Returns (sorted_token_ids, expert_ids, num_tokens_post_pad);
    padding slots hold ``E * max_tokens_per_batch``."""
    e = expert_num_tokens.shape[0]
    mtb = max_tokens_per_batch
    numel = e * mtb
    max_pad = numel + e * (block_size - 1)
    max_blocks = _cdiv(max_pad, block_size)
    cnt = jnp.clip(expert_num_tokens.astype(jnp.int32), 0, mtb)
    padded = _cdiv_j(cnt, block_size) * block_size
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    slot = jax.lax.broadcasted_iota(jnp.int32, (e, mtb), 1)
    valid = slot < cnt[:, None]
    pos = jnp.where(valid, starts[:, None] + slot, max_pad)
    token_ids = (jax.lax.broadcasted_iota(jnp.int32, (e, mtb), 0) * mtb
                 + slot)
    sorted_ids = jnp.full((max_pad,), numel, jnp.int32).at[
        pos.reshape(-1)].set(token_ids.reshape(-1), mode="drop")
    total = jnp.sum(padded).astype(jnp.int32)
    block_starts = jnp.arange(max_blocks, dtype=jnp.int32) * block_size
    ends = jnp.cumsum(padded)
    expert_ids = jnp.searchsorted(ends, block_starts, side="right"
                                  ).astype(jnp.int32)
    expert_ids = jnp.where(block_starts < total,
                           jnp.clip(expert_ids, 0, e - 1), 0)
    return sorted_ids, expert_ids, total.reshape(1)


@register_op("moe_sum", "moe")
def moe_sum(x: jax.Array) -> jax.Array:
    """Sum over the topk axis: [T, K, D] -> [T, D]
    (csrc/moe/moe_align_sum_kernels.cpp:585-609)."""
    return jnp.sum(x.astype(jnp.float32), axis=1).astype(x.dtype)


@register_op("init_expert_map", "moe")
def init_expert_map(num_local_experts: int, ep_rank: int, ep_size: int):
    """Global->local expert map for an EP rank: local experts get
    [0, num_local), others -1 (csrc/moe/init_expert_map.cpp:9-78)."""
    e_global = num_local_experts * ep_size
    g = jnp.arange(e_global, dtype=jnp.int32)
    local = g - ep_rank * num_local_experts
    return jnp.where(
        (g >= ep_rank * num_local_experts)
        & (g < (ep_rank + 1) * num_local_experts),
        local, -1).astype(jnp.int32)


@register_op("remap_hidden_states", "moe")
def remap_hidden_states(
    hidden_states: jax.Array,     # [T, D]
    topk_ids: jax.Array,          # [T, K] global expert ids
    total_experts_num: int,
    local_experts_num: int,
    expert_map: Optional[jax.Array] = None,
    hidden_states_scales: Optional[jax.Array] = None,
):
    """Count rows per (local) expert and permute token copies into
    expert-grouped order (csrc/moe/remap_hidden_states.cpp:9-415).

    Returns (remapped [T*K, D], rows_per_expert [local_experts],
    unpermuted_row_to_permuted_row [T, K] (-1 for non-local),
    remapped_scales | None).
    """
    t, k = topk_ids.shape
    ids = topk_ids.reshape(-1).astype(jnp.int32)
    if expert_map is not None:
        local = expert_map.astype(jnp.int32)[ids]
    else:
        local = ids
    valid = local >= 0
    sort_key = jnp.where(valid, local, local_experts_num)
    order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
    rows_per_expert = jnp.bincount(
        jnp.where(valid, local, local_experts_num),
        length=local_experts_num + 1)[:local_experts_num].astype(jnp.int32)
    src_rows = order // k
    remapped = jnp.take(hidden_states, src_rows, axis=0)
    inv = jnp.zeros((t * k,), jnp.int32).at[order].set(
        jnp.arange(t * k, dtype=jnp.int32))
    inv = jnp.where(valid, inv, -1).reshape(t, k)
    remapped_scales = None
    if hidden_states_scales is not None:
        remapped_scales = jnp.take(hidden_states_scales, src_rows, axis=0)
    return remapped, rows_per_expert, inv, remapped_scales


@register_op("fused_moe_prologue", "moe")
def fused_moe_prologue(
    hidden_states: jax.Array,
    topk_ids: jax.Array,
    num_experts_on_rank: int,
    ep_rank: int = 0,
    ep_size: int = 1,
    hidden_states_scales: Optional[jax.Array] = None,
):
    """EP-aware prefix-sum + input row expansion
    (csrc/moe/fused_moe_prologue.hpp:155-559, schema
    csrc/moe/torch_bindings.cpp:74-83).  Composition of init_expert_map +
    remap_hidden_states, returning the same tuple as remap."""
    expert_map = None
    if ep_size > 1:
        expert_map = init_expert_map(num_experts_on_rank, ep_rank, ep_size)
    total = num_experts_on_rank * ep_size
    return remap_hidden_states(
        hidden_states, topk_ids, total, num_experts_on_rank, expert_map,
        hidden_states_scales)


@register_op("moe_gather", "moe")
def moe_gather(
    gemm2_output: jax.Array,               # [T*K, D] permuted rows
    topk_weights: jax.Array,               # [T, K]
    unpermuted_row_to_permuted_row: jax.Array,  # [T, K], -1 = skip
    num_experts: int,
):
    """Weighted unpermute-reduce back to token order
    (csrc/moe/moe_gather.cpp:10-161)."""
    del num_experts
    t, k = topk_weights.shape
    m = unpermuted_row_to_permuted_row.reshape(t * k)
    valid = m >= 0
    rows = jnp.take(gemm2_output, jnp.clip(m, 0), axis=0).astype(jnp.float32)
    w = jnp.where(valid, topk_weights.reshape(-1), 0.0)[:, None]
    out = jnp.sum((rows * w).reshape(t, k, -1), axis=1)
    return out.astype(gemm2_output.dtype)


# ---------------------------------------------------------------------------
# grouped GEMM (reference-parity op; exact rows_per_expert layout)
# ---------------------------------------------------------------------------


@register_op("grouped_gemm", "moe")
def grouped_gemm(
    A: jax.Array,                 # [R, K] rows grouped by expert
    B: jax.Array,                 # [E, K, N]
    rows_per_expert: jax.Array,   # [E] int32
    scales: Optional[jax.Array] = None,   # [E] | [E, N] per-expert scales
    bias: Optional[jax.Array] = None,     # [E, N]
    out_dtype=None,
) -> jax.Array:
    """Per-expert GEMM over contiguously-grouped rows
    (csrc/xpu/torch_bindings.cpp:41-53 ``cutlass_grouped_gemm_interface``,
    Xe2 impl grouped_gemm_xe2_interface.hpp:71-350).

    Kernel tier: the contiguously-grouped rows are re-bucketed into the
    block-aligned layout (one gather; static worst case
    ``cdiv(R, bm) + E - 1`` blocks, the moe_align bound) and run through
    kernels/grouped_matmul.py — each expert's weights stream ONCE.  The
    jnp tier loops experts with masked full-matrix dots (golden twin;
    O(E) flops — fine for tests, not for serving).
    """
    from vllm_xpu_kernels_tpu.registry import use_pallas

    r, k_ = A.shape
    e, _, n = B.shape
    out_dtype = out_dtype or A.dtype
    counts = rows_per_expert.astype(jnp.int32)
    ends = jnp.cumsum(counts)

    kernel_ok = use_pallas() and (
        A.dtype in (jnp.bfloat16, jnp.float16)
        and (B.dtype in (jnp.bfloat16, jnp.float16)
             or (B.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2))))
    if kernel_ok:
        from vllm_xpu_kernels_tpu.kernels.grouped_matmul import (
            grouped_matmul_pallas)

        bm = min(128, max(8, -(-r // 8) * 8))
        nb = -(-r // bm) + e - 1            # static moe_align block bound
        starts = ends - counts
        blocks_e = -(-jnp.maximum(counts, 0) // bm)
        bends = jnp.cumsum(blocks_e)
        bstarts = bends - blocks_e
        bi = jnp.arange(nb, dtype=jnp.int32)
        eb = jnp.searchsorted(bends, bi, side="right").astype(jnp.int32)
        eb = jnp.where(bi < bends[-1], jnp.clip(eb, 0, e - 1), -1)
        a_pos = jnp.arange(nb * bm, dtype=jnp.int32)
        blk = a_pos // bm
        e_of = jnp.clip(eb[blk], 0, e - 1)
        off = a_pos - bstarts[e_of] * bm
        src = starts[e_of] + off
        live = (eb[blk] >= 0) & (off < counts[e_of])
        src_c = jnp.clip(jnp.where(live, src, 0), 0, r - 1)
        a_al = jnp.take(A, src_c, axis=0)
        quant = "none"
        sc, kbias = scales, bias
        if B.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            quant = "fp8_channel"
            sc = (jnp.ones((e, n), jnp.float32) if scales is None else
                  (jnp.broadcast_to(scales[:, None].astype(jnp.float32),
                                    (e, n))
                   if scales.ndim == 1 else scales))
        elif scales is not None:
            # dense-weight scales don't fold in-kernel (the epilogue
            # scale slot is the quant-recipe dequant); apply scale THEN
            # bias post-hoc to keep the (x@W)*s + b order
            sc, kbias = None, None
        out_al = grouped_matmul_pallas(
            a_al, B, eb, scales=sc, bias=kbias, quant=quant,
            block_m=bm, out_dtype=jnp.float32)
        if quant == "none" and scales is not None:
            s = scales.astype(jnp.float32)
            s2 = s[:, None] if s.ndim == 1 else s
            out_al = out_al * s2[e_of]
            if bias is not None:
                out_al = out_al + bias.astype(jnp.float32)[e_of]
        out = jnp.zeros((r + 1, n), jnp.float32).at[
            jnp.where(live, src, r)].set(out_al, mode="drop")[:r]
        return out.astype(out_dtype)

    seg = jnp.searchsorted(ends, jnp.arange(r, dtype=jnp.int32),
                           side="right").astype(jnp.int32)
    seg = jnp.clip(seg, 0, e - 1)
    valid = jnp.arange(r) < ends[-1]
    # gather each row's expert matrix is too big; loop experts instead
    def body(i, acc):
        mask = (seg == i) & valid
        part = jnp.dot(
            jnp.where(mask[:, None], A, 0).astype(jnp.bfloat16),
            B[i].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        if scales is not None:
            s = scales[i]
            part = part * (s if s.ndim == 0 else s[None, :])
        if bias is not None:
            part = part + bias[i].astype(jnp.float32)[None, :]
        return acc + jnp.where(mask[:, None], part, 0.0)

    out = jax.lax.fori_loop(
        0, e, body, jnp.zeros((r, n), jnp.float32))
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# fused MoE pipeline (reference: XpuFusedMoe._apply_kernel)
# ---------------------------------------------------------------------------

_ACTS = {
    "silu": lambda x: _ops.silu_and_mul(x),
    "gelu": lambda x: _ops.gelu_and_mul(x),
    "gelu_tanh": lambda x: _ops.gelu_tanh_and_mul(x),
    "swigluoai": lambda x: _ops.swigluoai_and_mul(x),
    "swiglustep": lambda x: _ops.swiglustep_and_mul(x),
    "relu2_no_mul": lambda x: _ops.relu2_no_mul(x),
}


def _swigluoai_halves(x, alpha=1.702, limit=7.0):
    """swigluoai over a [gate | up] HALVES layout (the weights were
    de-interleaved at load — models/gpt_oss._expert_params): contiguous
    half-slices instead of the interleaved contract's [0::2]/[1::2]
    strided gathers, which cost a lane-relayout pass each on TPU (the
    dominant share of the fused mxfp4 pipeline's inter-GEMM glue)."""
    d = x.shape[-1] // 2
    gate = jnp.minimum(x[..., :d].astype(jnp.float32), limit)
    up = jnp.clip(x[..., d:].astype(jnp.float32), -limit, limit)
    return ((up + 1.0) * gate * jax.nn.sigmoid(gate * alpha)).astype(x.dtype)


# activation table for weights stored in the [gate | up] halves layout
# (every non-swigluoai act already splits halves)
_ACTS_HALVES = dict(_ACTS, swigluoai=_swigluoai_halves)


def gate_up_halves_perm(n2: int):
    """Column permutation de-interleaving [g0,u0,g1,u1,...] -> [g|u]."""
    import numpy as np

    return np.concatenate([np.arange(0, n2, 2), np.arange(1, n2, 2)])


@register_op("tpu_fused_moe", "moe")
def tpu_fused_moe(
    hidden_states: jax.Array,      # [T, D]
    w13: jax.Array,                # [E, D, 2I] (packed int4/fp4: [E, D/2, 2I])
    w2: jax.Array,                 # [E, I, D] (packed: [E, I/2, D])
    topk_weights: jax.Array,       # [T, K]
    topk_ids: jax.Array,           # [T, K]
    *,
    w13_scales: Optional[jax.Array] = None,
    w2_scales: Optional[jax.Array] = None,
    w13_bias: Optional[jax.Array] = None,
    w2_bias: Optional[jax.Array] = None,
    activation: str = "silu",
    # none | fp8_channel | w8a8 | int4 | mxfp4 | mxfp8 | fp8_block |
    # mxfp4_fp8  (the reference detects mxfp8 / block-fp8 / mxfp4_fp8
    # from weight+scale dtypes, fused_moe_interface.py:33-60)
    quant: str = "none",
    group_size: int = 0,           # K-group for int4/mxfp4 scales
    num_experts: Optional[int] = None,
    ep_rank: int = 0,
    ep_size: int = 1,
    expert_map: Optional[jax.Array] = None,
    gemm1_clamp_limit: Optional[float] = None,
    block_m: int = 128,
    gate_up_layout: str = "interleaved",
) -> jax.Array:
    """The composite MoE forward (reference: XpuFusedMoe.apply →
    remap → grouped_gemm(w13) → [clamp] → act → grouped_gemm(w2) →
    moe_gather, fused_moe_interface.py:308-393).

    TPU path: tokens are gathered into the moe_align_block_size layout
    (each M-block belongs to one expert) and both GEMMs run as one Pallas
    grouped kernel each; the weighted un-permute is a segment reduce.

    ``gate_up_layout="halves"``: the caller de-interleaved w13's gate/up
    columns at load (gate_up_halves_perm) so interleaved-contract
    activations (swigluoai) run on contiguous half-slices — strided
    [0::2] gathers are a lane relayout per pass on TPU.

    Activation-quantizing recipes (reference ref_moe_utils.py:166-188
    ``qdq_act``; the dense ``fp8_gemm`` classifies the same scale
    shapes): ``mxfp8`` = fp8 weights + [E, K/32, N] UE8M0 scales, acts
    qdq'd per-32-group with pow2 scales; ``fp8_block`` = fp8 weights +
    [E, K/128, N/128] f32 scales (DeepSeek-style), acts qdq'd
    per-128-group; ``mxfp4_fp8`` = mxfp4 weights, acts qdq'd per-tensor
    fp8.  One deviation from the reference's ref impl: per-tensor act
    amax is over the WHOLE batch, not each expert's token slice — the
    TPU pipeline has no per-expert slices (tokens are block-gathered),
    and both tiers here use the same contract.
    """
    t, d = hidden_states.shape
    e_local = w13.shape[0]
    k = topk_ids.shape[1]
    if num_experts is None:
        num_experts = e_local * ep_size
    if expert_map is None and ep_size > 1:
        expert_map = init_expert_map(e_local, ep_rank, ep_size)

    inter2 = w13.shape[-1]
    act = (_ACTS_HALVES if gate_up_layout == "halves" else _ACTS)[activation]

    # activation-quantizing recipes: qdq the rows entering each GEMM
    # (reference qdq_act, ref_moe_utils.py:166-188), identical in both
    # tiers so the kernel/golden pair stays comparable
    act_qdq = None
    if quant == "mxfp4_fp8":
        def act_qdq(x):
            from vllm_xpu_kernels_tpu.ops.quant import (
                dynamic_scaled_fp8_quant)

            q, s = dynamic_scaled_fp8_quant(x)
            return (q.astype(jnp.float32) * s).astype(x.dtype)

        quant = "mxfp4"        # weight format is identical to mxfp4
        if group_size == 0:
            group_size = 32
    elif quant in ("mxfp8", "fp8_block"):
        _g_act = 32 if quant == "mxfp8" else 128
        _ue8 = quant == "mxfp8"

        def act_qdq(x, _g=_g_act, _u=_ue8):
            from vllm_xpu_kernels_tpu.ops.quant import (
                per_token_group_fp8_quant)

            q, s = per_token_group_fp8_quant(x, _g, scale_ue8m0=_u)
            return (q.astype(jnp.float32)
                    * jnp.repeat(s, _g, axis=-1)).astype(x.dtype)

    if use_pallas():
        from vllm_xpu_kernels_tpu.kernels import grouped_matmul as gmm

        in_dtype = hidden_states.dtype
        hidden_states = mosaic_safe(hidden_states)

        # local expert ids (EP): invalid slots sort to the end
        ids = topk_ids.astype(jnp.int32)
        if expert_map is not None:
            ids = expert_map[ids]
        numel = t * k
        buckets = e_local + (1 if expert_map is not None else 0)
        # decode-sized batches take thin M-blocks: each routed expert's
        # weights stream once regardless, but every elementwise pass
        # (act, quant, reduce) is O(R) and R = blocks * bm.  The 2x
        # headroom over a uniform split tolerates moderate routing skew
        # (a hot expert overflowing into a second block re-streams its
        # weights once).
        bm = min(block_m, max(32, _cdiv(_cdiv(2 * numel, e_local), 32) * 32))
        sorted_ids, expert_blk, total = moe_align_block_size(
            jnp.where(ids >= 0, ids, e_local), buckets, bm,
            pad_sorted_ids=True)
        if expert_map is not None:
            # drop the trailing overflow bucket for non-local tokens
            expert_blk = jnp.where(expert_blk >= e_local, -1, expert_blk)
        # tight static cap: sum_e cdiv(c_e, bm) <= cdiv(numel, bm) +
        # nonzero_buckets - 1, usually well under moe_align's worst-case
        # allocation — fewer M-blocks is fewer expert weight streams
        cap = min(expert_blk.shape[0],
                  _cdiv(numel, bm) + min(buckets, numel) - 1)
        sorted_ids = sorted_ids[:cap * bm]
        expert_blk = expert_blk[:cap]
        # alignment-tail blocks go invalid: the kernel freezes their
        # operand DMAs and skips their compute
        blk_start = jnp.arange(cap, dtype=jnp.int32) * bm
        expert_blk = jnp.where(blk_start < total[0], expert_blk, -1)
        src_rows = jnp.clip(sorted_ids // k, 0, t - 1)
        a_sorted = jnp.take(hidden_states, src_rows, axis=0)
        if act_qdq is not None:
            a_sorted = act_qdq(a_sorted)
        # mxfp8 / fp8_block route to the grouped kernel's K-grouped fp8
        # scale path; block-fp8's [E, K/128, N/128] scales expand their
        # N-groups host-side (scale-shape work only)
        gmm_quant, gmm_g = quant, group_size
        w13_s, w2_s = w13_scales, w2_scales
        if quant in ("mxfp8", "fp8_block"):
            gmm_quant = "fp8"
            gmm_g = 32 if quant == "mxfp8" else 128
            if quant == "fp8_block":
                w13_s = jnp.repeat(w13_scales.astype(jnp.float32),
                                   inter2 // w13_scales.shape[-1], axis=-1)
                w2_s = jnp.repeat(w2_scales.astype(jnp.float32),
                                  d // w2_scales.shape[-1], axis=-1)
        # routing weights fold into the second GEMM's epilogue
        flat = jnp.clip(sorted_ids, 0, t * k)     # t*k == padding sentinel
        wflat = jnp.concatenate(
            [topk_weights.reshape(-1).astype(jnp.float32),
             jnp.zeros((1,), jnp.float32)])[flat]
        if quant == "w8a8":
            # per-token int8 activations feed the native s8 MXU path;
            # the token scales factor out to the in-kernel epilogue.
            # Bias folds after them: (A.B)*a_s*b_s + bias
            from vllm_xpu_kernels_tpu.ops.quant import (
                dynamic_per_token_scaled_int8_quant as _a8)

            aq, a_s = _a8(a_sorted)
            g1 = gmm.grouped_matmul_pallas(
                aq, w13, expert_blk,
                scales=w13_scales, bias=w13_bias, quant=quant,
                row_scales=a_s, block_m=bm, out_dtype=jnp.bfloat16)
        else:
            g1 = gmm.grouped_matmul_pallas(
                a_sorted, w13, expert_blk,
                scales=w13_s, bias=w13_bias, quant=gmm_quant,
                group_size=gmm_g, block_m=bm,
                out_dtype=hidden_states.dtype)
        if gemm1_clamp_limit is not None and gemm1_clamp_limit > 0:
            inter = inter2 // 2
            gate = jnp.clip(g1[:, :inter], a_max=gemm1_clamp_limit)
            up = jnp.clip(g1[:, inter:], -gemm1_clamp_limit,
                          gemm1_clamp_limit)
            g1 = jnp.concatenate([gate, up], axis=-1)
        if quant == "w8a8":
            if activation == "silu" and gemm1_clamp_limit is None:
                # one fused Pallas pass: gated act + per-token int8 quant
                from vllm_xpu_kernels_tpu.ops.activation import (
                    silu_and_mul_per_token_quant)

                a2q, a2_s = silu_and_mul_per_token_quant(g1)
            else:
                a2q, a2_s = _a8(act(g1).astype(jnp.bfloat16))
            if w2_bias is not None:
                # (acc*chan*a2_s + bias) * routing_weight: the act-quant
                # dequant factor rides the PRE-bias row-scale slot
                g2 = gmm.grouped_matmul_pallas(
                    a2q, w2, expert_blk,
                    scales=w2_scales, bias=w2_bias, quant=quant,
                    row_scales_pre=a2_s, row_scales=wflat,
                    bias_first=True, block_m=bm, out_dtype=jnp.float32)
            else:
                g2 = gmm.grouped_matmul_pallas(
                    a2q, w2, expert_blk,
                    scales=w2_scales, bias=None, quant=quant,
                    row_scales=a2_s * wflat, block_m=bm,
                    out_dtype=jnp.float32)
        else:
            a2 = act(g1)
            if act_qdq is not None:
                a2 = act_qdq(a2)
            g2 = gmm.grouped_matmul_pallas(
                a2, w2, expert_blk,
                scales=w2_s, bias=w2_bias, quant=gmm_quant,
                row_scales=wflat, bias_first=True,
                group_size=gmm_g, block_m=bm,
                out_dtype=jnp.float32)
        # unweighted scatter-reduce back to token order (weights already
        # applied in the GEMM2 epilogue; padding rows carry weight 0)
        tok = jnp.where(sorted_ids < t * k, sorted_ids // k, t)
        out = jax.ops.segment_sum(g2, tok, num_segments=t + 1)[:t]
        return out.astype(in_dtype)

    # ---- reference path -------------------------------------------------
    remapped, rows_per_expert, inv, _ = remap_hidden_states(
        hidden_states, topk_ids, num_experts, e_local, expert_map)
    if act_qdq is not None:
        remapped = act_qdq(remapped)
    if quant == "none":
        deq13, deq2 = w13, w2
        s13 = s2 = None
    elif quant == "fp8_channel":
        deq13, deq2 = w13, w2
        s13, s2 = w13_scales, w2_scales
    elif quant == "w8a8":
        # golden twin: quantize-dequantize activations per token, then
        # f32 matmuls with dequantized int8 weights
        from vllm_xpu_kernels_tpu.ops.quant import (
            dynamic_per_token_scaled_int8_quant as _a8)

        q, s = _a8(remapped)
        remapped = (q.astype(jnp.float32) * s[:, None]
                    ).astype(hidden_states.dtype)
        deq13 = w13.astype(jnp.float32) * w13_scales.astype(
            jnp.float32)[:, None, :]
        deq2 = w2.astype(jnp.float32) * w2_scales.astype(
            jnp.float32)[:, None, :]
        s13 = s2 = None
    else:
        deq13 = _dequant_moe_weights(w13, w13_scales, quant, group_size)
        deq2 = _dequant_moe_weights(w2, w2_scales, quant, group_size)
        s13 = s2 = None
    g1 = grouped_gemm(remapped, deq13, rows_per_expert, scales=s13,
                      bias=w13_bias, out_dtype=hidden_states.dtype)
    if gemm1_clamp_limit is not None and gemm1_clamp_limit > 0:
        inter = inter2 // 2
        gate = jnp.clip(g1[:, :inter], a_max=gemm1_clamp_limit)
        up = jnp.clip(g1[:, inter:], -gemm1_clamp_limit, gemm1_clamp_limit)
        g1 = jnp.concatenate([gate, up], axis=-1)
    a2 = act(g1)
    if act_qdq is not None:
        a2 = act_qdq(a2)
    g2 = grouped_gemm(a2, deq2, rows_per_expert, scales=s2, bias=w2_bias,
                      out_dtype=hidden_states.dtype)
    return moe_gather(g2, topk_weights, inv, e_local)


def _dequant_moe_weights(w, scales, quant, group_size):
    """[E, K(/2), N] packed -> [E, K, N] f32 dequantized (ref path)."""
    from vllm_xpu_kernels_tpu.kernels import quant_matmul as qmm

    if quant == "mxfp8":
        # fp8 weights + [E, K/32, N] UE8M0 group scales (reference:
        # ref_moe_utils.py:76-78 dequant_mxfp8_wei)
        s = scales
        if s.dtype == jnp.uint8:
            from vllm_xpu_kernels_tpu.utils import quant_math as _qm

            s = _qm.e8m0_decode(s)
        g = w.shape[1] // s.shape[1]
        return w.astype(jnp.float32) * jnp.repeat(
            s.astype(jnp.float32), g, axis=1)
    if quant == "fp8_block":
        # fp8 weights + [E, K/128, N/128] f32 block scales (reference:
        # ref_moe_utils.py:139-146 dequant_fp8_block_wei)
        gk = w.shape[1] // scales.shape[1]
        gn = w.shape[2] // scales.shape[2]
        s = jnp.repeat(jnp.repeat(scales.astype(jnp.float32), gk, axis=1),
                       gn, axis=2)
        return w.astype(jnp.float32) * s
    if quant == "fp8":
        s = scales.astype(jnp.float32)
        if s.ndim == 1:
            s = s[:, None, None]
        elif s.ndim == 2:
            s = s[:, None, :]
        else:
            s = jnp.repeat(s, group_size, axis=1)
        return w.astype(jnp.float32) * s
    if quant in ("int4", "mxfp4"):
        if scales.dtype == jnp.uint8:      # UE8M0 exponent bytes (MX spec)
            from vllm_xpu_kernels_tpu.utils import quant_math as _qm

            scales = _qm.e8m0_decode(scales)
        outs = []
        for eidx in range(w.shape[0]):
            codes = qmm.unpack_int4_splitk_grouped(w[eidx], group_size)
            if quant == "mxfp4":
                vals = qmm.e2m1_decode_f32(codes)
            else:
                vals = codes.astype(jnp.float32) - 8.0
            outs.append(vals * jnp.repeat(
                scales[eidx].astype(jnp.float32), group_size, axis=0))
        return jnp.stack(outs)
    raise ValueError(f"unknown quant {quant}")

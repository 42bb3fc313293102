"""LoRA batched-GEMV ops (reference: csrc/xpu/lora/lora_shrink.cpp:39-442,
lora_expand.cpp, decls lora_ops.h:26-98, schemas
csrc/xpu/torch_bindings.cpp:82-96; goldens tests/test_lora_ops.py).

Semantics (vLLM bgmv contract):
- ``bgmv_shrink``:  out[t, r] = scaling · Σ_h inputs[t, h] · A[idx[t], r, h]
- ``bgmv_expand``:  out[t, h] (+)= Σ_r inputs[t, r] · B[idx[t], h, r]
- ``bgmv_expand_slice``: expand written into out[:, off:off+size]
- idx[t] < 0 → token has no adapter (contributes zero / passthrough).

TPU-first: per-token adapter gather + batched einsum.  The rank dim is
tiny (8-64), so the op is HBM-bound on the A/B gathers; XLA fuses the
gather into the einsum loop.  ``moe_lora_align_block_size`` composes the
MoE alignment with per-(expert, adapter) sub-buckets
(csrc/moe/moe_align_sum_kernels.cpp moe_lora_align_block_size).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op


def _gathered(weights, idx):
    safe = jnp.clip(idx, 0, weights.shape[0] - 1)
    return jnp.take(weights, safe, axis=0), (idx >= 0)


@register_op("bgmv_shrink", "lora")
def bgmv_shrink(
    inputs: jax.Array,        # [T, H]
    lora_a: jax.Array,        # [L, R, H]
    token_lora_mapping: jax.Array,   # [T] int, -1 = none
    scaling: float = 1.0,
) -> jax.Array:
    """-> [T, R] f32 (reference writes into a f32 out buffer)."""
    w, valid = _gathered(lora_a, token_lora_mapping.astype(jnp.int32))
    out = jnp.einsum(
        "th,trh->tr", inputs.astype(jnp.float32), w.astype(jnp.float32))
    out = jnp.where(valid[:, None], out * scaling, 0.0)
    return out.astype(jnp.float32)


@register_op("bgmv_expand", "lora")
def bgmv_expand(
    inputs: jax.Array,        # [T, R]
    lora_b: jax.Array,        # [L, H, R]
    output: jax.Array,        # [T, H] (accumulated into when add_inputs)
    token_lora_mapping: jax.Array,
    add_inputs: bool = True,
) -> jax.Array:
    w, valid = _gathered(lora_b, token_lora_mapping.astype(jnp.int32))
    delta = jnp.einsum(
        "tr,thr->th", inputs.astype(jnp.float32), w.astype(jnp.float32))
    delta = jnp.where(valid[:, None], delta, 0.0)
    base = output.astype(jnp.float32) if add_inputs else 0.0
    return (base + delta).astype(output.dtype)


@register_op("bgmv_expand_slice", "lora")
def bgmv_expand_slice(
    inputs: jax.Array,        # [T, R]
    lora_b: jax.Array,        # [L, slice_size, R]
    output: jax.Array,        # [T, H_total]
    token_lora_mapping: jax.Array,
    slice_offset: int,
    slice_size: int,
    add_inputs: bool = True,
) -> jax.Array:
    """Expand into a column slice of a packed output (e.g. fused qkv)."""
    w, valid = _gathered(lora_b, token_lora_mapping.astype(jnp.int32))
    delta = jnp.einsum(
        "tr,thr->th", inputs.astype(jnp.float32), w.astype(jnp.float32))
    delta = jnp.where(valid[:, None], delta, 0.0)
    seg = output[:, slice_offset:slice_offset + slice_size].astype(
        jnp.float32)
    seg = (seg + delta) if add_inputs else delta
    return output.at[:, slice_offset:slice_offset + slice_size].set(
        seg.astype(output.dtype))


@register_op("moe_lora_align_block_size", "moe")
def moe_lora_align_block_size(
    topk_ids: jax.Array,             # [T, K]
    token_lora_mapping: jax.Array,   # [T]
    num_experts: int,
    max_loras: int,
    block_size: int,
):
    """MoE alignment with per-adapter sub-buckets: slots sorted by
    (lora_id, expert) so each block serves one (adapter, expert) pair
    (csrc/moe/moe_align_sum_kernels.cpp:… moe_lora_align_block_size).

    Returns (sorted_token_ids, expert_ids [blocks], lora_ids [blocks],
    num_tokens_post_pad)."""
    from vllm_xpu_kernels_tpu.ops.moe import moe_align_block_size

    t, k = topk_ids.shape
    lora = jnp.repeat(token_lora_mapping.astype(jnp.int32), k)
    combo = (jnp.clip(lora, 0, max_loras - 1) * num_experts
             + topk_ids.reshape(-1))
    sorted_ids, combo_ids, total = moe_align_block_size(
        combo.reshape(t, k), num_experts * max_loras, block_size)
    return (sorted_ids, (combo_ids % num_experts).astype(jnp.int32),
            (combo_ids // num_experts).astype(jnp.int32), total)

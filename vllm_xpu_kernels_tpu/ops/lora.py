"""LoRA batched-GEMV ops (reference: csrc/xpu/lora/lora_shrink.cpp:39-442,
lora_expand.cpp, decls lora_ops.h:26-98, schemas
csrc/xpu/torch_bindings.cpp:82-96; goldens tests/test_lora_ops.py).

Semantics (vLLM bgmv contract):
- ``bgmv_shrink``:  out[t, r] = scaling · Σ_h inputs[t, h] · A[idx[t], r, h]
- ``bgmv_expand``:  out[t, h] (+)= Σ_r inputs[t, r] · B[idx[t], h, r]
- ``bgmv_expand_slice``: expand written into out[:, off:off+size]
- idx[t] < 0 → token has no adapter (contributes zero / passthrough).

TPU-first tiers:

- **Kernel tier**: tokens stable-sort by adapter id into contiguously-
  grouped rows and run through the grouped-matmul machinery (adapters
  play the role of experts; ops.moe.grouped_gemm -> block-aligned
  kernels/grouped_matmul.py) — each adapter's A/B weights stream ONCE
  per call.  The reference's lora_shrink.cpp streams each adapter once
  per token group the same way.
- **Reference tier**: per-token adapter gather + batched einsum (golden
  twin; materializes a [T, R, H] gathered weight copy — fine for tests,
  ~4 GB at prefill scale).

``moe_lora_align_block_size`` composes the MoE alignment with
per-(expert, adapter) sub-buckets
(csrc/moe/moe_align_sum_kernels.cpp moe_lora_align_block_size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op, use_pallas


def _gathered(weights, idx):
    safe = jnp.clip(idx, 0, weights.shape[0] - 1)
    return jnp.take(weights, safe, axis=0), (idx >= 0)


def _shrink_all_adapters(x, lora_a, idx):
    """Shrink without sort OR gather: ONE dense GEMM against every
    adapter's A stacked ([H, L*R] — L*R is small), then a per-token
    block select.  The activations stream once; adapter weights are a
    rounding error.  -> [T, R] f32 (idx < 0 rows zero)."""
    l_, r_, h = lora_a.shape
    w2 = lora_a.reshape(l_ * r_, h).T                  # [H, L*R]
    allout = jnp.dot(x.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    allout = allout.reshape(-1, l_, r_)
    sel = jnp.take_along_axis(
        allout, jnp.clip(idx, 0, l_ - 1)[:, None, None], axis=1)[:, 0]
    return jnp.where((idx >= 0)[:, None], sel, 0.0)


def _expand_onehot(h, lora_b, idx):
    """Expand without sort: place each token's rank vector in its
    adapter's block of a [T, L*R] zero-padded input (one masked
    broadcast), then ONE dense GEMM against the stacked B — the [T, H]
    output is written once.  -> [T, H] f32 (idx < 0 rows zero)."""
    l_, hdim, r_ = lora_b.shape
    t = h.shape[0]
    blocks = (idx[:, None] == jnp.arange(l_, dtype=jnp.int32)[None, :])
    xb = (h.astype(jnp.float32)[:, None, :]
          * blocks[:, :, None]).reshape(t, l_ * r_)
    w2 = jnp.swapaxes(lora_b, 1, 2).reshape(l_ * r_, hdim)
    return jnp.dot(xb.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


# all-adapters dense paths win while the stacked rank dim stays small
# (one activation pass beats sort+gather+scatter); larger adapter pools
# fall back to the adapter-grouped matmul
_DENSE_LR_MAX = 2048


def _grouped_bgmv(x, w_ekn, idx):
    """Adapter-grouped matmul: x [T, K] x w [L, K, N] selected per token
    by ``idx`` ([T], -1 = none -> zero row).  Tokens stable-sort by
    adapter into the contiguous grouped-rows layout and run through
    ops.moe.grouped_gemm (one weight stream per adapter).  -> [T, N] f32.
    """
    from vllm_xpu_kernels_tpu.ops.moe import grouped_gemm

    t = x.shape[0]
    l_ = w_ekn.shape[0]
    ids = idx.astype(jnp.int32)
    key = jnp.where(ids < 0, l_, ids)
    order = jnp.argsort(key, stable=True)
    counts = jnp.zeros((l_,), jnp.int32).at[
        jnp.clip(ids, 0, l_ - 1)].add((ids >= 0).astype(jnp.int32))
    x_sorted = jnp.take(x.astype(jnp.bfloat16), order, axis=0)
    out_sorted = grouped_gemm(x_sorted, w_ekn, counts,
                              out_dtype=jnp.float32)
    return jnp.zeros((t, w_ekn.shape[2]), jnp.float32).at[order].set(
        out_sorted, unique_indices=True)


@register_op("bgmv_shrink", "lora")
def bgmv_shrink(
    inputs: jax.Array,        # [T, H]
    lora_a: jax.Array,        # [L, R, H]
    token_lora_mapping: jax.Array,   # [T] int, -1 = none
    scaling: float = 1.0,
) -> jax.Array:
    """-> [T, R] f32 (reference writes into a f32 out buffer;
    csrc/xpu/lora/lora_shrink.cpp:39-442)."""
    idx = token_lora_mapping.astype(jnp.int32)
    l_, r_, _h = lora_a.shape
    if use_pallas():
        if l_ * r_ <= _DENSE_LR_MAX:
            out = _shrink_all_adapters(inputs, lora_a, idx)
        else:
            out = _grouped_bgmv(inputs, jnp.swapaxes(lora_a, 1, 2), idx)
        return (out * scaling).astype(jnp.float32)
    w, valid = _gathered(lora_a, idx)
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
    idx = token_lora_mapping.astype(jnp.int32)
    l_, _h, r_ = lora_b.shape
    if use_pallas():
        if l_ * r_ <= _DENSE_LR_MAX:
            delta = _expand_onehot(inputs, lora_b, idx)
        else:
            delta = _grouped_bgmv(inputs, jnp.swapaxes(lora_b, 1, 2), idx)
    else:
        w, valid = _gathered(lora_b, idx)
        delta = jnp.einsum(
            "tr,thr->th", inputs.astype(jnp.float32),
            w.astype(jnp.float32))
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
    idx = token_lora_mapping.astype(jnp.int32)
    l_, _h, r_ = lora_b.shape
    if use_pallas():
        if l_ * r_ <= _DENSE_LR_MAX:
            delta = _expand_onehot(inputs, lora_b, idx)
        else:
            delta = _grouped_bgmv(inputs, jnp.swapaxes(lora_b, 1, 2), idx)
    else:
        w, valid = _gathered(lora_b, idx)
        delta = jnp.einsum(
            "tr,thr->th", inputs.astype(jnp.float32),
            w.astype(jnp.float32))
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

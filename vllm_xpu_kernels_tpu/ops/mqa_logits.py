"""DeepSeek-V3.2 sparse-indexer MQA logits ops
(reference: csrc/xpu/mqa_logits/xe_2/mqa_logits_xe2.cpp:45+
``fp8_mqa_logits_kernel_t``, interface mqa_logits_interface.{h,cpp},
schemas csrc/xpu/torch_bindings.cpp:139-150; goldens
tests/mqa_logits/test_mqa_logits.py ``_pytorch_mqa_logits`` /
``fp8_paged_mqa_logits_torch``).

These produce the relu-weighted Q·Kᵀ logits the DeepSeek indexer feeds to
``top_k_per_row_*`` for sparse KV selection.  Partner cache ops
(``indexer_k_quant_and_cache``, ``cp_gather_indexer_k_quant_cache``) live
in ops/cache.py.

TPU-first: these are batched matmuls with masks — XLA fuses the
dequant/relu/weighted-sum epilogue into the einsum; the paged variant
gathers pages with one take() (static max_model_len grid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op

NEG_INF = float("-inf")


@register_op("fp8_mqa_logits", "mqa_logits")
def fp8_mqa_logits(
    q: jax.Array,              # [Tq, H, D] fp8 (or bf16)
    kv: jax.Array,             # [Tkv, D] fp8
    kv_scales: jax.Array,      # [Tkv] f32 per-token scales
    weights: jax.Array,        # [Tq, H] f32
    cu_seqlen_ks: jax.Array,   # [Tq] per-row kv window start
    cu_seqlen_ke: jax.Array,   # [Tq] per-row kv window end
) -> jax.Array:
    """-> [Tq, Tkv] f32: Σ_h relu(qₕ·kᵀ·scale)·w_h, -inf outside
    [ks, ke) (varlen/CP windows)."""
    tq = q.shape[0]
    tkv = kv.shape[0]
    score = jnp.einsum(
        "mhd,nd->hmn",
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kv.astype(jnp.bfloat16).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * kv_scales.astype(jnp.float32)[None, None, :]
    logits = jnp.einsum(
        "hmn,mh->mn", jax.nn.relu(score), weights.astype(jnp.float32))
    n = jnp.arange(tkv, dtype=jnp.int32)[None, :]
    mask = (n >= cu_seqlen_ks[:, None]) & (n < cu_seqlen_ke[:, None])
    return jnp.where(mask, logits, NEG_INF)


def unpack_indexer_kv_cache(kv_cache: jax.Array):
    """Packed indexer cache [nb, bs, 1, D+4] uint8 (D fp8 bytes + 4 f32
    scale bytes per token; reference kv_cache layout in
    test_mqa_logits.py:12-30) -> (values [nb, bs, D] f32-dequantable fp8,
    scales [nb, bs] f32)."""
    nb, bs, one, dp4 = kv_cache.shape
    d = dp4 - 4
    flat = kv_cache.reshape(nb, bs * dp4)
    vals = jax.lax.bitcast_convert_type(
        flat[:, : bs * d].reshape(nb, bs, d), jnp.float8_e4m3fn)
    scales = jax.lax.bitcast_convert_type(
        flat[:, bs * d:].reshape(nb, bs, 4), jnp.float32)
    return vals, scales


@register_op("fp8_paged_mqa_logits", "mqa_logits")
def fp8_paged_mqa_logits(
    q: jax.Array,              # [B, next_n, H, D]
    kv_cache: jax.Array,       # [nb, bs, 1, D+4] packed uint8
    weights: jax.Array,        # [B*next_n, H] f32
    context_lens: jax.Array,   # [B]
    block_tables: jax.Array,   # [B, max_blocks]
    max_model_len: int,
) -> jax.Array:
    """-> [B*next_n, max_model_len] f32 paged-decode indexer logits with
    speculative next_n query offsets (golden fp8_paged_mqa_logits_torch,
    test_mqa_logits.py:107-172).

    Performance tier: the Pallas kernel
    (kernels/mqa_logits.paged_mqa_logits_pallas) streams the fp8 pages
    by block table — the reference's dedicated kernel role
    (mqa_logits_xe2.cpp:45).  The jnp tier below densifies the
    dequantized KV (fine for tests, ~0.5 GB f32 at 128k context)."""
    from vllm_xpu_kernels_tpu.registry import use_pallas

    b, next_n, h, d = q.shape
    if isinstance(kv_cache, (tuple, list)):
        # structured cache pair from ops.indexer_k_quant_and_cache
        vals, scales = kv_cache
        scales = scales.reshape(*scales.shape[:2])
        bs = vals.shape[1]
    else:
        bs = kv_cache.shape[1]
        vals, scales = unpack_indexer_kv_cache(kv_cache)
    if use_pallas():
        from vllm_xpu_kernels_tpu import envs
        from vllm_xpu_kernels_tpu.kernels import mqa_logits as mk

        # the dma kernel's manual HBM page slices need a lane-aligned
        # minor dim (Mosaic memref_slice: last dim % 128; the real V3.2
        # indexer head dim is 128) and 8-row sublane tiles — unaligned
        # shapes take the BlockSpec-pipelined variant, which accepts
        # arbitrary blocks
        if (envs.VXK_MQA_IMPL() == "dma" and d % 128 == 0
                and bs % 8 == 0):
            return mk.paged_mqa_logits_dma(
                q, vals, scales, weights, context_lens, block_tables,
                max_model_len)
        return mk.paged_mqa_logits_pallas(
            q, vals, scales, weights, context_lens, block_tables,
            max_model_len)
    max_blocks = min(block_tables.shape[1], -(-max_model_len // bs))
    tbl = block_tables[:, :max_blocks].astype(jnp.int32)
    kv_b = jnp.take(vals, tbl, axis=0).reshape(b, max_blocks * bs, d)
    sc_b = jnp.take(scales, tbl, axis=0).reshape(b, max_blocks * bs)
    kv_deq = kv_b.astype(jnp.float32) * sc_b[..., None]
    score = jnp.einsum(
        "bnhd,bkd->bhnk", q.astype(jnp.float32), kv_deq,
        preferred_element_type=jnp.float32)
    w = weights.astype(jnp.float32).reshape(b, next_n, h)
    logits = jnp.einsum("bhnk,bnh->bnk", jax.nn.relu(score), w)
    k_off = jnp.arange(max_blocks * bs, dtype=jnp.int32)
    ctx = context_lens.astype(jnp.int32)
    q_off = (ctx[:, None] - next_n
             + jnp.arange(next_n, dtype=jnp.int32)[None, :])  # [B, next_n]
    mask = (k_off[None, None, :] <= q_off[:, :, None]) & (
        k_off[None, None, :] < ctx[:, None, None])
    logits = jnp.where(mask, logits, NEG_INF)
    out = jnp.full((b, next_n, max_model_len), NEG_INF, jnp.float32)
    out = out.at[:, :, : max_blocks * bs].set(
        logits[:, :, :max_model_len])
    return out.reshape(b * next_n, max_model_len)

"""Paged KV-cache ops.

Reference: csrc/cache.cpp (1672 LoC) — schemas csrc/torch_bindings.cpp:244-324.

Functional mapping: every ``Tensor!`` cache argument becomes an input AND a
returned output (callers jit with donation so XLA updates the buffer in
place — the TPU equivalent of the reference's in-place scatter).

Layouts (TPU-first):

- ``reshape_and_cache_flash`` is the primary path, cache layout
  ``[num_blocks, block_size, num_heads, head_size]`` (same as the
  reference's "flash" layout, cache.cpp:110-335) — block_size and
  head_size land on TPU sublane/lane tiling when block_size is a multiple
  of 8 and head_size a multiple of 128.
- ``reshape_and_cache`` keeps the reference's legacy vectorized layout
  ``[num_blocks, num_heads, head_size/x, block_size, x]`` for contract
  parity (cache.cpp:18-109).
- The DeepSeek indexer-K cache stores fp8 payload and float32 scales as a
  *pair* of arrays instead of the reference's byte-aliased single buffer
  (cache.cpp:529-614) — byte aliasing is hostile to XLA; the information
  content and update rules are identical.

Slot convention: ``slot = block_idx * block_size + offset``; negative slots
are skipped (padding).  NOTE: jnp scatter follows NumPy semantics where -1
wraps to the last element, so padding slots are remapped to an
out-of-bounds sentinel first and dropped with scatter mode='drop'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op
from vllm_xpu_kernels_tpu.utils import quant_math as qm

_FP8_DTYPES = {
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


def _maybe_quant(x, kv_cache_dtype: str, scale):
    if kv_cache_dtype in ("auto", "", None):
        return x
    fp8_t = _FP8_DTYPES[kv_cache_dtype]
    qmax = qm.fp8_max_value(fp8_t)
    s = scale.astype(jnp.float32).reshape(()) if scale is not None else 1.0
    return jnp.clip(x.astype(jnp.float32) / s, -qmax, qmax).astype(fp8_t)


def _slots(slot_mapping, total_slots):
    """int32 slot indices with negatives remapped past the end (dropped)."""
    idx = slot_mapping.astype(jnp.int32)
    return jnp.where(idx < 0, total_slots, idx)


def _dequant(x, kv_cache_dtype: str, scale, out_dtype):
    if kv_cache_dtype in ("auto", "", None):
        return x.astype(out_dtype)
    s = scale.astype(jnp.float32).reshape(()) if scale is not None else 1.0
    return (x.astype(jnp.float32) * s).astype(out_dtype)


@register_op("reshape_and_cache_flash", "cache")
def reshape_and_cache_flash(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Scatter K/V tokens into the flash-layout paged cache
    ``[num_blocks, block_size, H, hs]`` (cache.cpp:110-335, schema
    csrc/torch_bindings.cpp:255-263).  Returns (key_cache, value_cache).
    """
    num_blocks, block_size = key_cache.shape[0], key_cache.shape[1]
    flat_k = key_cache.reshape(num_blocks * block_size, *key_cache.shape[2:])
    flat_v = value_cache.reshape(num_blocks * block_size, *value_cache.shape[2:])
    idx = _slots(slot_mapping, num_blocks * block_size)
    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(key_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(value_cache.dtype)
    flat_k = flat_k.at[idx].set(kq, mode="drop")
    flat_v = flat_v.at[idx].set(vq, mode="drop")
    return (
        flat_k.reshape(key_cache.shape),
        flat_v.reshape(value_cache.shape),
    )


@register_op("reshape_and_cache_tpu", "cache")
def reshape_and_cache_tpu(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Scatter K/V tokens into the TPU-native page layout
    ``[num_blocks, H, block_size, hs]`` — the layout the Pallas attention
    kernels consume directly (kernels/flash_attention.py; exact Mosaic
    tiles, one DMA per (head, page)).  Same semantics as
    ``reshape_and_cache_flash`` otherwise.  Returns (key_cache, value_cache).
    """
    nb, h, bs, hs = key_cache.shape
    idx = _slots(slot_mapping, nb * bs)
    block = idx // bs
    off = idx % bs
    # Flat row-scatter: indexing the 4-D cache at [block, :, off, :] makes
    # XLA prefer a heads-minor layout for the scatter and insert a
    # full-cache layout copy per layer per step to feed the Pallas
    # attention kernels (measured 247 us x n_layers on v5e — 25% of the
    # 8B decode step).  Scattering [T, H] rows of a [nb*H*bs, hs] view is
    # layout-neutral: same memory, no copies.
    rows = (block[:, None] * (h * bs) + jnp.arange(h)[None, :] * bs
            + off[:, None])                                   # [T, H]
    rows = jnp.where((idx < nb * bs)[:, None], rows, nb * h * bs)
    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(key_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(value_cache.dtype)
    hs_v = value_cache.shape[-1]     # MLA: value head size != qk head size
    flat_k = key_cache.reshape(nb * h * bs, hs)
    flat_v = value_cache.reshape(nb * h * bs, hs_v)
    flat_k = flat_k.at[rows].set(kq, mode="drop", unique_indices=True)
    flat_v = flat_v.at[rows].set(vq, mode="drop", unique_indices=True)
    return (flat_k.reshape(key_cache.shape),
            flat_v.reshape(value_cache.shape))


@register_op("reshape_and_cache_tpu_fused", "cache")
def reshape_and_cache_tpu_fused(
    key: jax.Array,              # [T, H, hs_k]
    value: jax.Array,            # [T, H, hs_v]
    kv_cache: jax.Array,         # [nb, H, bs, hs_k + hs_v]
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    unique_pages: bool = False,
):
    """Scatter K|V tokens into the FUSED page layout
    ``[num_blocks, H, block_size, hs_k + hs_v]`` (K in ``[..., :hs_k]``).
    One page is one DMA in the decode kernel
    (kernels/flash_attention.py), and the token write is ONE row scatter
    instead of the split layout's two.  Returns kv_cache.

    ``unique_pages``: the caller asserts every live slot lands on a
    DIFFERENT page (true for decode batches — one row per sequence);
    eligible shapes then take a Pallas page-window read-merge-write
    kernel instead of the XLA row scatter (row-granular scatters lower
    to sequential dynamic-update-slices, ~25 us/layer at 8B decode)."""
    nb, h, bs, hs = kv_cache.shape
    hs_k = key.shape[-1]
    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(kv_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(kv_cache.dtype)
    assert hs_k + vq.shape[-1] == hs
    kv = jnp.concatenate([kq, vq], axis=-1)                   # [T, H, hs]

    from vllm_xpu_kernels_tpu.registry import use_pallas
    from vllm_xpu_kernels_tpu.envs import VXK_CACHE_WINDOW_SCATTER

    if (unique_pages and use_pallas() and VXK_CACHE_WINDOW_SCATTER()
            and bs % 8 == 0 and hs % 128 == 0
            and kv_cache.dtype == jnp.bfloat16):
        from vllm_xpu_kernels_tpu.kernels.cache import (
            scatter_fused_rows_pallas)

        return scatter_fused_rows_pallas(kv_cache, kv, slot_mapping)

    idx = _slots(slot_mapping, nb * bs)
    block = idx // bs
    off = idx % bs
    rows = (block[:, None] * (h * bs) + jnp.arange(h)[None, :] * bs
            + off[:, None])                                   # [T, H]
    rows = jnp.where((idx < nb * bs)[:, None], rows, nb * h * bs)
    flat = kv_cache.reshape(nb * h * bs, hs)
    flat = flat.at[rows].set(kv, mode="drop", unique_indices=True)
    return flat.reshape(kv_cache.shape)


def quantize_for_kv_cache(x, kv_cache_dtype, scale, cache_dtype):
    """Quantize values exactly as the reshape_and_cache family would
    before storing (helper for the fresh-KV decode fast path, which
    hands pre-quantized rows straight to the attention kernel)."""
    return _maybe_quant(x, kv_cache_dtype, scale).astype(cache_dtype)


def scatter_fused_rows(kv_cache, kv_rows, slot_mapping):
    """Scatter pre-quantized fused (K|V) rows [B, H, hs] into the fused
    page layout at ``slot_mapping`` (negative = skip) — the scatter twin
    of the decode kernel's in-kernel row write.  Returns kv_cache."""
    nb, h, bs, hs = kv_cache.shape
    idx = _slots(slot_mapping, nb * bs)
    rows = (idx[:, None] // bs * (h * bs) + jnp.arange(h)[None, :] * bs
            + idx[:, None] % bs)
    rows = jnp.where((idx < nb * bs)[:, None], rows, nb * h * bs)
    flat = kv_cache.reshape(nb * h * bs, hs)
    flat = flat.at[rows].set(kv_rows.astype(kv_cache.dtype), mode="drop",
                             unique_indices=True)
    return flat.reshape(kv_cache.shape)


@register_op("reshape_and_cache_tpu_prefill", "cache")
def reshape_and_cache_tpu_prefill(
    key: jax.Array,              # [T, H, hs] packed varlen
    value: jax.Array,
    key_cache: jax.Array,        # [nb, H, bs, hs]
    value_cache: jax.Array,
    block_table: jax.Array,      # [B, max_blocks]
    cu_seqlens_q: jax.Array,     # [B+1]
    max_seqlen_q: int,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Page-granular cache write for FRESH prefill (every sequence
    starts at position 0, so its tokens fill its pages from offset 0).

    One scatter index per page instead of one per (token, head) row:
    the row scatter costs ~16 ms/step at Llama-3-8B prefill shapes
    (32k scattered rows), this path ~2 ms.  Tail slots of a sequence's
    last partial page receive padding garbage — safe, because attention
    masks ``kpos >= kv_len`` and later decode steps overwrite those
    slots.  NOT safe for chunked continuation (a chunk starting mid-page
    would clobber earlier tokens): callers gate on fresh prefill and
    fall back to ``reshape_and_cache_tpu``.
    """
    from vllm_xpu_kernels_tpu.ops import attention as attn_ops

    nb, h, bs, hs = key_cache.shape
    hs_v = value_cache.shape[-1]
    b = int(cu_seqlens_q.shape[0]) - 1
    mb = -(-max_seqlen_q // bs)
    qp = mb * bs
    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(key_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(
        value_cache.dtype)

    def pages(x, d):
        xp, _, _ = attn_ops._gather_padded_q(x, cu_seqlens_q, b, qp)
        return xp.reshape(b, mb, bs, h, d).transpose(0, 1, 3, 2, 4
                                                     ).reshape(b * mb, h, bs, d)

    q_lens = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    blocks = block_table[:, :mb].astype(jnp.int32).reshape(-1)
    written = (jnp.arange(mb, dtype=jnp.int32)[None, :] * bs
               < q_lens[:, None]).reshape(-1)
    idx = jnp.where(written, blocks, nb)      # nb = out-of-range -> drop
    kc = key_cache.at[idx].set(pages(kq, hs), mode="drop",
                               unique_indices=True)
    vc = value_cache.at[idx].set(pages(vq, hs_v), mode="drop",
                                 unique_indices=True)
    return kc, vc


@register_op("reshape_and_cache_tpu_prefill_fused", "cache")
def reshape_and_cache_tpu_prefill_fused(
    key: jax.Array,              # [T, H, hs_k] packed varlen
    value: jax.Array,            # [T, H, hs_v]
    kv_cache: jax.Array,         # [nb, H, bs, hs_k + hs_v]
    block_table: jax.Array,
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Page-granular FRESH-prefill write into the fused page layout
    (see ``reshape_and_cache_tpu_prefill`` for the safety contract and
    ``reshape_and_cache_tpu_fused`` for the layout).  Returns kv_cache."""
    from vllm_xpu_kernels_tpu.ops import attention as attn_ops

    nb, h, bs, hs = kv_cache.shape
    b = int(cu_seqlens_q.shape[0]) - 1
    mb = -(-max_seqlen_q // bs)
    qp = mb * bs
    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(kv_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(kv_cache.dtype)
    kv = jnp.concatenate([kq, vq], axis=-1)                   # [T, H, hs]
    kvp, _, _ = attn_ops._gather_padded_q(kv, cu_seqlens_q, b, qp)
    pages = kvp.reshape(b, mb, bs, h, hs).transpose(
        0, 1, 3, 2, 4).reshape(b * mb, h, bs, hs)

    q_lens = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    blocks = block_table[:, :mb].astype(jnp.int32).reshape(-1)
    written = (jnp.arange(mb, dtype=jnp.int32)[None, :] * bs
               < q_lens[:, None]).reshape(-1)
    idx = jnp.where(written, blocks, nb)
    return kv_cache.at[idx].set(pages, mode="drop", unique_indices=True)


@register_op("reshape_and_cache", "cache")
def reshape_and_cache(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Legacy vectorized layout: key_cache ``[blocks, H, hs/x, bs, x]``,
    value_cache ``[blocks, H, hs, bs]`` (cache.cpp:18-109, schema
    csrc/torch_bindings.cpp:246-252).  Returns (key_cache, value_cache)."""
    nb, h, hsx, bs, x = key_cache.shape
    hs = hsx * x
    idx = _slots(slot_mapping, nb * bs)
    block = idx // bs
    off = jnp.where(idx >= nb * bs, bs, idx % bs)

    kq = _maybe_quant(key, kv_cache_dtype, k_scale).astype(key_cache.dtype)
    vq = _maybe_quant(value, kv_cache_dtype, v_scale).astype(value_cache.dtype)
    # key [T, H, hs] -> [T, H, hs/x, x]
    kq = kq.reshape(-1, h, hsx, x)
    key_cache = key_cache.at[block, :, :, off, :].set(kq, mode="drop")
    # value [T, H, hs]
    value_cache = value_cache.at[block, :, :, off].set(vq, mode="drop")
    return key_cache, value_cache


@register_op("concat_and_cache_mla", "cache")
def concat_and_cache_mla(
    kv_c: jax.Array,
    k_pe: jax.Array,
    kv_cache: jax.Array,
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    scale: jax.Array | None = None,
):
    """DeepSeek MLA: concat latent kv_c [T, lora_rank] + k_pe [T, pe_dim]
    into cache [blocks, bs, lora_rank+pe_dim] (cache.cpp:336-416, schema
    csrc/torch_bindings.cpp:266-272).  Returns kv_cache."""
    nb, bs, entry = kv_cache.shape
    flat = kv_cache.reshape(nb * bs, entry)
    tok = jnp.concatenate([kv_c, k_pe], axis=-1)
    tok = _maybe_quant(tok, kv_cache_dtype, scale).astype(kv_cache.dtype)
    idx = _slots(slot_mapping, nb * bs)
    return flat.at[idx].set(tok, mode="drop").reshape(kv_cache.shape)


def _token_coords(cu_seq_lens, num_tokens, seq_starts=None):
    """Map each output token -> (seq_id, position within gathered span)."""
    tok = jnp.arange(num_tokens, dtype=jnp.int32)
    seq_id = jnp.searchsorted(cu_seq_lens.astype(jnp.int32), tok, side="right") - 1
    pos = tok - cu_seq_lens.astype(jnp.int32)[seq_id]
    if seq_starts is not None:
        pos = pos + seq_starts.astype(jnp.int32)[seq_id]
    return seq_id, pos


@register_op("gather_cache", "cache")
def gather_cache(
    src_cache: jax.Array,
    block_table: jax.Array,
    cu_seq_lens: jax.Array,
    num_tokens: int,
    seq_starts: jax.Array | None = None,
):
    """Gather paged blocks into a contiguous [num_tokens, ...] buffer
    (cache.cpp:417-528, schema csrc/torch_bindings.cpp:275-278).

    ``num_tokens`` (== dst.shape[0] in the reference) must be static."""
    bs = src_cache.shape[1]
    seq_id, pos = _token_coords(cu_seq_lens, num_tokens, seq_starts)
    blk = block_table.astype(jnp.int32)[seq_id, pos // bs]
    return src_cache[blk, pos % bs]


@register_op("gather_and_maybe_dequant_cache", "cache")
def gather_and_maybe_dequant_cache(
    src_cache: jax.Array,
    block_table: jax.Array,
    cu_seq_lens: jax.Array,
    token_to_seq: jax.Array,
    num_tokens: int,
    kv_cache_dtype: str = "auto",
    scale: jax.Array | None = None,
    seq_starts: jax.Array | None = None,
    out_dtype=jnp.bfloat16,
):
    """gather_cache + optional FP8 dequant, with an explicit token→seq map
    (cache.cpp:754-856, schema csrc/torch_bindings.cpp:312-320)."""
    bs = src_cache.shape[1]
    seq_id = token_to_seq.astype(jnp.int32)[:num_tokens]
    pos = (jnp.arange(num_tokens, dtype=jnp.int32)
           - cu_seq_lens.astype(jnp.int32)[seq_id])
    if seq_starts is not None:
        pos = pos + seq_starts.astype(jnp.int32)[seq_id]
    blk = block_table.astype(jnp.int32)[seq_id, pos // bs]
    vals = src_cache[blk, pos % bs]
    return _dequant(vals, kv_cache_dtype, scale, out_dtype)


@register_op("swap_blocks", "cache")
def swap_blocks(src: jax.Array, dst: jax.Array, block_mapping: jax.Array):
    """Copy whole cache blocks src->dst per [N,2] (src_block, dst_block)
    pairs (cache.cpp:1269-1395, schema csrc/torch_bindings.cpp:288-291).
    Device-to-device version; host staging is handled by the runtime layer
    (vllm_xpu_kernels_tpu/runtime).  Returns dst."""
    src_idx = block_mapping[:, 0].astype(jnp.int32)
    dst_idx = block_mapping[:, 1].astype(jnp.int32)
    return dst.at[dst_idx].set(src[src_idx].astype(dst.dtype), mode="drop")


@register_op("swap_blocks_batch", "cache")
def swap_blocks_batch(srcs, dsts, mappings):
    """Batch variant (csrc/torch_bindings.cpp:294-297): applies swap_blocks
    over a list of (src, dst, mapping) triples."""
    return [swap_blocks(s, d, m) for s, d, m in zip(srcs, dsts, mappings)]


# ---------------------------------------------------------------------------
# DeepSeek-V3.2 indexer K cache
# ---------------------------------------------------------------------------


@register_op("indexer_k_quant_and_cache", "cache")
def indexer_k_quant_and_cache(
    k: jax.Array,
    k_cache_fp8: jax.Array,
    k_cache_scale: jax.Array,
    slot_mapping: jax.Array,
    quant_block_size: int,
    scale_fmt: str = "fp32",
):
    """DeepSeek indexer: per-``quant_block_size``-group FP8 quant of K into
    the paged indexer cache (cache.cpp:529-614, schema
    csrc/torch_bindings.cpp:298-302).

    scale = max(absmax, 1e-4)/448, optionally UE8M0-rounded when
    ``scale_fmt == 'ue8m0'`` (cache.cpp:580-584).  Cache is the structured
    pair (fp8 values ``[blocks, bs, head_dim]``, scales
    ``[blocks, bs, head_dim/quant_block]``) — semantically identical to the
    reference's byte-aliased single buffer.  Returns the updated pair.
    """
    t, head_dim = k.shape
    ng = head_dim // quant_block_size
    g = k.astype(jnp.float32).reshape(t, ng, quant_block_size)
    amax = jnp.max(jnp.abs(g), axis=-1)
    s = jnp.maximum(amax, 1e-4) / qm.FP8_E4M3_MAX
    if scale_fmt == "ue8m0":
        s = qm.ue8m0_round(s)
    q = jnp.clip(g / s[..., None], -qm.FP8_E4M3_MAX, qm.FP8_E4M3_MAX).astype(
        k_cache_fp8.dtype
    )

    nb, bs = k_cache_fp8.shape[0], k_cache_fp8.shape[1]
    idx = _slots(slot_mapping, nb * bs)
    flat_q = k_cache_fp8.reshape(nb * bs, head_dim)
    flat_s = k_cache_scale.reshape(nb * bs, ng)
    flat_q = flat_q.at[idx].set(q.reshape(t, head_dim), mode="drop")
    flat_s = flat_s.at[idx].set(s.astype(k_cache_scale.dtype), mode="drop")
    return flat_q.reshape(k_cache_fp8.shape), flat_s.reshape(k_cache_scale.shape)


@register_op("cp_gather_indexer_k_quant_cache", "cache")
def cp_gather_indexer_k_quant_cache(
    k_cache_fp8: jax.Array,
    k_cache_scale: jax.Array,
    block_table: jax.Array,
    cu_seq_lens: jax.Array,
    num_tokens: int,
):
    """Gather quantized indexer-K + scales back to contiguous buffers
    (context-parallel gather path; cache.cpp:615-753, schema
    csrc/torch_bindings.cpp:303-309).  Returns (dst_k, dst_scale)."""
    bs = k_cache_fp8.shape[1]
    seq_id, pos = _token_coords(cu_seq_lens, num_tokens)
    blk = block_table.astype(jnp.int32)[seq_id, pos // bs]
    return k_cache_fp8[blk, pos % bs], k_cache_scale[blk, pos % bs]

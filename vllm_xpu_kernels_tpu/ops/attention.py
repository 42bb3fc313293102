"""Flash attention family — TPU-native replacement of the reference's
``_vllm_fa2_C.varlen_fwd`` stack (reference: csrc/flash_attn/flash_api.cpp:95-456,
chunk-prefill kernel csrc/xpu/attn/xe_2/kernel/chunk_prefill_kernel.hpp,
split-KV decode kernel paged_decode_kernel.hpp, Python front-end
vllm_xpu_kernels/flash_attn_interface.py:284-470; golden numerics per
tests/flash_attn/test_flash_attn_varlen_func.py ``ref_paged_attn``).

Feature parity: varlen packed Q; paged (block-table) or packed KV; causal
(bottom-right aligned); sliding window (left/right); attention sinks
(StreamingLLM ``s_aux``); softcap; GQA; FP8 KV cache with k/v descale; MLA
shapes (head_size_qk != head_size_vo); optional LSE output for distributed
merging; split-KV decode with a host-built work plan.

TPU-first design:

- ONE functional entry (`flash_attn_varlen_func`) with static shapes:
  ``max_seqlen_q`` / ``max_seqlen_k`` bound the padded compute; XLA jit
  caches one executable per shape bucket — the trace-time analogue of the
  reference's 216+384 precompiled kernel variants.
- decode (max_seqlen_q == 1) routes to a Pallas split-KV kernel that reads
  pages from HBM by block table (kernels/flash_attention.py); prefill/mixed
  routes to a Pallas chunked kernel.  Both emit (O, LSE) so cross-device /
  cross-chunk merging composes (reference: merge_attn_states, used for
  chunked prefill and CP).
- the pure-jnp reference twin implements the exact golden semantics and
  serves CPU tests and fallback (reference: _fallback_varlen_attn,
  flash_attn_interface.py:448-470).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op, use_pallas, mosaic_safe

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# host-side split planning (reference: build_decode_split_plan,
# flash_attn_interface.py:83-161; design doc docs/group_split_kv_design.md)
# ---------------------------------------------------------------------------


def build_decode_split_plan(
    kv_lens,
    kv_tile: int,
    num_kv_splits: int,
    num_cores: int = 8,
    num_heads_kv: int = 8,
):
    """Balanced per-seq split counts for split-KV decode.

    Pure-python host planning (the reference plans on host too).  Returns
    ``splits_per_seq`` (list[int], >= 1, <= num_kv_splits) with the same
    correctness contract as the reference: splits partition each sequence's
    KV tiles exactly, every split has >= 1 tile.

    On TPU the work list itself is not needed — the Pallas decode kernel
    uses a dense (seq, split) grid and masks empty splits — so only the
    per-seq split counts matter for how work is balanced.
    """
    kv_lens_list = [int(v) for v in kv_lens]
    tiles_per_seq = [max(1, -(-kv // kv_tile)) for kv in kv_lens_list]
    total_tiles = sum(tiles_per_seq)
    min_wgs = max(1, num_cores * 2 // max(1, num_heads_kv))
    target = max(4, total_tiles // min_wgs)
    min_blocks_for_split = 32 if kv_tile <= 64 else 128
    splits = []
    for n_tiles in tiles_per_seq:
        if (n_tiles <= target or n_tiles < min_blocks_for_split
                or num_kv_splits <= 1):
            splits.append(1)
        else:
            splits.append(min(-(-n_tiles // target), num_kv_splits, n_tiles))
    return splits


# ---------------------------------------------------------------------------
# pure-jnp reference implementation (golden semantics)
# ---------------------------------------------------------------------------


def _gather_padded_q(q, cu_seqlens_q, batch, qp):
    """packed [T, H, D] -> padded [B, Qp, H, D] plus validity mask [B, Qp]."""
    t = q.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (batch, qp), 1)
    starts = cu_seqlens_q[:-1][:, None]
    lens = (cu_seqlens_q[1:] - cu_seqlens_q[:-1])[:, None]
    idx = starts + pos
    valid = pos < lens
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    qpad = jnp.take(q, idx.reshape(-1), axis=0).reshape(
        batch, qp, *q.shape[1:])
    return qpad, valid, jnp.clip(idx, 0, max(t - 1, 0))


def _gather_padded_kv_paged(cache, block_table, kp):
    """paged [nb, bs, Hkv, D] + table [B, max_blocks] -> [B, Kp, Hkv, D]."""
    bs = cache.shape[1]
    nblk = min(-(-kp // bs), block_table.shape[1])
    tbl = block_table[:, :nblk]
    gathered = jnp.take(cache, tbl, axis=0)  # [B, nblk, bs, Hkv, D]
    b = tbl.shape[0]
    out = gathered.reshape(b, nblk * bs, *cache.shape[2:])
    if nblk * bs < kp:  # table shorter than the padded kv extent
        out = jnp.concatenate([
            out,
            jnp.zeros((b, kp - nblk * bs, *cache.shape[2:]), cache.dtype),
        ], axis=1)
    return out[:, :kp]


def _gather_padded_kv_packed(kv, cu_seqlens_k, batch, kp):
    pos = jax.lax.broadcasted_iota(jnp.int32, (batch, kp), 1)
    starts = cu_seqlens_k[:-1][:, None]
    idx = jnp.clip(starts + pos, 0, kv.shape[0] - 1).astype(jnp.int32)
    return jnp.take(kv, idx.reshape(-1), axis=0).reshape(
        batch, kp, *kv.shape[1:])


def _attn_padded(
    qpad,           # [B, Qp, Hq, D]   (already includes any q scaling? no)
    kpad,           # [B, Kp, Hkv, D]
    vpad,           # [B, Kp, Hkv, Dv]
    q_lens,         # [B]
    kv_lens,        # [B]
    scale: float,
    causal: bool,
    window: tuple[int, int],
    softcap: float,
    sink: Optional[jax.Array],          # [Hq]
    k_descale: Optional[jax.Array],
    v_descale: Optional[jax.Array],
):
    """Exact golden math on padded per-seq layout
    (mirrors ref_paged_attn,
    tests/flash_attn/test_flash_attn_varlen_func.py:30-126).

    Returns (out [B, Qp, Hq, Dv], lse [B, Hq, Qp]).
    """
    b, qp, hq, d = qpad.shape
    kp, hkv = kpad.shape[1], kpad.shape[2]
    g = hq // hkv
    kf = kpad.astype(jnp.float32)
    vf = vpad.astype(jnp.float32)
    if k_descale is not None:
        kf = kf * k_descale
    if v_descale is not None:
        vf = vf * v_descale
    qf = qpad.astype(jnp.float32) * scale
    # logits [B, Hq, Qp, Kp]; GQA: fold group into head index
    qf = qf.reshape(b, qp, hkv, g, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf)
    logits = logits.reshape(b, hq, qp, kp)
    if softcap and softcap != 0.0:
        logits = softcap * jnp.tanh(logits / softcap)
    # masks — bottom-right aligned diagonals (golden: mask offsets use
    # kv_len - query_len)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, qp, kp), 2)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, qp, kp), 3)
    off = (kv_lens - q_lens).reshape(b, 1, 1, 1)  # diag offset per seq
    neg = jnp.finfo(jnp.float32).min
    mask = kpos >= kv_lens.reshape(b, 1, 1, 1)  # kv padding
    wl, wr = window
    if wl >= 0 or wr >= 0:
        if wr >= 0:
            mask = mask | (kpos > qpos + off + wr)
        if wl >= 0:
            mask = mask | (kpos < qpos + off - wl)
    if causal:
        mask = mask | (kpos > qpos + off)
    logits = jnp.where(mask, neg, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    if sink is not None:
        m = jnp.maximum(m, sink.reshape(1, hq, 1, 1))
    m = jnp.maximum(m, -3.0e38)  # rows that are fully masked
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if sink is not None:
        l = l + jnp.exp(sink.reshape(1, hq, 1, 1) - m)
    l = jnp.maximum(l, 1e-38)
    attn = p / l
    attn = attn.reshape(b, hkv, g, qp, kp)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", attn, vf)
    out = out.reshape(b, qp, hq, -1)
    lse = (m + jnp.log(l)).reshape(b, hq, qp)
    return out, lse


@register_op("merge_attn_states", "attention")
def merge_attn_states(
    prefix_output: jax.Array,   # [T, H, D]
    prefix_lse: jax.Array,      # [H, T]
    suffix_output: jax.Array,   # [T, H, D]
    suffix_lse: jax.Array,      # [H, T]
):
    """LSE-weighted merge of two partial attention results — the primitive
    for split-KV / chunked-context / cross-device attention
    (reference: csrc/attention/merge_attn_states.cpp:15-247, schema
    csrc/torch_bindings.cpp:230-241; paper 2501.01005 §2.2).

    Returns (output [T, H, D], lse [H, T]).
    """
    p_lse = prefix_lse.astype(jnp.float32)
    s_lse = suffix_lse.astype(jnp.float32)
    # inf lse (fully-masked partial) contributes zero weight
    p_lse = jnp.where(jnp.isinf(p_lse), jnp.finfo(jnp.float32).min, p_lse)
    s_lse = jnp.where(jnp.isinf(s_lse), jnp.finfo(jnp.float32).min, s_lse)
    m = jnp.maximum(p_lse, s_lse)
    pe = jnp.exp(p_lse - m)
    se = jnp.exp(s_lse - m)
    denom = pe + se
    out_lse = m + jnp.log(denom)
    wp = (pe / denom).T[:, :, None]   # [T, H, 1]
    ws = (se / denom).T[:, :, None]
    out = (prefix_output.astype(jnp.float32) * wp
           + suffix_output.astype(jnp.float32) * ws)
    return out.astype(prefix_output.dtype), out_lse


@register_op("flash_attn_varlen_func", "attention")
def flash_attn_varlen_func(
    q: jax.Array,                     # [total_q, Hq, D]
    k: jax.Array,       # paged [nb, bs, Hkv, D] | packed [total_k, Hkv, D]
    v: jax.Array,                     # paged [nb, bs, Hkv, Dv] | packed
    max_seqlen_q: int,
    cu_seqlens_q: jax.Array,          # [B+1] int32
    max_seqlen_k: int,
    cu_seqlens_k: Optional[jax.Array] = None,
    seqused_k: Optional[jax.Array] = None,   # [B] kv lens (paged path)
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Optional[tuple[int, int]] = None,
    softcap: float = 0.0,
    block_table: Optional[jax.Array] = None,  # [B, max_blocks] int32
    return_softmax_lse: bool = False,
    k_descale: Optional[jax.Array] = None,
    v_descale: Optional[jax.Array] = None,
    s_aux: Optional[jax.Array] = None,        # [Hq] attention sinks
    num_splits_kv: Optional[int] = None,
    kv_layout: str = "bshd",                  # paged cache layout, see below
    fresh_kv: Optional[jax.Array] = None,     # [B, Hkv, Dk+Dv] new-token row
    fresh_slots: Optional[jax.Array] = None,  # [B] cache slots (<0 = skip)
    out_quant: bool = False,                  # fused int8 output quant
    v_head_dim: Optional[int] = None,         # fused pages: explicit Dv
    v_lane_offset: Optional[int] = None,      # fused pages: V start lane
):
    """Varlen flash attention with optional paged KV — the reference's
    single public attention entry (flash_attn_interface.py:284,
    flash_api.cpp:439-456).  See module docstring for feature parity.

    ``max_seqlen_q``/``max_seqlen_k`` are static ints (jit specialization
    keys).  Returns out [total_q, Hq, Dv] (+ lse [Hq, total_q]).

    ``kv_layout``: "bshd" (reference flash layout [nb, bs, Hkv, D]),
    "bhsd" (TPU-native page layout [nb, Hkv, bs, D]), or "fused"
    (TPU-native fused pages [nb, Hkv, bs, Dk+Dv] — pass ``v=None``; one
    DMA per page in the decode kernel).

    ``fresh_kv`` (decode + fused layout only): the current token's
    quantized (K|V) row, with ``seqused_k`` counting it.  Instead of
    requiring the row scattered into the cache *before* attention (the
    reference's reshape_and_cache -> varlen_fwd ordering), the decode
    kernel folds it into the online-softmax epilogue; the cache-row
    write happens inside the kernel (in-place alias) or as an
    off-critical-path scatter.  The updated cache is an ADDITIONAL
    (last) return value.

    ``out_quant``: request fused per-token dynamic int8 quant of the
    attention output (for int8 o-projections).  When set, every return's
    ``out`` element becomes a PAIR ``(out, scale)``: ``scale`` is the
    per-token [total_q] f32 quant scale and ``out`` is int8 when the
    fused epilogue ran, or ``(out_bf16, None)`` when the executing path
    cannot fuse (caller quantizes itself).

    ``v_head_dim`` (fused layout): explicit Dv when the page lane width
    exceeds Dk+Dv — the MLA absorbed-latent layout stores
    [K(576) | V(512) | zero pad] in 1152-lane pages so decode takes the
    one-DMA-per-page kernel.  Pad lanes must be kept zero (zero-init +
    row writes that only touch [: Dk+Dv]).

    ``v_lane_offset`` (fused layout): lane where V starts (default Dk).
    The absorbed-latent layout V OVERLAPS K (a page row is
    [c_kv(512) | k_pe(64) | pad], K = all 576 payload lanes, V = the
    first 512) — pass v_lane_offset=0, v_head_dim=512.  Decode only
    (the dma kernel's padded-q path).
    """
    assert (cu_seqlens_k is None) != (seqused_k is None), (
        "provide exactly one of cu_seqlens_k / seqused_k")
    if block_table is not None:
        assert seqused_k is not None, "paged KV requires seqused_k"
    paged = block_table is not None
    if kv_layout == "fused":
        assert paged and v is None, (
            "kv_layout='fused' takes the fused paged cache as k (v=None)")
    if fresh_kv is not None:
        assert paged and max_seqlen_q == 1 and kv_layout == "fused", (
            "fresh_kv is a decode fast path over the fused page layout")
        assert fresh_slots is not None, "fresh_kv requires fresh_slots"
    if softmax_scale is None:
        softmax_scale = q.shape[-1] ** -0.5
    window = (-1, -1) if window_size is None else tuple(window_size)
    batch = int(cu_seqlens_q.shape[0]) - 1

    if use_pallas():
        from vllm_xpu_kernels_tpu.kernels import flash_attention as fa

        in_dtype = q.dtype
        q, k = mosaic_safe(q), mosaic_safe(k)
        v = mosaic_safe(v) if v is not None else None
        # Padded-lane routing for non-lane-aligned head sizes (the
        # reference sweeps head 80/96/120, tests/test_cache.py:21): pad D
        # and Dv up to the next 128-lane multiple with zeros (exact: zero
        # K lanes add 0 to every logit, zero V lanes slice away) so the
        # kernels run on their aligned fast paths.  d % 128 == 64 (head
        # 64, MLA 192/576) keeps the proven half-lane pipelined route.
        # Byte cost of this call: lane bytes inflate by ceil(d/128)*128/d
        # (head 80 -> 1.6x, 96 -> 1.33x, 120 -> 1.07x); serving layers
        # should allocate padded caches up front to avoid the per-call
        # pad copy of K/V.
        dv_sl = None
        if kv_layout != "fused":
            d_o, dv_o = q.shape[-1], v.shape[-1]
            _odd = lambda dd: dd % 128 not in (0, 64)
            if _odd(d_o) or _odd(dv_o):
                def _pad_to(x, dp):
                    return jnp.pad(
                        x, ((0, 0),) * (x.ndim - 1) + ((0, dp - x.shape[-1]),))
                dp = (-(-d_o // 128) * 128) if _odd(d_o) else d_o
                dvp = (-(-dv_o // 128) * 128) if _odd(dv_o) else dv_o
                q, k, v = _pad_to(q, dp), _pad_to(k, dp), _pad_to(v, dvp)
                dv_sl = dv_o
        if paged and kv_layout == "bshd":
            # The Pallas kernels consume the TPU-native page layout
            # [nb, Hkv, bs, D] (exact Mosaic tiles, one DMA per (head,
            # page)).  The reference "flash" layout [nb, bs, Hkv, D]
            # (cache.cpp reshape_and_cache_flash) is accepted for parity
            # but transposed here — serving code should allocate caches
            # with kv_layout="bhsd" and skip this copy.
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
        if paged and max_seqlen_q == 1:
            res = list(fa.paged_decode(
                q, k, v, cu_seqlens_q, seqused_k, block_table,
                scale=softmax_scale, window=window, softcap=softcap,
                sink=s_aux, k_descale=k_descale, v_descale=v_descale,
                max_seqlen_k=max_seqlen_k,
                num_splits_kv=num_splits_kv or 0,
                fresh_kv=fresh_kv, fresh_slots=fresh_slots,
                out_quant=out_quant, v_head_dim=v_head_dim,
                v_lane_offset=v_lane_offset,
            ))
            out, lse = res.pop(0), res.pop(0)
            # paged_decode emits [out, lse, scale (only when the fused
            # epilogue ran), new_cache (only in fresh mode)]
            o_scale = res.pop(0) if len(res) == (2 if fresh_kv is not None
                                                 else 1) else None
            if dv_sl is not None:
                out = out[..., :dv_sl]   # drop the zero pad lanes
            if o_scale is None:
                out = out.astype(in_dtype)
            if out_quant:
                out = (out, o_scale)
            if fresh_kv is not None:
                if return_softmax_lse:
                    return out, lse, res[0]
                return out, res[0]
            if return_softmax_lse:
                return out, lse
            return out
        if kv_layout == "fused" and v_head_dim is not None:
            # padded MLA pages: the chunk-prefill kernel wants split
            # K/V (one XLA slice each; absorbed-latent PREFILL is the
            # rare path — decode is what the padded layout serves)
            d_ = q.shape[-1]
            k, v = k[..., :d_], k[..., d_:d_ + v_head_dim]
        out, lse = fa.chunk_prefill(
            q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_k, block_table,
            max_seqlen_q=max_seqlen_q, max_seqlen_k=max_seqlen_k,
            scale=softmax_scale, causal=causal, window=window,
            softcap=softcap, sink=s_aux,
            k_descale=k_descale, v_descale=v_descale,
        )
        if dv_sl is not None:
            out = out[..., :dv_sl]       # drop the zero pad lanes
        out = out.astype(in_dtype)
        if out_quant:
            out = (out, None)
        if return_softmax_lse:
            return out, lse
        return out

    # ---- jnp reference path --------------------------------------------
    new_cache = None
    if fresh_kv is not None:
        # reference semantics: scatter the quantized row first, attend
        # over the full length (what the kernel fast path fuses away)
        from vllm_xpu_kernels_tpu.ops.cache import scatter_fused_rows

        k = scatter_fused_rows(k, fresh_kv, fresh_slots)
        new_cache = k
    if paged and kv_layout == "fused":
        d = q.shape[-1]
        dv_ = v_head_dim or (k.shape[-1] - d)
        vo = d if v_lane_offset is None else v_lane_offset
        k, v = k[..., :d], k[..., vo:vo + dv_]
        kv_layout = "bhsd"
    if paged and kv_layout == "bhsd":
        k = k.transpose(0, 2, 1, 3)   # -> bshd for the padded gather
        v = v.transpose(0, 2, 1, 3)
    t = q.shape[0]
    qp = max_seqlen_q
    kp = min(max_seqlen_k,
             (k.shape[0] * k.shape[1]) if paged else k.shape[0])
    q_lens = cu_seqlens_q[1:] - cu_seqlens_q[:-1]
    qpad, qvalid, _ = _gather_padded_q(q, cu_seqlens_q, batch, qp)
    if paged:
        kv_lens = seqused_k
        kpad = _gather_padded_kv_paged(k, block_table, kp)
        vpad = _gather_padded_kv_paged(v, block_table, kp)
    else:
        kv_lens = cu_seqlens_k[1:] - cu_seqlens_k[:-1]
        kpad = _gather_padded_kv_packed(k, cu_seqlens_k, batch, kp)
        vpad = _gather_padded_kv_packed(v, cu_seqlens_k, batch, kp)
    out_pad, lse_pad = _attn_padded(
        qpad, kpad, vpad, q_lens, kv_lens, softmax_scale, causal, window,
        softcap, s_aux, k_descale, v_descale)
    # repack [B, Qp, Hq, Dv] -> [total_q, Hq, Dv]
    seq_of_row, pos_of_row = _row_maps(cu_seqlens_q, t, batch)
    out = out_pad[seq_of_row, pos_of_row].astype(q.dtype)
    if out_quant:
        out = (out, None)   # reference tier: caller quantizes
    if return_softmax_lse:
        lse = lse_pad[seq_of_row, :, pos_of_row].T  # [Hq, total_q]
        return (out, lse, new_cache) if new_cache is not None else (out, lse)
    return (out, new_cache) if new_cache is not None else out


def _row_maps(cu_seqlens_q, total_q, batch):
    """global q row -> (seq index, position within seq)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (total_q, 1), 0)[:, 0]
    seq_of_row = (jnp.searchsorted(cu_seqlens_q, rows, side="right") - 1
                  ).astype(jnp.int32)
    seq_of_row = jnp.clip(seq_of_row, 0, batch - 1)
    pos_of_row = rows - cu_seqlens_q[seq_of_row]
    return seq_of_row, pos_of_row

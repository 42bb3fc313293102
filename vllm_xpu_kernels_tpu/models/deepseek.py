"""DeepSeek-V2-Lite-family decoder: MLA attention + node-limited MoE.

Exercises the DeepSeek-specific op surface end to end (BASELINE config #5):
``deepseek_scaling_rope`` (YaRN cos/sin cache), MLA head shapes
(head_qk = qk_nope + qk_rope ≠ head_vo) through the paged attention
kernels, ``concat_and_cache_mla``-style latents at the op level, and
``grouped_topk`` + shared experts through the fused MoE pipeline.

MLA here follows the reference kernels' contract — the expanded per-head
K [H, 192] / V [H, 128] live in the paged cache (the reference's MLA
decode test shapes, tests/flash_attn/test_mla_decode.py); weight-absorbed
latent-cache decode is a serving-layer optimization on top of the same
attention op.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.models import llama as L


@dataclasses.dataclass(frozen=True)
class DeepSeekConfig(L.LlamaConfig):
    hidden_size: int = 2048
    num_layers: int = 4
    num_q_heads: int = 16
    num_kv_heads: int = 16          # MLA is MHA over expanded heads
    qk_nope_dim: int = 128
    qk_rope_dim: int = 64
    v_head_dim: int = 128
    kv_lora_rank: int = 512
    num_experts: int = 64
    num_shared_experts: int = 2
    top_k: int = 6
    n_group: int = 8
    topk_group: int = 3
    moe_intermediate: int = 1408
    routed_scaling_factor: float = 1.0
    # DeepSeek-V3.2 sparse attention (DSA) indexer: 0 = dense attention;
    # >0 = decode attends only to the index_topk highest-scoring KV tokens
    # selected by the fp8 MQA indexer (reference op family §2.7:
    # csrc/xpu/mqa_logits/, csrc/topk_per_row.cpp, indexer cache ops
    # csrc/cache.cpp:529-753).
    index_topk: int = 0
    index_n_heads: int = 8
    index_head_dim: int = 64
    # weight-absorbed latent decode (DeepSeek-V3 serving mode): the
    # paged cache holds ONE latent row [c_kv(r) | k_pe(rope)] per token
    # (H-fold smaller than the expanded cache) and decode attention runs
    # at the absorbed 576/512 shape (q' = [q_nope @ W_uk | q_rope],
    # V = the c_kv half of the page) on the padded-fused dma kernel
    # (ops.flash_attn_varlen_func v_head_dim/v_lane_offset).
    absorbed: bool = False

    @property
    def qk_head_dim(self):
        return self.qk_nope_dim + self.qk_rope_dim


def init_params(cfg: DeepSeekConfig, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    e = cfg.hidden_size
    h = cfg.num_q_heads
    dqk, dv = cfg.qk_head_dim, cfg.v_head_dim
    r = cfg.kv_lora_rank
    mi = cfg.moe_intermediate

    def lin(k, fi, fo):
        return (jax.random.normal(k, (fi, fo), jnp.float32)
                * (2.0 / (fi + fo)) ** 0.5).astype(cfg.jdtype)

    keys = iter(jax.random.split(key, cfg.num_layers * 15 + 2))
    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "ln1": jnp.ones((e,), cfg.jdtype),
            "ln2": jnp.ones((e,), cfg.jdtype),
            "wq": lin(next(keys), e, h * dqk),
            "w_dkv": lin(next(keys), e, r + cfg.qk_rope_dim),
            "kv_ln": jnp.ones((r,), cfg.jdtype),
            "w_uk": lin(next(keys), r, h * cfg.qk_nope_dim),
            "w_uv": lin(next(keys), r, h * dv),
            "wo": lin(next(keys), h * dv, e),
            "router": lin(next(keys), e, cfg.num_experts).astype(jnp.float32),
            "w13": {"w": (jax.random.normal(
                next(keys), (cfg.num_experts, e, 2 * mi), jnp.float32)
                * 0.03).astype(cfg.jdtype)},
            "w2": {"w": (jax.random.normal(
                next(keys), (cfg.num_experts, mi, e), jnp.float32)
                * 0.03).astype(cfg.jdtype)},
            "w13_shared": lin(next(keys), e,
                              2 * mi * cfg.num_shared_experts),
            "w2_shared": lin(next(keys), mi * cfg.num_shared_experts, e),
        }
        if cfg.index_topk > 0:
            hi, di = cfg.index_n_heads, cfg.index_head_dim
            lp["wq_i"] = lin(next(keys), e, hi * di)
            lp["wk_i"] = lin(next(keys), e, di)
            # per-query-head indexer weights projection (f32 gating)
            lp["w_iw"] = lin(next(keys), e, hi).astype(jnp.float32)
        layers.append(lp)
    embed = (jax.random.normal(next(keys), (cfg.vocab_size, e), jnp.float32)
             * 0.02).astype(cfg.jdtype)
    return {
        "layers": layers,
        "embed": embed,
        "final_ln": jnp.ones((e,), cfg.jdtype),
        # YaRN-scaled cos/sin cache over the rope span
        "rope": L._rope_cache(dataclasses.replace(
            cfg, head_dim=cfg.qk_rope_dim)),
    }


def init_kv_cache(cfg: DeepSeekConfig, num_blocks: int):
    """Expanded MLA caches: K [nb, H, bs, qk_head_dim], V [nb, H, bs, dv].

    ``cfg.absorbed``: ONE latent page stack per layer instead —
    [nb, 1, bs, Wpad] rows [c_kv(r) | k_pe(rope) | zero pad], Wpad
    lane-aligned; the v list is all-None (fused-layout convention).
    Cache bytes per token: Wpad vs H*(qk_head_dim + v_head_dim) — 8x
    smaller at the test config, 64x at DeepSeek-V3's H=128."""
    if cfg.absorbed:
        w = cfg.kv_lora_rank + cfg.qk_rope_dim
        wpad = -(-w // 128) * 128
        shape = (num_blocks, 1, cfg.block_size, wpad)
        ks = [jnp.zeros(shape, cfg.jdtype) for _ in range(cfg.num_layers)]
        return ks, [None] * cfg.num_layers
    kshape = (num_blocks, cfg.num_q_heads, cfg.block_size, cfg.qk_head_dim)
    vshape = (num_blocks, cfg.num_q_heads, cfg.block_size, cfg.v_head_dim)
    ks = [jnp.zeros(kshape, cfg.jdtype) for _ in range(cfg.num_layers)]
    vs = [jnp.zeros(vshape, cfg.jdtype) for _ in range(cfg.num_layers)]
    return ks, vs


def _mla_attention_absorbed(cfg, lp, x, positions, rope, kc_l, slot_mapping,
                            block_table, kv_lens, cu_q, max_k):
    """Weight-absorbed latent MLA decode (the DeepSeek-V3 serving mode;
    reference contract: the chunk-prefill kernel's "up to 576/512" MLA
    shapes, chunk_prefill_kernel.hpp:70, exercised by test_mla_decode).

    score(q, k) = q_nope . (W_uk^T c_kv) + q_rope . k_pe
                = (W_uk q_nope) . c_kv + q_rope . k_pe       (absorption)
    out        = softmax . c_kv, then per-head W_uv           (V = c_kv)

    so the paged cache stores ONE [c_kv | k_pe] latent row per token and
    attention runs as 1-kv-head MQA at d_qk = r + rope, d_v = r with V
    overlapping K's first r lanes (v_lane_offset = 0).  Exact same
    logits as the expanded path up to bf16 matmul rounding."""
    t = x.shape[0]
    h = cfg.num_q_heads
    r, rnope, rrope = cfg.kv_lora_rank, cfg.qk_nope_dim, cfg.qk_rope_dim
    dv = cfg.v_head_dim
    wpad = kc_l.shape[-1]
    q = (x @ lp["wq"].astype(x.dtype)).reshape(t, h, cfg.qk_head_dim)
    ckv = x @ lp["w_dkv"].astype(x.dtype)
    c_kv = ops.rms_norm(ckv[:, :r], lp["kv_ln"], cfg.rms_eps)
    k_pe = ckv[:, r:]
    q_rope, k_pe = ops.deepseek_scaling_rope(
        positions, q[..., rnope:], k_pe.reshape(t, 1, rrope),
        rope, rrope, True)
    # absorb W_uk into q: q_abs[t,h,r] = sum_d q_nope[t,h,d] W_uk[r,h,d]
    w_uk = lp["w_uk"].reshape(r, h, rnope)
    q_abs = jnp.einsum("thd,rhd->thr", q[..., :rnope].astype(jnp.float32),
                       w_uk.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    q_lat = jnp.concatenate([q_abs, q_rope.reshape(t, h, rrope)], -1)
    # latent cache row [c_kv | k_pe], zero-padded to the page lane width
    row_k = jnp.concatenate([c_kv, k_pe.reshape(t, rrope)], -1)
    kc_l = ops.reshape_and_cache_tpu_fused(
        row_k.reshape(t, 1, r + rrope),
        jnp.zeros((t, 1, wpad - r - rrope), row_k.dtype),
        kc_l, slot_mapping)
    attn = ops.flash_attn_varlen_func(
        q_lat, kc_l, None, 1, cu_q, max_k,
        seqused_k=kv_lens, block_table=block_table, causal=True,
        kv_layout="fused", softmax_scale=cfg.qk_head_dim ** -0.5,
        v_head_dim=r, v_lane_offset=0)                    # [t, h, r]
    # un-absorb: per-head W_uv projects the attended latent to v space
    w_uv = lp["w_uv"].reshape(r, h, dv)
    o = jnp.einsum("thr,rhd->thd", attn.astype(jnp.float32),
                   w_uv.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = o.reshape(t, h * dv) @ lp["wo"].astype(x.dtype)
    return out.astype(x.dtype), kc_l


def init_indexer_cache(cfg: DeepSeekConfig, num_blocks: int):
    """Per-layer paged indexer-K caches: the structured
    (fp8 values [nb, bs, index_head_dim], f32 per-token scales [nb, bs, 1])
    pair that ops.indexer_k_quant_and_cache maintains."""
    vals = [jnp.zeros((num_blocks, cfg.block_size, cfg.index_head_dim),
                      jnp.float8_e4m3fn) for _ in range(cfg.num_layers)]
    scales = [jnp.zeros((num_blocks, cfg.block_size, 1), jnp.float32)
              for _ in range(cfg.num_layers)]
    return list(zip(vals, scales))


def _indexer_select(cfg, lp, x, ic_l, slot_mapping, block_table, kv_lens):
    """DSA top-k selection for one decode step.

    Quantize+cache this step's indexer K, score the whole paged context
    with the fp8 MQA-logits op, and return (topk token indices [B, K],
    updated indexer cache).  End-to-end wiring of the reference's
    DeepSeek-V3.2 indexer op family (fp8_paged_mqa_logits
    csrc/xpu/mqa_logits/, top_k_per_row_decode csrc/topk_per_row.cpp,
    indexer_k_quant_and_cache csrc/cache.cpp:529-614)."""
    b = x.shape[0]
    hi, di = cfg.index_n_heads, cfg.index_head_dim
    vals, scales = ic_l
    k_i = x @ lp["wk_i"].astype(x.dtype)
    vals, scales = ops.indexer_k_quant_and_cache(
        k_i, vals, scales, slot_mapping, quant_block_size=di)
    q_i = (x @ lp["wq_i"].astype(x.dtype)).reshape(b, 1, hi, di)
    w_i = (x.astype(jnp.float32) @ lp["w_iw"]) * (hi ** -0.5)
    max_model_len = block_table.shape[1] * cfg.block_size
    logits = ops.fp8_paged_mqa_logits(
        q_i, (vals, scales), w_i, kv_lens, block_table, max_model_len)
    topk_idx = ops.top_k_per_row_decode(
        logits, 1, kv_lens, cfg.index_topk)             # [B, K], -1 padded
    return topk_idx, (vals, scales)


def _sparse_gathered_attention(cfg, q, kc_l, vc_l, block_table, topk_idx):
    """Decode attention over only the indexer-selected KV tokens: gather
    the [B, K] selected slots from the paged cache and run a dense
    softmax over K — the sparse-decode analogue of the reference's
    gather_and_maybe_dequant_cache + attention composition."""
    b = q.shape[0]
    bs = cfg.block_size
    safe = jnp.maximum(topk_idx, 0)
    blk = jnp.take_along_axis(
        block_table.astype(jnp.int32), safe // bs, axis=1)  # [B, K]
    off = safe % bs
    # cache layout [nb, H, bs, d] -> k_sel/v_sel [B, K, H, d]
    k_sel = kc_l[blk, :, off, :].astype(jnp.float32)
    v_sel = vc_l[blk, :, off, :].astype(jnp.float32)
    scale = cfg.qk_head_dim ** -0.5
    scores = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32) * scale,
                        k_sel, preferred_element_type=jnp.float32)
    scores = jnp.where((topk_idx >= 0)[:, None, :], scores, float("-inf"))
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", p, v_sel,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _mla_attention(cfg, lp, x, positions, rope, kc_l, vc_l, slot_mapping,
                   block_table, kv_lens, cu_q, max_q, max_k,
                   ic_l=None):
    t = x.shape[0]
    h, dqk, dv = cfg.num_q_heads, cfg.qk_head_dim, cfg.v_head_dim
    rnope, rrope = cfg.qk_nope_dim, cfg.qk_rope_dim
    q = (x @ lp["wq"].astype(x.dtype)).reshape(t, h, dqk)
    ckv = x @ lp["w_dkv"].astype(x.dtype)
    c_kv = ops.rms_norm(ckv[:, : cfg.kv_lora_rank], lp["kv_ln"], cfg.rms_eps)
    k_pe = ckv[:, cfg.kv_lora_rank:]                      # [T, rope]
    k_nope = (c_kv @ lp["w_uk"].astype(x.dtype)).reshape(t, h, rnope)
    v = (c_kv @ lp["w_uv"].astype(x.dtype)).reshape(t, h, dv)
    # rope on q's rope span + shared k_pe (deepseek_scaling_rope)
    q_rope = q[..., rnope:].reshape(t, h * rrope)
    q_rope, k_pe = ops.deepseek_scaling_rope(
        positions, q_rope.reshape(t, h, rrope), k_pe.reshape(t, 1, rrope),
        rope, rrope, True)
    q = jnp.concatenate([q[..., :rnope], q_rope.reshape(t, h, rrope)], -1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe.reshape(t, 1, rrope), (t, h, rrope))],
        -1)
    kc_l, vc_l = ops.reshape_and_cache_tpu(
        k, v, kc_l, vc_l, slot_mapping)
    if ic_l is not None:
        # DSA sparse decode: indexer top-k selection, then attention over
        # only the selected tokens
        topk_idx, ic_l = _indexer_select(
            cfg, lp, x, ic_l, slot_mapping, block_table, kv_lens)
        attn = _sparse_gathered_attention(
            cfg, q, kc_l, vc_l, block_table, topk_idx)
    else:
        attn = ops.flash_attn_varlen_func(
            q, kc_l, vc_l, max_q, cu_q, max_k,
            seqused_k=kv_lens, block_table=block_table, causal=True,
            kv_layout="bhsd", softmax_scale=dqk ** -0.5)
    out = attn.reshape(t, h * dv) @ lp["wo"].astype(x.dtype)
    return out.astype(x.dtype), kc_l, vc_l, ic_l


def _moe_mlp(cfg, lp, x):
    gating = x.astype(jnp.float32) @ lp["router"]
    tw, ti = ops.grouped_topk(
        gating, cfg.top_k, True, cfg.n_group, cfg.topk_group,
        "softmax", cfg.routed_scaling_factor)
    routed = ops.tpu_fused_moe(
        x, lp["w13"]["w"], lp["w2"]["w"], tw, ti, activation="silu",
        quant="none")
    gu = x @ lp["w13_shared"].astype(x.dtype)
    shared = ops.silu_and_mul(gu) @ lp["w2_shared"].astype(x.dtype)
    return (routed.astype(jnp.float32)
            + shared.astype(jnp.float32)).astype(x.dtype)


def decode_step(cfg: DeepSeekConfig, params, token_ids, positions,
                slot_mapping, block_table, kv_lens, k_cache, v_cache,
                max_seqlen_k: int, idx_cache=None):
    """One decode step.  With ``cfg.index_topk > 0`` pass ``idx_cache``
    (from init_indexer_cache) to run DSA sparse attention; returns
    (logits, k_cache, v_cache[, idx_cache])."""
    b = token_ids.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    return _forward_tokens(cfg, params, token_ids, positions,
                           slot_mapping, block_table, kv_lens, cu_q, 1,
                           max_seqlen_k, k_cache, v_cache, idx_cache)


def prefill_step(cfg: DeepSeekConfig, params, token_ids, positions,
                 cu_seqlens_q, slot_mapping, block_table, kv_lens,
                 k_cache, v_cache, max_seqlen_q: int, max_seqlen_k: int):
    """Chunked/whole prefill over packed varlen sequences (expanded MLA
    cache layout; the absorbed latent layout and DSA sparse selection
    are decode-time modes) -> (logits [T, V], caches)."""
    assert not cfg.absorbed, "prefill uses the expanded cache layout"
    assert cfg.index_topk == 0, "DSA sparse selection is decode-only"
    return _forward_tokens(cfg, params, token_ids, positions,
                           slot_mapping, block_table, kv_lens,
                           cu_seqlens_q, max_seqlen_q, max_seqlen_k,
                           k_cache, v_cache, None)


def _forward_tokens(cfg: DeepSeekConfig, params, token_ids, positions,
                    slot_mapping, block_table, kv_lens, cu_q, max_q,
                    max_seqlen_k, k_cache, v_cache, idx_cache=None):
    sparse = cfg.index_topk > 0 and max_q == 1
    assert not sparse or idx_cache is not None, \
        "index_topk > 0 requires idx_cache (init_indexer_cache)"
    assert not (sparse and cfg.absorbed), \
        "DSA sparse decode composes with the expanded cache layout"
    x = jnp.take(params["embed"], token_ids, axis=0)
    rope = params["rope"]
    residual = jnp.zeros_like(x)
    k_cache, v_cache = list(k_cache), list(v_cache)
    idx_cache = list(idx_cache) if sparse else None
    for li, lp in enumerate(params["layers"]):
        h, residual = ops.fused_add_rms_norm(
            x, residual, lp["ln1"], cfg.rms_eps)
        if cfg.absorbed:
            attn, kc_l = _mla_attention_absorbed(
                cfg, lp, h, positions, rope, k_cache[li], slot_mapping,
                block_table, kv_lens, cu_q, max_seqlen_k)
            vc_l, ic_l = None, None
        else:
            attn, kc_l, vc_l, ic_l = _mla_attention(
                cfg, lp, h, positions, rope, k_cache[li], v_cache[li],
                slot_mapping, block_table, kv_lens, cu_q, max_q,
                max_seqlen_k,
                ic_l=idx_cache[li] if sparse else None)
        h2, residual = ops.fused_add_rms_norm(
            attn, residual, lp["ln2"], cfg.rms_eps)
        x = _moe_mlp(cfg, lp, h2)
        k_cache[li], v_cache[li] = kc_l, vc_l
        if sparse:
            idx_cache[li] = ic_l
    x = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    x = ops.rms_norm(x, params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(x, params["embed"].T,
                     preferred_element_type=jnp.float32)
    if sparse:
        return logits, k_cache, v_cache, idx_cache
    return logits, k_cache, v_cache

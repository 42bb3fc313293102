"""Qwen3-Next-family hybrid decoder: gated-delta-net (GDN) linear-attention
layers interleaved with gated full-attention layers, MoE MLP with a shared
expert.

This is the model the reference's GDN mega-op exists to serve
(csrc/xpu/gdn_attn/gdn_attn_interface.cpp:16-505 — its qkvz/ba packing,
conv_state/ssm_state caches and per-rank head counts are exactly this
layer's contract).  Composition per layer:

- GDN layer: in_proj_qkvz + in_proj_ba → ops.gdn_attention (causal conv +
  chunked delta rule, state carried in per-sequence slots) → per-head
  gated RMSNorm (rmsnorm(o)·silu(z)) → out_proj.
- full-attention layer (every `full_attn_interval`-th): packed q|k|v|gate
  projection → ops.fused_qk_norm_rope (per-head QK RMSNorm + partial
  RoPE, csrc/fused_qknorm_rope.cpp) → paged flash attention → output
  gated by silu(gate) → o_proj.
- MLP: topk_softmax routing → fused MoE (Pallas grouped GEMM) + shared
  expert scaled by a sigmoid gate.

State layout mirrors the reference: conv_state [slots, W-1, C] and
ssm_state [slots, NV, Hv, Hk] indexed by per-sequence state slots;
paged KV only for the full-attention layers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.models import llama as L


@dataclasses.dataclass(frozen=True)
class Qwen3NextConfig(L.LlamaConfig):
    # full-attention (gated) sublayers
    full_attn_interval: int = 4   # full-attn iff (i+1) % interval == 0
    partial_rotary_factor: float = 0.25
    # GDN sublayers (per-rank head counts, like every reference head arg)
    linear_num_k_heads: int = 4
    linear_num_v_heads: int = 8
    linear_k_head_dim: int = 64
    linear_v_head_dim: int = 64
    conv_kernel: int = 4
    # MoE
    num_experts: int = 8
    top_k: int = 2
    moe_intermediate_size: int = 512
    shared_intermediate_size: int = 512

    def is_full_attn(self, li: int) -> bool:
        return (li + 1) % self.full_attn_interval == 0

    @property
    def conv_dim(self) -> int:
        # conv runs over the concatenated q|k|v channels
        return (2 * self.linear_num_k_heads * self.linear_k_head_dim
                + self.linear_num_v_heads * self.linear_v_head_dim)

    @property
    def num_attn_layers(self) -> int:
        return sum(self.is_full_attn(i) for i in range(self.num_layers))

    @property
    def num_gdn_layers(self) -> int:
        return self.num_layers - self.num_attn_layers


def _rope_cache_partial(cfg: Qwen3NextConfig):
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, rot, 2, dtype=jnp.float32)
                                    / rot))
    t = jnp.arange(cfg.max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def init_params(cfg: Qwen3NextConfig, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    e = cfg.hidden_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    nk, nv = cfg.linear_num_k_heads, cfg.linear_num_v_heads
    hk, hv = cfg.linear_k_head_dim, cfg.linear_v_head_dim
    rep = nv // nk
    mi, si = cfg.moe_intermediate_size, cfg.shared_intermediate_size

    def lin(k, fi, fo):
        w = jax.random.normal(k, (fi, fo), jnp.float32)
        w = w * (2.0 / (fi + fo)) ** 0.5
        return L.quantize_linear(w, cfg.quant, cfg.jdtype)

    layers = []
    ks = jax.random.split(key, cfg.num_layers * 12 + 2)
    ki = iter(range(len(ks)))
    for li in range(cfg.num_layers):
        lp = {"ln1": jnp.ones((e,), cfg.jdtype),
              "ln2": jnp.ones((e,), cfg.jdtype)}
        if cfg.is_full_attn(li):
            # packed [q | k | v | gate] columns
            lp["wqkvg"] = lin(ks[next(ki)], e, (2 * hq + 2 * hkv) * d)
            lp["wo"] = lin(ks[next(ki)], hq * d, e)
            lp["q_norm"] = jnp.ones((d,), cfg.jdtype)
            lp["k_norm"] = jnp.ones((d,), cfg.jdtype)
        else:
            qkvz_dim = nk * (2 * hk + 2 * rep * hv)
            lp["in_qkvz"] = lin(ks[next(ki)], e, qkvz_dim)
            lp["in_ba"] = lin(ks[next(ki)], e, 2 * nv)
            lp["conv_w"] = (jax.random.normal(
                ks[next(ki)], (cfg.conv_dim, cfg.conv_kernel),
                jnp.float32) * 0.2).astype(cfg.jdtype)
            lp["conv_b"] = jnp.zeros((cfg.conv_dim,), cfg.jdtype)
            lp["A_log"] = jnp.zeros((nv,), jnp.float32)
            lp["dt_bias"] = jnp.zeros((nv,), jnp.float32)
            lp["gdn_norm"] = jnp.ones((hv,), jnp.float32)
            lp["out_proj"] = lin(ks[next(ki)], nv * hv, e)
        # MoE MLP + shared expert
        scale = (2.0 / (e + mi)) ** 0.5
        w13 = jax.random.normal(ks[next(ki)], (cfg.num_experts, e, 2 * mi),
                                jnp.float32) * scale
        w2 = jax.random.normal(ks[next(ki)], (cfg.num_experts, mi, e),
                               jnp.float32) * scale
        lp["w13"] = {"w": w13.astype(cfg.jdtype)}
        lp["w2"] = {"w": w2.astype(cfg.jdtype)}
        lp["router"] = (jax.random.normal(ks[next(ki)], (e, cfg.num_experts),
                                          jnp.float32) * 0.02
                        ).astype(cfg.jdtype)
        lp["shared_wgu"] = lin(ks[next(ki)], e, 2 * si)
        lp["shared_wd"] = lin(ks[next(ki)], si, e)
        lp["shared_gate"] = (jax.random.normal(
            ks[next(ki)], (e, 1), jnp.float32) * 0.02).astype(cfg.jdtype)
        layers.append(lp)
    embed = (jax.random.normal(ks[-2], (cfg.vocab_size, e), jnp.float32)
             * 0.02).astype(cfg.jdtype)
    return {
        "layers": layers,
        "embed": embed,
        "final_ln": jnp.ones((e,), cfg.jdtype),
        "rope": _rope_cache_partial(cfg),
    }


def init_state(cfg: Qwen3NextConfig, num_blocks: int, num_state_slots: int,
               kv_dtype=None):
    """-> (k_caches, v_caches, conv_states, ssm_states): paged KV per
    full-attn layer, recurrent state slots per GDN layer."""
    kv_dtype = kv_dtype or cfg.jdtype
    if cfg.kv_fused and (2 * cfg.head_dim) % 128 == 0:
        # fused K|V pages (one DMA per page in decode; models/llama.py)
        shape = (num_blocks, cfg.num_kv_heads, cfg.block_size,
                 2 * cfg.head_dim)
        kc = [jnp.zeros(shape, kv_dtype) for _ in range(cfg.num_attn_layers)]
        vc = [None] * cfg.num_attn_layers
    else:
        shape = (num_blocks, cfg.num_kv_heads, cfg.block_size, cfg.head_dim)
        kc = [jnp.zeros(shape, kv_dtype)
              for _ in range(cfg.num_attn_layers)]
        vc = [jnp.zeros(shape, kv_dtype)
              for _ in range(cfg.num_attn_layers)]
    conv = [jnp.zeros((num_state_slots, cfg.conv_kernel - 1, cfg.conv_dim),
                      jnp.float32) for _ in range(cfg.num_gdn_layers)]
    ssm = [jnp.zeros((num_state_slots, cfg.linear_num_v_heads,
                      cfg.linear_v_head_dim, cfg.linear_k_head_dim),
                     jnp.float32) for _ in range(cfg.num_gdn_layers)]
    return kc, vc, conv, ssm


def _gdn_block(cfg, lp, x, cu_q, state_idx, has_init, conv_s, ssm_s,
               max_q, tp_axis):
    nk, nv = cfg.linear_num_k_heads, cfg.linear_num_v_heads
    hk, hv = cfg.linear_k_head_dim, cfg.linear_v_head_dim
    qkvz = L._linear(x, lp["in_qkvz"])
    ba = L._linear(x, lp["in_ba"])
    core, z, conv_s, ssm_s = ops.gdn_attention(
        qkvz, ba, conv_s, ssm_s, lp["conv_w"], lp["conv_b"],
        lp["A_log"], lp["dt_bias"], cu_q, state_idx, has_init,
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max_q)
    # gated per-head RMSNorm: rmsnorm(o) · silu(z)  (Qwen3-Next GatedNorm)
    o = core.astype(jnp.float32)
    var = jnp.mean(o * o, axis=-1, keepdims=True)
    o = o * jax.lax.rsqrt(var + cfg.rms_eps) * lp["gdn_norm"]
    o = o * jax.nn.silu(z.astype(jnp.float32))
    t = x.shape[0]
    out = L._linear(o.reshape(t, nv * hv).astype(x.dtype), lp["out_proj"],
                    tp_axis, reduce_out=True)
    return out, conv_s, ssm_s


def _gated_attention_block(cfg, lp, x, positions, rope, kc_l, vc_l,
                           slot_mapping, block_table, kv_lens, cu_q,
                           max_q, max_k, tp_axis):
    t = x.shape[0]
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    qkvg = L._linear(x, lp["wqkvg"])
    qkv = qkvg[:, : (hq + 2 * hkv) * d]
    gate = qkvg[:, (hq + 2 * hkv) * d:]
    qkv = ops.fused_qk_norm_rope(
        qkv, hq, hkv, hkv, d, cfg.rms_eps, lp["q_norm"], lp["k_norm"],
        rope, True, positions)
    q = qkv[:, : hq * d]
    k = qkv[:, hq * d: (hq + hkv) * d]
    v = qkv[:, (hq + hkv) * d:]
    from vllm_xpu_kernels_tpu import envs
    fused = vc_l is None
    if fused and max_q == 1 and envs.VXK_DECODE_FRESH_KV():
        # opt-in: epilogue-folded fresh row, dependency-free scatter
        # (see models/llama.py _attention_block)
        attn, kc_l = ops.flash_attn_varlen_func(
            q.reshape(t, hq, d), kc_l, None,
            max_seqlen_q=max_q, cu_seqlens_q=cu_q, max_seqlen_k=max_k,
            seqused_k=kv_lens, block_table=block_table, causal=True,
            kv_layout="fused",
            fresh_kv=jnp.concatenate(
                [k.reshape(t, hkv, d), v.reshape(t, hkv, d)],
                axis=-1).astype(kc_l.dtype),
            fresh_slots=slot_mapping)
    else:
        if fused:
            kc_l = ops.reshape_and_cache_tpu_fused(
                k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l,
                slot_mapping, kv_cache_dtype="auto")
        else:
            kc_l, vc_l = ops.reshape_and_cache_tpu(
                k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l, vc_l,
                slot_mapping, kv_cache_dtype="auto")
        attn = ops.flash_attn_varlen_func(
            q.reshape(t, hq, d), kc_l, vc_l,
            max_seqlen_q=max_q, cu_seqlens_q=cu_q, max_seqlen_k=max_k,
            seqused_k=kv_lens, block_table=block_table, causal=True,
            kv_layout="fused" if fused else "bhsd")
    attn = attn.reshape(t, hq * d)
    attn = attn * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(attn.dtype)
    return (L._linear(attn, lp["wo"], tp_axis, reduce_out=True),
            kc_l, vc_l)


def _moe_mlp(cfg, lp, x, tp_axis, ep_axis):
    gating = jnp.dot(x.astype(jnp.float32), lp["router"].astype(jnp.float32))
    tw, ti = ops.topk_softmax(gating, cfg.top_k, renormalize=True)
    if ep_axis is not None:
        from vllm_xpu_kernels_tpu.parallel.moe import ep_fused_moe

        routed = ep_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                              ep_axis)
    else:
        routed = ops.tpu_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                                   activation="silu")
    shared = L._linear(
        ops.silu_and_mul(L._linear(x, lp["shared_wgu"])),
        lp["shared_wd"], tp_axis, reduce_out=True)
    sg = jax.nn.sigmoid(
        jnp.dot(x.astype(jnp.float32), lp["shared_gate"].astype(jnp.float32)))
    return routed + (shared.astype(jnp.float32) * sg).astype(routed.dtype)


def forward_varlen(
    cfg: Qwen3NextConfig, params,
    token_ids, positions, cu_q, slot_mapping, block_table, kv_lens,
    state_idx, has_init,
    k_caches, v_caches, conv_states, ssm_states,
    max_seqlen_q: int, max_seqlen_k: int,
    tp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
):
    """Packed varlen forward (prefill, decode, or mixed — one path, like
    the reference's single gdn mega-op) -> (logits, updated caches)."""
    x = jnp.take(params["embed"], token_ids, axis=0)
    rope = params["rope"]
    residual = jnp.zeros_like(x)
    k_caches, v_caches = list(k_caches), list(v_caches)
    conv_states, ssm_states = list(conv_states), list(ssm_states)
    ai = gi = 0
    for li, lp in enumerate(params["layers"]):
        h, residual = ops.fused_add_rms_norm(
            x, residual, lp["ln1"], cfg.rms_eps)
        if cfg.is_full_attn(li):
            attn, k_caches[ai], v_caches[ai] = _gated_attention_block(
                cfg, lp, h, positions, rope, k_caches[ai], v_caches[ai],
                slot_mapping, block_table, kv_lens, cu_q,
                max_seqlen_q, max_seqlen_k, tp_axis)
            ai += 1
        else:
            attn, conv_states[gi], ssm_states[gi] = _gdn_block(
                cfg, lp, h, cu_q, state_idx, has_init,
                conv_states[gi], ssm_states[gi], max_seqlen_q, tp_axis)
            gi += 1
        h2, residual = ops.fused_add_rms_norm(
            attn, residual, lp["ln2"], cfg.rms_eps)
        x = _moe_mlp(cfg, lp, h2, tp_axis, ep_axis)
    x = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    x = ops.rms_norm(x, params["final_ln"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"])
    logits = jnp.dot(x, head.T, preferred_element_type=jnp.float32)
    return logits, k_caches, v_caches, conv_states, ssm_states


def decode_step(cfg, params, token_ids, positions, slot_mapping,
                block_table, kv_lens, state_idx,
                k_caches, v_caches, conv_states, ssm_states,
                max_seqlen_k: int, tp_axis=None, ep_axis=None):
    b = token_ids.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    has_init = jnp.ones((b,), bool)
    return forward_varlen(
        cfg, params, token_ids, positions, cu_q, slot_mapping, block_table,
        kv_lens, state_idx, has_init, k_caches, v_caches, conv_states,
        ssm_states, max_seqlen_q=1, max_seqlen_k=max_seqlen_k,
        tp_axis=tp_axis, ep_axis=ep_axis)


def prefill_step(cfg, params, token_ids, positions, cu_q, slot_mapping,
                 block_table, kv_lens, state_idx,
                 k_caches, v_caches, conv_states, ssm_states,
                 max_seqlen_q: int, max_seqlen_k: int,
                 has_initial_state=None, tp_axis=None, ep_axis=None):
    b = cu_q.shape[0] - 1
    has_init = (jnp.zeros((b,), bool) if has_initial_state is None
                else has_initial_state)
    return forward_varlen(
        cfg, params, token_ids, positions, cu_q, slot_mapping, block_table,
        kv_lens, state_idx, has_init, k_caches, v_caches, conv_states,
        ssm_states, max_seqlen_q=max_seqlen_q, max_seqlen_k=max_seqlen_k,
        tp_axis=tp_axis, ep_axis=ep_axis)

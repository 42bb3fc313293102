"""GPT-OSS-family decoder (gpt-oss-20b / gpt-oss-120b).

The reference ships three kernel features specifically for this family and
this model wires all of them end-to-end:

- ``swigluoai_and_mul`` — interleaved gate/up SwiGLU with clamping
  (csrc/activation.cpp:277-346, alpha=1.702, limit=7.0),
- attention sinks (``s_aux`` in the flash-attention kernels,
  csrc/xpu/attn/xe_2 chunk_prefill/paged_decode sink variants),
- alternating sliding-window / full attention layers (the ``local``
  kernel variants, KERNEL_CONFIGURATION.md:124-129),

plus the MXFP4 MoE recipe (csrc/xpu/grouped_gemm Wmxfp4·A16 dispatch,
grouped_gemm_xe2_interface.hpp:174-350) that the released gpt-oss
checkpoints use for their expert weights.

Architecture notes (validated against HF ``transformers`` GptOss):
- bias on q/k/v/o projections, the router, and both expert GEMMs;
- router: top-k over logits then softmax over the selected k (equivalent
  to softmax -> top-k -> renormalize, which ops.topk_softmax implements);
- experts: ``gate_up`` columns INTERLEAVED (gate = [..., 0::2]) feeding
  swigluoai; out = (up + 1) * gate * sigmoid(1.702 * gate), both halves
  clamped at ±7;
- YaRN-scaled RoPE (factor 32, betas 32/1, original max 4096,
  attention-factor 0.1·ln(s)+1 folded into cos/sin);
- per-head learned sink logits appended to every softmax row;
- even layers use a sliding window of ``sliding_window`` (left window
  ``sliding_window - 1`` in flash-attn convention), odd layers are full.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.models import llama as L


@dataclasses.dataclass(frozen=True)
class GptOssConfig(L.LlamaConfig):
    # gpt-oss-20b shapes by default (tests shrink them)
    hidden_size: int = 2880
    num_layers: int = 24
    num_q_heads: int = 64
    num_kv_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2880
    vocab_size: int = 201088
    rope_theta: float = 150000.0
    max_position: int = 131072
    num_experts: int = 32
    top_k: int = 4
    sliding_window: int = 128
    # YaRN rope scaling (HF rope_type="yarn", truncate=False); factor<=1
    # disables scaling
    rope_factor: float = 32.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    rope_orig_max_position: int = 4096
    # quantization split: ``quant`` covers the expert stacks (none |
    # mxfp4 — the released recipe); ``attn_quant`` covers the attention
    # projections + logits head (none | fp8 | int8 | w8a8 | w4a8, the
    # same serving recipes as the Llama family) — at 20B the bf16
    # attention weights are ~25% of the decode stream
    attn_quant: str = "none"

    def attn_window(self, li: int):
        # HF layer_types: "sliding_attention" when (li+1) % 2 (even li)
        if li % 2 == 0 and self.sliding_window > 0:
            return (self.sliding_window - 1, 0)
        return None

    def ep_slice(self, ep: int) -> "GptOssConfig":
        assert self.num_experts % ep == 0
        return dataclasses.replace(self, num_experts=self.num_experts // ep)


def _rope_cache_yarn(cfg: GptOssConfig):
    """cos||sin cache with YaRN NTK-by-parts inverse frequencies and the
    attention factor folded in (transformers
    modeling_rope_utils._compute_yarn_parameters, truncate=False)."""
    dim = cfg.head_dim
    base = cfg.rope_theta
    s = cfg.rope_factor
    if s is None or s <= 1.0:
        return L._rope_cache(cfg)
    pos_freqs = base ** (jnp.arange(0, dim, 2, jnp.float32) / dim)
    inv_extra = 1.0 / pos_freqs
    inv_inter = 1.0 / (s * pos_freqs)

    def corr_dim(n_rot):
        return (dim * math.log(cfg.rope_orig_max_position
                               / (n_rot * 2 * math.pi))
                ) / (2 * math.log(base))

    low = max(corr_dim(cfg.rope_beta_fast), 0.0)
    high = min(corr_dim(cfg.rope_beta_slow), dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip((jnp.arange(dim // 2, dtype=jnp.float32) - low)
                    / (high - low), 0.0, 1.0)
    extra_f = 1.0 - ramp
    inv = inv_inter * (1.0 - extra_f) + inv_extra * extra_f
    mscale = 0.1 * math.log(s) + 1.0
    t = jnp.arange(cfg.max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.concatenate(
        [jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale], axis=-1)


def _quantize_experts_mxfp4(w):
    """[E, K, N] f32 -> (packed [E, K/2, N] int8 split-K, scales
    [E, K/32, N] bf16 pow2).  The MX spec (and the released gpt-oss
    checkpoints) store scales as UE8M0 exponent BYTES — the kernel
    accepts those directly (uint8 scales, shift+bitcast decode), but the
    in-kernel decode's layout conversions measured -5% on the fused
    pipeline (143 vs 150 GB/s), so SERVING storage expands the bytes to
    bf16 once at load (exact: e8m0 is bf16-representable; +0.6 GB HBM on
    the 20B model).  Checkpoint-side e8m0 codecs: utils/quant_math
    e8m0_encode/decode."""
    from vllm_xpu_kernels_tpu.utils import quant_math as qm

    e, k, n = w.shape
    g = 32

    def quant_chunk(wc):
        ec = wc.shape[0]
        wg = wc.astype(jnp.float32).reshape(ec, k // g, g, n)
        s = qm.ue8m0_round(
            jnp.max(jnp.abs(wg), axis=2) / qm.FP4_E2M1_MAX, 1e-10)
        codes = qm.fp4_e2m1_encode(
            jnp.clip(wg / s[:, :, None, :],
                     -qm.FP4_E2M1_MAX, qm.FP4_E2M1_MAX))
        lo = codes[:, :, : g // 2]
        hi = codes[:, :, g // 2:]
        packed = (lo.astype(jnp.uint8) | (hi.astype(jnp.uint8) << 4)
                  ).reshape(ec, k // 2, n).astype(jnp.int8)
        return packed, s.astype(jnp.bfloat16)

    # chunk over experts: the encode chain holds ~3x the f32 chunk in
    # temporaries — whole-stack quantization transiently needed ~6 GB
    # per 20B layer and OOMed init beyond 8 layers on a 16 GB chip
    step = max(1, min(e, 4))
    parts = [quant_chunk(w[i:i + step]) for i in range(0, e, step)]
    for pk, ps in parts:
        jax.block_until_ready((pk, ps))
    packed = jnp.concatenate([pk for pk, _ in parts], axis=0)
    s = jnp.concatenate([ps for _, ps in parts], axis=0)
    return packed, s


def _transcode_experts_w8a8(w):
    """[E, K, N] f32 -> mxfp4-QDQ -> per-channel int8: the FP8-transcode
    idea (BASELINE.md round 5) applied to MXFP4 checkpoints.  The e2m1
    quantization noise is baked in first (exactly what a released mxfp4
    checkpoint carries), then the codes re-quantize to int8 + [E, N]
    channel scales so serving rides the native-s8 grouped kernel
    (758 GB/s) instead of the ~200 GB/s e2m1-conversion-bound path —
    2x the bytes at ~4x the stream.  Lossy on top of mxfp4 (per-channel
    int8 must span every group's pow2 scale), gated by the logits-delta
    test in tests/test_gpt_oss.py."""
    from vllm_xpu_kernels_tpu.utils import quant_math as qm

    e, k, n = w.shape
    g = 32

    def chunk(wc):
        ec = wc.shape[0]
        wg = wc.astype(jnp.float32).reshape(ec, k // g, g, n)
        s = qm.ue8m0_round(
            jnp.max(jnp.abs(wg), axis=2) / qm.FP4_E2M1_MAX, 1e-10)
        codes = qm.fp4_e2m1_encode(
            jnp.clip(wg / s[:, :, None, :],
                     -qm.FP4_E2M1_MAX, qm.FP4_E2M1_MAX))
        deq = (qm.fp4_e2m1_decode(codes)
               * s[:, :, None, :]).reshape(ec, k, n)
        cmax = jnp.maximum(jnp.max(jnp.abs(deq), axis=1), 1e-8)  # [ec, n]
        s8 = (cmax / 127.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(deq / s8[:, None, :]), -127, 127
                     ).astype(jnp.int8)
        return q, s8

    step = max(1, min(e, 4))
    parts = [chunk(w[i:i + step]) for i in range(0, e, step)]
    for pk, ps in parts:
        jax.block_until_ready((pk, ps))
    return (jnp.concatenate([pk for pk, _ in parts], axis=0),
            jnp.concatenate([ps for _, ps in parts], axis=0))


def _expert_params(cfg: GptOssConfig, w13, w2, b13, b2):
    """Pack raw f32 expert stacks per cfg.quant ('none' | 'mxfp4' — the
    released-checkpoint recipe — | 'mxfp4-w8a8', the int8 transcode of
    an mxfp4 checkpoint).  Biases stay bf16-or-model-dtype.

    gate_up columns de-interleave to the [gate | up] HALVES layout here
    (one-time, load-side): the swigluoai contract's [0::2]/[1::2] strided
    slices cost a lane-relayout pass each per MoE call on TPU — the
    largest share of the fused pipeline's inter-GEMM glue.  The engine is
    told via gate_up_layout="halves" (ops.moe._swigluoai_halves).
    Quantization is per-column, so the permutation applies AFTER packing
    (the packed codes + scales are 8x smaller than the f32 stack — a
    pre-quant f32 permute copy OOMed 20B init on a 16 GB chip)."""
    from vllm_xpu_kernels_tpu.ops.moe import gate_up_halves_perm

    perm = jnp.asarray(gate_up_halves_perm(w13.shape[-1]))
    b13 = jnp.take(b13, perm, axis=-1)
    lp = {}
    if cfg.quant == "mxfp4":
        p13, s13 = _quantize_experts_mxfp4(w13)
        p2, s2 = _quantize_experts_mxfp4(w2)
        lp["w13"] = {"w": jnp.take(p13, perm, axis=-1),
                     "mx": jnp.take(s13, perm, axis=-1)}
        lp["w2"] = {"w": p2, "mx": s2}
    elif cfg.quant == "mxfp4-w8a8":
        q13, s13 = _transcode_experts_w8a8(w13)
        q2, s2 = _transcode_experts_w8a8(w2)
        lp["w13"] = {"w": jnp.take(q13, perm, axis=-1),
                     "s8": jnp.take(s13, perm, axis=-1)}
        lp["w2"] = {"w": q2, "s8": s2}
    else:
        lp["w13"] = {"w": jnp.take(w13.astype(cfg.jdtype), perm, axis=-1)}
        lp["w2"] = {"w": w2.astype(cfg.jdtype)}
    lp["w13"]["b"] = b13.astype(jnp.float32)
    lp["w2"]["b"] = b2.astype(jnp.float32)
    return lp


def init_params(cfg: GptOssConfig, key=None):
    """Random-initialized tree: Llama attention layout + per-layer sink
    logits, biased projections, router and biased expert stacks."""
    key = key if key is not None else jax.random.PRNGKey(0)
    base = L.init_params(dataclasses.replace(cfg, quant=cfg.attn_quant),
                         key)
    e, i = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(jax.random.fold_in(key, 23), cfg.num_layers * 8)
    for li, lp in enumerate(base["layers"]):
        del lp["wgu"], lp["wd"]
        ks = keys[8 * li: 8 * li + 8]
        scale = (2.0 / (e + i)) ** 0.5
        lp["wqkv"]["b"] = (jax.random.normal(
            ks[0], ((hq + 2 * hkv) * d,), jnp.float32) * 0.02
            ).astype(cfg.jdtype)
        lp["wo"]["b"] = (jax.random.normal(ks[1], (e,), jnp.float32)
                         * 0.02).astype(cfg.jdtype)
        lp["sinks"] = (jax.random.normal(ks[2], (hq,), jnp.float32)
                       * 0.5).astype(jnp.float32)
        w13 = jax.random.normal(ks[3], (cfg.num_experts, e, 2 * i),
                                jnp.float32) * scale
        w2 = jax.random.normal(ks[4], (cfg.num_experts, i, e),
                               jnp.float32) * scale
        b13 = jax.random.normal(ks[5], (cfg.num_experts, 2 * i),
                                jnp.float32) * 0.02
        b2 = jax.random.normal(ks[6], (cfg.num_experts, e),
                               jnp.float32) * 0.02
        lp.update(_expert_params(cfg, w13, w2, b13, b2))
        lp["router"] = (jax.random.normal(ks[7], (e, cfg.num_experts),
                                          jnp.float32) * 0.02
                        ).astype(cfg.jdtype)
        lp["router_b"] = jnp.zeros((cfg.num_experts,), jnp.float32)
        # bound init peak memory: each layer materializes a ~3 GB f32
        # expert stack before quantization frees it — async dispatch
        # otherwise keeps several layers' temporaries alive at once,
        # which OOMs 20B init on a 16 GB chip
        jax.block_until_ready(jax.tree.leaves(lp))
        del w13, w2
    base["rope"] = _rope_cache_yarn(cfg)
    # untied lm_head (tie_word_embeddings=False); random init ties it to
    # embed unless a checkpoint provides one
    base["lm_head"] = base["embed"]
    return base


def _moe_mlp(cfg: GptOssConfig, lp, x, tp_axis, ep_axis=None):
    gating = (jnp.dot(x.astype(jnp.float32),
                      lp["router"].astype(jnp.float32))
              + lp["router_b"].astype(jnp.float32))
    tw, ti = ops.topk_softmax(gating, cfg.top_k, renormalize=True)
    quant = ("mxfp4" if "mx" in lp["w13"]
             else "w8a8" if "s8" in lp["w13"] else "none")
    kwargs = dict(
        w13_bias=lp["w13"]["b"], w2_bias=lp["w2"]["b"],
        activation="swigluoai", gate_up_layout="halves")
    if quant == "mxfp4":
        kwargs.update(w13_scales=lp["w13"]["mx"],
                      w2_scales=lp["w2"]["mx"], group_size=32)
    elif quant == "w8a8":
        kwargs.update(w13_scales=lp["w13"]["s8"],
                      w2_scales=lp["w2"]["s8"])
    if ep_axis is not None:
        from vllm_xpu_kernels_tpu.parallel.moe import ep_fused_moe

        return ep_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                            ep_axis, quant=quant, **kwargs)
    return ops.tpu_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                             quant=quant, **kwargs)


def decode_step(
    cfg: GptOssConfig, params, token_ids, positions, slot_mapping,
    block_table, kv_lens, k_cache, v_cache, max_seqlen_k: int,
    tp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
):
    b = token_ids.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    return L._forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_q, 1, max_seqlen_k, k_cache, v_cache, tp_axis,
        mlp_fn=functools.partial(_moe_mlp, ep_axis=ep_axis))


def prefill_step(
    cfg: GptOssConfig, params, token_ids, positions, cu_seqlens_q,
    slot_mapping, block_table, kv_lens, k_cache, v_cache,
    max_seqlen_q: int, max_seqlen_k: int,
    tp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
    fresh_prefill: bool = False,
    logits_rows=None,
):
    return L._forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_seqlens_q, max_seqlen_q, max_seqlen_k,
        k_cache, v_cache, tp_axis, fresh_prefill=fresh_prefill,
        mlp_fn=functools.partial(_moe_mlp, ep_axis=ep_axis),
        logits_rows=logits_rows)


# ---------------------------------------------------------------------------
# HF checkpoint mapping
# ---------------------------------------------------------------------------

def params_from_hf_state(cfg: GptOssConfig, get):
    """Build the parameter tree from an HF GptOss state dict.

    ``get(name) -> np.ndarray`` — works over both an in-memory
    ``state_dict()`` and the safetensors shard reader
    (models/loader.py::ShardReader).  Expert tensors keep HF's fused
    layout verbatim ([E, D, 2I] interleaved gate/up, [E, I, D]) — no
    transpose or de-interleave needed on TPU."""
    import numpy as np

    dt = cfg.jdtype

    def lin(wname, bname=None, transpose=True):
        w = np.asarray(get(wname), np.float32)
        p = L.quantize_linear(jnp.asarray(w.T if transpose else w),
                              cfg.attn_quant, dt)
        if bname is not None:
            p["b"] = jnp.asarray(np.asarray(get(bname), np.float32), dt)
        return p

    layers = []
    for li in range(cfg.num_layers):
        pre = f"model.layers.{li}."
        qkv_w = np.concatenate(
            [np.asarray(get(pre + f"self_attn.{n}_proj.weight"),
                        np.float32).T
             for n in ("q", "k", "v")], axis=1)
        qkv_b = np.concatenate(
            [np.asarray(get(pre + f"self_attn.{n}_proj.bias"), np.float32)
             for n in ("q", "k", "v")])
        wqkv = L.quantize_linear(jnp.asarray(qkv_w), cfg.attn_quant, dt)
        wqkv["b"] = jnp.asarray(qkv_b, dt)
        lp = {
            "ln1": jnp.asarray(get(pre + "input_layernorm.weight"), dt),
            "ln2": jnp.asarray(
                get(pre + "post_attention_layernorm.weight"), dt),
            "wqkv": wqkv,
            "wo": lin(pre + "self_attn.o_proj.weight",
                      pre + "self_attn.o_proj.bias"),
            "sinks": jnp.asarray(
                np.asarray(get(pre + "self_attn.sinks"), np.float32)),
            "router": jnp.asarray(
                np.asarray(get(pre + "mlp.router.weight"), np.float32).T,
                dt),
            "router_b": jnp.asarray(
                np.asarray(get(pre + "mlp.router.bias"), np.float32)),
        }
        w13 = np.asarray(get(pre + "mlp.experts.gate_up_proj"), np.float32)
        w2 = np.asarray(get(pre + "mlp.experts.down_proj"), np.float32)
        b13 = np.asarray(get(pre + "mlp.experts.gate_up_proj_bias"),
                         np.float32)
        b2 = np.asarray(get(pre + "mlp.experts.down_proj_bias"), np.float32)
        lp.update(_expert_params(cfg, jnp.asarray(w13), jnp.asarray(w2),
                                 jnp.asarray(b13), jnp.asarray(b2)))
        layers.append(lp)
    tree = {
        "layers": layers,
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dt),
        "lm_head": jnp.asarray(get("lm_head.weight"), dt),
        "final_ln": jnp.asarray(get("model.norm.weight"), dt),
        "rope": _rope_cache_yarn(cfg),
    }
    if cfg.attn_quant in ("w8a8", "w4a8"):
        tree["lm_head_q"] = L.quantize_linear(
            jnp.asarray(np.asarray(get("lm_head.weight"), np.float32).T),
            "w8a8")
    return tree


def config_from_hf(c) -> GptOssConfig:
    """transformers GptOssConfig / config.json dict -> GptOssConfig."""
    if not isinstance(c, dict):
        c = c.to_dict()
    rs = c.get("rope_scaling") or {}
    return GptOssConfig(
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_q_heads=c["num_attention_heads"],
        num_kv_heads=c["num_key_value_heads"],
        head_dim=c.get("head_dim", 64),
        intermediate_size=c["intermediate_size"],
        vocab_size=c["vocab_size"],
        rope_theta=c.get("rope_theta", 150000.0),
        rms_eps=c.get("rms_norm_eps", 1e-5),
        max_position=c.get("max_position_embeddings", 131072),
        num_experts=c["num_local_experts"],
        top_k=c["num_experts_per_tok"],
        sliding_window=c.get("sliding_window", 128),
        rope_factor=float(rs.get("factor", 0.0) or 0.0),
        rope_beta_fast=float(rs.get("beta_fast", 32.0)),
        rope_beta_slow=float(rs.get("beta_slow", 1.0)),
        rope_orig_max_position=int(
            rs.get("original_max_position_embeddings",
                   c.get("max_position_embeddings", 4096))),
    )


# ---------------------------------------------------------------------------
# Tensor parallelism
# ---------------------------------------------------------------------------

def param_tp_specs(cfg: GptOssConfig, tp_axis: str = "tp"):
    """PartitionSpec tree for the GPT-OSS params under TP: attention is
    Megatron-sharded (qkv columns + sinks over heads, o rows, o-bias
    added once post-psum), router and expert stacks replicated — expert
    scaling is EP's job (ep_fused_moe), TP carries the attention."""
    from jax.sharding import PartitionSpec as P

    experts = {"w": P(), "b": P()}
    if cfg.quant == "mxfp4":
        experts["mx"] = P()
    elif cfg.quant == "mxfp4-w8a8":
        experts["s8"] = P()
    col = {"w": P(None, tp_axis), "b": P(tp_axis)}
    row = {"w": P(tp_axis, None), "b": P()}
    aq = cfg.attn_quant
    if aq in ("fp8", "int8", "w8a8"):
        sk = "s8" if aq == "w8a8" else "s"
        col[sk] = P(tp_axis)
        row[sk] = P()
    elif aq == "w4a8":
        col["s4"] = P(None, tp_axis)
        row["s4"] = P(tp_axis, None)
    layer = {
        "ln1": P(), "ln2": P(),
        "wqkv": col,
        "wo": row,
        "sinks": P(tp_axis),
        "router": P(),
        "router_b": P(),
        "w13": dict(experts),
        "w2": dict(experts),
    }
    tree = {
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
        "embed": P(),
        "final_ln": P(),
        "rope": P(),
        "lm_head": P(),
    }
    if aq in ("w8a8", "w4a8"):
        tree["lm_head_q"] = {"w": P(), "s8": P()}
    return tree


def params_for_tp(params, cfg: GptOssConfig, tp: int):
    """Rank-block the fused qkv columns (same permutation as
    L.params_for_tp, which expects a dense-MLP tree).  Sinks are already
    head-contiguous per rank under a plain P(tp) sharding."""
    if tp == 1:
        return params
    import numpy as np

    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    sizes = [hq * d, hkv * d, hkv * d]
    offs = np.cumsum([0] + sizes[:-1])
    perm = []
    for r in range(tp):
        for off, sz in zip(offs, sizes):
            per = sz // tp
            perm.extend(range(off + r * per, off + (r + 1) * per))
    perm = np.asarray(perm, np.int64)
    new_layers = []
    for lp in params["layers"]:
        nl = dict(lp)
        q = {"w": lp["wqkv"]["w"][:, perm], "b": lp["wqkv"]["b"][perm]}
        for sk in ("s", "s8", "s4"):
            if sk in lp["wqkv"]:
                p = lp["wqkv"][sk]
                q[sk] = p[:, perm] if p.ndim == 2 else p[perm]
        nl["wqkv"] = q
        new_layers.append(nl)
    return {**params, "layers": new_layers}

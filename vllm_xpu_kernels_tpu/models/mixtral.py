"""Mixtral-8x7B-family decoder: Llama attention blocks + fused-MoE MLP.

Per the north star ("Mixtral-8x7B FP8 fused MoE, expert-sharded"): routing
via ops.topk_softmax, experts via the fused pipeline (ops.tpu_fused_moe,
Pallas grouped GEMM), EP across a mesh axis via parallel.ep_fused_moe.
Attention / norm / rope / cache plumbing is shared with models.llama.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.models import llama as L


@dataclasses.dataclass(frozen=True)
class MixtralConfig(L.LlamaConfig):
    num_experts: int = 8
    top_k: int = 2

    def ep_slice(self, ep: int) -> "MixtralConfig":
        assert self.num_experts % ep == 0
        return dataclasses.replace(self,
                                   num_experts=self.num_experts // ep)


def init_params(cfg: MixtralConfig, key=None):
    """Llama-style attention weights + per-layer expert stacks
    (w13 [E, D, 2I], w2 [E, I, D], router [D, E])."""
    key = key if key is not None else jax.random.PRNGKey(0)
    base = L.init_params(cfg, key)
    e, i = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.fold_in(key, 17),
                            cfg.num_layers * 3)
    for li, lp in enumerate(base["layers"]):
        del lp["wgu"], lp["wd"]
        k1, k2, k3 = keys[3 * li: 3 * li + 3]
        scale = (2.0 / (e + i)) ** 0.5
        w13 = jax.random.normal(k1, (cfg.num_experts, e, 2 * i),
                                jnp.float32) * scale
        w2 = jax.random.normal(k2, (cfg.num_experts, i, e),
                               jnp.float32) * scale
        if cfg.quant == "fp8":
            s13 = jnp.max(jnp.abs(w13), axis=1) / 448.0 + 1e-8
            s2 = jnp.max(jnp.abs(w2), axis=1) / 448.0 + 1e-8
            lp["w13"] = {"w": (w13 / s13[:, None, :]).astype(
                jnp.float8_e4m3fn), "s": s13.astype(jnp.float32)}
            lp["w2"] = {"w": (w2 / s2[:, None, :]).astype(
                jnp.float8_e4m3fn), "s": s2.astype(jnp.float32)}
        elif cfg.quant == "w8a8":
            # per-expert-channel int8 weights; activations quantized
            # per token inside the fused pipeline (native s8 MXU path)
            s13 = jnp.max(jnp.abs(w13), axis=1) / 127.0 + 1e-8
            s2 = jnp.max(jnp.abs(w2), axis=1) / 127.0 + 1e-8
            lp["w13"] = {"w": jnp.clip(jnp.round(w13 / s13[:, None, :]),
                                       -127, 127).astype(jnp.int8),
                         "s8": s13.astype(jnp.float32)}
            lp["w2"] = {"w": jnp.clip(jnp.round(w2 / s2[:, None, :]),
                                      -127, 127).astype(jnp.int8),
                        "s8": s2.astype(jnp.float32)}
        else:
            lp["w13"] = {"w": w13.astype(cfg.jdtype)}
            lp["w2"] = {"w": w2.astype(cfg.jdtype)}
        lp["router"] = (jax.random.normal(k3, (e, cfg.num_experts),
                                          jnp.float32) * 0.02
                        ).astype(cfg.jdtype)
    return base


def _moe_mlp(cfg: MixtralConfig, lp, x, tp_axis, ep_axis):
    gating = jnp.dot(x.astype(jnp.float32), lp["router"].astype(jnp.float32))
    tw, ti = ops.topk_softmax(gating, cfg.top_k, renormalize=True)
    kwargs = {}
    if "s8" in lp["w13"]:
        quant = "w8a8"
        kwargs = dict(w13_scales=lp["w13"]["s8"], w2_scales=lp["w2"]["s8"])
    elif "s" in lp["w13"]:
        quant = "fp8_channel"
        kwargs = dict(w13_scales=lp["w13"]["s"], w2_scales=lp["w2"]["s"])
    else:
        quant = "none"
    if ep_axis is not None:
        from vllm_xpu_kernels_tpu.parallel.moe import ep_fused_moe

        return ep_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                            ep_axis, quant=quant, **kwargs)
    # without EP, expert weights are replicated across tp ranks and the
    # output is already complete on every rank — no collective needed
    return ops.tpu_fused_moe(x, lp["w13"]["w"], lp["w2"]["w"], tw, ti,
                             quant=quant, activation="silu", **kwargs)


def decode_step(
    cfg: MixtralConfig, params, token_ids, positions, slot_mapping,
    block_table, kv_lens, k_cache, v_cache, max_seqlen_k: int,
    tp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
):
    """One MoE decode step -> (logits, caches).  ``ep_axis`` runs the
    expert MLP expert-sharded inside shard_map (router replicated).
    Shares the llama forward body (fused w8a8 attention norm-quant,
    fused KV pages) with the expert MLP swapped in via ``mlp_fn``."""
    import functools

    b = token_ids.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    return L._forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_q, 1, max_seqlen_k, k_cache, v_cache, tp_axis,
        mlp_fn=functools.partial(_moe_mlp, ep_axis=ep_axis))


def prefill_step(
    cfg: MixtralConfig, params, token_ids, positions, cu_seqlens_q,
    slot_mapping, block_table, kv_lens, k_cache, v_cache,
    max_seqlen_q: int, max_seqlen_k: int,
    tp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
    fresh_prefill: bool = False,
    logits_rows=None,
):
    """Packed varlen prefill -> (logits [T, V], caches)."""
    import functools

    return L._forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_seqlens_q, max_seqlen_q, max_seqlen_k,
        k_cache, v_cache, tp_axis, fresh_prefill=fresh_prefill,
        mlp_fn=functools.partial(_moe_mlp, ep_axis=ep_axis),
        logits_rows=logits_rows)

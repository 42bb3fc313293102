"""HF checkpoint loading: safetensors -> this engine's parameter trees,
with quantize-on-load.

The reference ships only weight-FORMAT converters (GPTQ/AWQ repack,
vllm_xpu_kernels/quantization/_quantize_convert.py:124-306) and leaves
checkpoint IO to vLLM; a standalone TPU engine needs the whole path.
Design:

- `read_hf_config(path)` parses `config.json` into a model config
  (LlamaConfig today; the architectures table is the extension point).
- `load_llama_params(cfg, path, ...)` streams tensors out of one or many
  `*.safetensors` shards (following `model.safetensors.index.json` when
  present), maps HF names onto the param tree produced by
  `models.llama.init_params`, fuses qkv / gate+up columns, and quantizes
  each linear with `models.llama.quantize_linear` — so a loaded tree is
  byte-compatible with a randomly-initialized one.
- Tensors are loaded host-side as numpy and device_put once per buffer;
  nothing is ever resident twice on the chip.

HF Llama layout (transformers `LlamaForCausalLM`):
  model.embed_tokens.weight                [V, E]
  model.layers.{i}.input_layernorm.weight  [E]
  model.layers.{i}.post_attention_layernorm.weight
  model.layers.{i}.self_attn.{q,k,v,o}_proj.weight   [out, in]  (row-major)
  model.layers.{i}.mlp.{gate,up,down}_proj.weight
  model.norm.weight
  lm_head.weight                           [V, E] (untied in Llama-3)
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    """safetensors slice/tensor -> numpy f32 (bf16 arrives as uint16 view
    in older safetensors; the numpy frontend handles it natively here)."""
    a = np.asarray(t)
    if a.dtype == np.float32:
        return a
    return a.astype(np.float32)


class _ShardedCheckpoint:
    """Name -> tensor across one or many .safetensors files, opened
    lazily and closed on exit."""

    def __init__(self, path: str):
        from safetensors import safe_open

        self._open = safe_open
        self._handles: Dict[str, object] = {}
        if os.path.isfile(path):
            self._name_to_file = None
            self._files = [path]
        else:
            idx = os.path.join(path, "model.safetensors.index.json")
            single = os.path.join(path, "model.safetensors.json")
            st = os.path.join(path, "model.safetensors")
            if os.path.exists(idx):
                with open(idx) as f:
                    wmap = json.load(f)["weight_map"]
                self._name_to_file = {
                    k: os.path.join(path, v) for k, v in wmap.items()}
                self._files = sorted(set(self._name_to_file.values()))
            elif os.path.exists(st):
                self._name_to_file = None
                self._files = [st]
            elif os.path.exists(single):
                raise FileNotFoundError(single)
            else:
                cand = sorted(
                    os.path.join(path, f) for f in os.listdir(path)
                    if f.endswith(".safetensors"))
                if not cand:
                    raise FileNotFoundError(
                        f"no .safetensors under {path}")
                self._name_to_file = None
                self._files = cand

    def _handle(self, fname):
        if fname not in self._handles:
            self._handles[fname] = self._open(fname, framework="numpy")
        return self._handles[fname]

    def keys(self):
        out = []
        if self._name_to_file is not None:
            return list(self._name_to_file)
        for f in self._files:
            out.extend(self._handle(f).keys())
        return out

    def get(self, name: str) -> np.ndarray:
        if self._name_to_file is not None:
            return _np(self._handle(self._name_to_file[name])
                       .get_tensor(name))
        for f in self._files:
            h = self._handle(f)
            if name in h.keys():
                return _np(h.get_tensor(name))
        raise KeyError(name)

    def has(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except KeyError:
            return False


def read_hf_config(path: str):
    """config.json -> LlamaConfig for llama-family architectures
    (Llama/Mistral, Qwen2 = +qkv bias, Qwen3 dense = +per-head qk-norm)."""
    from vllm_xpu_kernels_tpu.models.llama import LlamaConfig

    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    archs = c.get("architectures", ["LlamaForCausalLM"])
    if any("GptOss" in a for a in archs):
        from vllm_xpu_kernels_tpu.models.gpt_oss import config_from_hf

        return config_from_hf(c)
    qwen2 = any("Qwen2" in a for a in archs)
    qwen3 = any("Qwen3" in a for a in archs)
    if not any("Llama" in a or "Mistral" in a for a in archs) \
            and not (qwen2 or qwen3):
        raise NotImplementedError(
            f"read_hf_config handles llama-family checkpoints; got {archs}")
    e = c["hidden_size"]
    hq = c["num_attention_heads"]
    return LlamaConfig(
        hidden_size=e,
        num_layers=c["num_hidden_layers"],
        num_q_heads=hq,
        num_kv_heads=c.get("num_key_value_heads", hq),
        head_dim=c.get("head_dim", e // hq),
        intermediate_size=c["intermediate_size"],
        vocab_size=c["vocab_size"],
        rope_theta=float(c.get("rope_theta", 10000.0)),
        rms_eps=float(c.get("rms_norm_eps", 1e-5)),
        max_position=min(int(c.get("max_position_embeddings", 8192)),
                         131072),
        qkv_bias=qwen2 or bool(c.get("attention_bias", False)),
        qk_norm=qwen3,
    )


def load_llama_params(
    cfg,
    path: str,
    quant: Optional[str] = None,
    device=None,
    progress: Optional[Callable[[str], None]] = None,
):
    """Checkpoint dir (or single .safetensors file) -> param pytree for
    `models.llama` with weights quantized per `quant` (default:
    cfg.quant).  Fuses q/k/v and gate/up into the engine's wide-N layout
    and transposes HF's [out, in] into [K, N]."""
    from vllm_xpu_kernels_tpu.models.llama import (_rope_cache,
                                                   apply_gu256,
                                                   quantize_linear)

    quant = cfg.quant if quant is None else quant
    ck = _ShardedCheckpoint(path)
    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray

    def linear(*names):
        """Fused [K, N] weight from HF [out, in] tensors, quantized and
        placed on device."""
        w = np.concatenate([ck.get(n).T for n in names], axis=1)
        q = quantize_linear(jnp.asarray(w), quant, cfg.jdtype)
        return {k: put(v) for k, v in q.items()}

    layers = []
    for li in range(cfg.num_layers):
        p = f"model.layers.{li}."
        if progress:
            progress(p.rstrip("."))
        lp = {
            "ln1": put(ck.get(p + "input_layernorm.weight")
                       .astype(cfg.dtype)),
            "ln2": put(ck.get(p + "post_attention_layernorm.weight")
                       .astype(cfg.dtype)),
            "wqkv": linear(p + "self_attn.q_proj.weight",
                           p + "self_attn.k_proj.weight",
                           p + "self_attn.v_proj.weight"),
            "wo": linear(p + "self_attn.o_proj.weight"),
            "wgu": (apply_gu256(
                linear(p + "mlp.gate_proj.weight",
                       p + "mlp.up_proj.weight"), cfg.intermediate_size)
                if cfg.gu256 else
                linear(p + "mlp.gate_proj.weight",
                       p + "mlp.up_proj.weight")),
            "wd": linear(p + "mlp.down_proj.weight"),
        }
        if cfg.qkv_bias and ck.has(p + "self_attn.q_proj.bias"):
            lp["wqkv"]["b"] = put(np.concatenate(
                [ck.get(p + f"self_attn.{n}_proj.bias")
                 for n in ("q", "k", "v")]).astype(cfg.dtype))
        if cfg.qk_norm:
            lp["qnorm"] = put(ck.get(p + "self_attn.q_norm.weight")
                              .astype(cfg.dtype))
            lp["knorm"] = put(ck.get(p + "self_attn.k_norm.weight")
                              .astype(cfg.dtype))
        layers.append(lp)
    params = {
        "layers": layers,
        "embed": put(ck.get("model.embed_tokens.weight").astype(cfg.dtype)),
        "final_ln": put(ck.get("model.norm.weight").astype(cfg.dtype)),
        "rope": _rope_cache(cfg),
    }
    if ck.has("lm_head.weight"):
        params["lm_head"] = put(ck.get("lm_head.weight").astype(cfg.dtype))
    if quant == "w8a8":
        head = ck.get("lm_head.weight") if ck.has("lm_head.weight") \
            else ck.get("model.embed_tokens.weight")
        q = quantize_linear(jnp.asarray(head.T), "w8a8")
        params["lm_head_q"] = {k: put(v) for k, v in q.items()}
    return params


def save_llama_hf(params, cfg, path: str):
    """Write a param tree back out in HF-Llama safetensors layout (test /
    interop helper; quantized trees are dequantized to f32 first)."""
    from safetensors.numpy import save_file

    from vllm_xpu_kernels_tpu.kernels import quant_matmul as qmm

    def deq(p):
        w = np.asarray(p["w"])
        if "s" not in p:
            return np.asarray(p["w"], np.float32)
        s = np.asarray(p["s"], np.float32)
        if s.ndim == 2:  # mxfp4 split-K packed
            g = w.shape[0] * 2 // s.shape[0]
            codes = np.asarray(qmm.unpack_int4_splitk_grouped(
                jnp.asarray(w), g))
            vals = np.asarray(qmm.e2m1_decode_f32(jnp.asarray(codes)))
            return vals * np.repeat(s, g, axis=0)
        return w.astype(np.float32) * s[None, :]

    e = cfg.hidden_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size
    out = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_ln"], np.float32),
    }
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"], np.float32)
    for li, lp in enumerate(params["layers"]):
        p = f"model.layers.{li}."
        out[p + "input_layernorm.weight"] = np.asarray(lp["ln1"], np.float32)
        out[p + "post_attention_layernorm.weight"] = np.asarray(
            lp["ln2"], np.float32)
        qkv = deq(lp["wqkv"])
        out[p + "self_attn.q_proj.weight"] = qkv[:, : hq * d].T.copy()
        out[p + "self_attn.k_proj.weight"] = (
            qkv[:, hq * d: (hq + hkv) * d].T.copy())
        out[p + "self_attn.v_proj.weight"] = qkv[:, (hq + hkv) * d:].T.copy()
        if "b" in lp["wqkv"]:
            b = np.asarray(lp["wqkv"]["b"], np.float32)
            out[p + "self_attn.q_proj.bias"] = b[: hq * d].copy()
            out[p + "self_attn.k_proj.bias"] = (
                b[hq * d: (hq + hkv) * d].copy())
            out[p + "self_attn.v_proj.bias"] = b[(hq + hkv) * d:].copy()
        if "qnorm" in lp:
            out[p + "self_attn.q_norm.weight"] = np.asarray(
                lp["qnorm"], np.float32)
            out[p + "self_attn.k_norm.weight"] = np.asarray(
                lp["knorm"], np.float32)
        out[p + "self_attn.o_proj.weight"] = deq(lp["wo"]).T.copy()
        gu = deq(lp["wgu"])
        if cfg.gu256:
            from vllm_xpu_kernels_tpu.kernels.quant_matmul import gu256_perm

            gu = gu[:, np.argsort(gu256_perm(i))]   # back to [gate | up]
        out[p + "mlp.gate_proj.weight"] = gu[:, :i].T.copy()
        out[p + "mlp.up_proj.weight"] = gu[:, i:].T.copy()
        out[p + "mlp.down_proj.weight"] = deq(lp["wd"]).T.copy()
    os.makedirs(path, exist_ok=True)
    save_file(out, os.path.join(path, "model.safetensors"))
    arch, mtype = "LlamaForCausalLM", "llama"
    if cfg.qk_norm:
        arch, mtype = "Qwen3ForCausalLM", "qwen3"
    elif cfg.qkv_bias:
        arch, mtype = "Qwen2ForCausalLM", "qwen2"
    cfgj = {
        "architectures": [arch],
        "model_type": mtype,
        "tie_word_embeddings": "lm_head" not in params,
        "attention_bias": cfg.qkv_bias,
        "hidden_size": e,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": hq,
        "num_key_value_heads": hkv,
        "head_dim": d,
        "intermediate_size": i,
        "vocab_size": cfg.vocab_size,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "max_position_embeddings": cfg.max_position,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfgj, f)


def load_gpt_oss_params(cfg, path: str):
    """GPT-OSS checkpoint dir -> param pytree for ``models.gpt_oss``.

    Expects the dequantized (bf16) HF tensor layout; expert weights are
    re-quantized to MXFP4 on load when ``cfg.quant == 'mxfp4'`` (the
    released-checkpoint recipe).  The native quantized release layout
    (``*_blocks`` / ``*_scales`` tensors) should be dequantized with HF
    transformers first (Mxfp4Config(dequantize=True)).
    """
    from vllm_xpu_kernels_tpu.models.gpt_oss import params_from_hf_state

    return params_from_hf_state(cfg, _ShardedCheckpoint(path).get)

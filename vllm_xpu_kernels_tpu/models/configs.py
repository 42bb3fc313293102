"""Named model-config presets (role of the reference's
benchmark/src/get_model_config.py:17-302: real HF configs with TP/EP
division applied at the call site).

``get_model_config(name, tp=1, quant=...)`` returns the family's config
dataclass with the published architecture hyper-parameters; pair with
``models.loader.load_llama_params`` for real checkpoints or the family's
``init_params`` for random weights.
"""

from __future__ import annotations

import dataclasses


def _llama(**kw):
    from vllm_xpu_kernels_tpu.models.llama import LlamaConfig

    return LlamaConfig(**kw)


def _registry():
    from vllm_xpu_kernels_tpu.models.deepseek import DeepSeekConfig
    from vllm_xpu_kernels_tpu.models.gpt_oss import GptOssConfig
    from vllm_xpu_kernels_tpu.models.mixtral import MixtralConfig
    from vllm_xpu_kernels_tpu.models.qwen3_next import Qwen3NextConfig

    return {
        # Llama family
        "llama-3-8b": lambda: _llama(),
        "llama-3-70b": lambda: _llama(
            hidden_size=8192, num_layers=80, num_q_heads=64,
            num_kv_heads=8, head_dim=128, intermediate_size=28672,
            vocab_size=128256, rope_theta=500000.0),
        "llama-3.2-1b": lambda: _llama(
            hidden_size=2048, num_layers=16, num_q_heads=32,
            num_kv_heads=8, head_dim=64, intermediate_size=8192,
            vocab_size=128256, rope_theta=500000.0),
        # Qwen2: qkv bias, no qk-norm
        "qwen2-7b": lambda: _llama(
            hidden_size=3584, num_layers=28, num_q_heads=28,
            num_kv_heads=4, head_dim=128, intermediate_size=18944,
            vocab_size=152064, rope_theta=1000000.0, qkv_bias=True),
        # Qwen3: per-head qk RMSNorm, no bias
        "qwen3-8b": lambda: _llama(
            hidden_size=4096, num_layers=36, num_q_heads=32,
            num_kv_heads=8, head_dim=128, intermediate_size=12288,
            vocab_size=151936, rope_theta=1000000.0, qk_norm=True),
        "mixtral-8x7b": lambda: MixtralConfig(
            vocab_size=32000, rope_theta=1000000.0, max_position=32768),
        "gpt-oss-20b": lambda: GptOssConfig(),
        "gpt-oss-120b": lambda: GptOssConfig(
            num_layers=36, num_experts=128),
        "deepseek-v3.2": lambda: DeepSeekConfig(
            hidden_size=7168, num_layers=61, num_q_heads=128,
            num_kv_heads=128, vocab_size=129280, num_experts=256,
            num_shared_experts=1, top_k=8, n_group=8, topk_group=4,
            moe_intermediate=2048, routed_scaling_factor=2.5,
            index_topk=2048, index_n_heads=64, index_head_dim=128),
        "qwen3-next-80b": lambda: Qwen3NextConfig(
            hidden_size=2048, num_layers=48, num_q_heads=16,
            num_kv_heads=2, head_dim=256, vocab_size=151936,
            rope_theta=10000000.0, linear_num_k_heads=16,
            linear_num_v_heads=32, linear_k_head_dim=128,
            linear_v_head_dim=128, num_experts=512, top_k=10,
            moe_intermediate_size=512, shared_intermediate_size=512),
    }


def list_models():
    return sorted(_registry())


def get_model_config(name: str, tp: int = 1, **overrides):
    """-> the family config for ``name`` with per-rank TP division
    applied (tp_slice) and any dataclass field overrides."""
    reg = _registry()
    if name not in reg:
        raise KeyError(
            f"unknown model '{name}' (known: {list_models()})")
    cfg = reg[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if tp > 1:
        cfg = cfg.tp_slice(tp)
    return cfg

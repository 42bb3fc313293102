"""Named model-config presets (reference benchmark/src/get_model_config.py)."""

import pytest

from vllm_xpu_kernels_tpu.models.configs import get_model_config, list_models


def test_list_models_nonempty():
    names = list_models()
    assert "llama-3-8b" in names and "mixtral-8x7b" in names
    assert len(names) >= 9


@pytest.mark.parametrize("name", [
    "llama-3-8b", "llama-3-70b", "llama-3.2-1b", "qwen2-7b", "qwen3-8b",
    "mixtral-8x7b", "gpt-oss-20b", "gpt-oss-120b", "deepseek-v3.2",
    "qwen3-next-80b",
])
def test_presets_construct(name):
    cfg = get_model_config(name)
    assert cfg.hidden_size % 128 == 0 or cfg.hidden_size > 0
    assert cfg.num_layers > 0 and cfg.vocab_size > 0


def test_published_dims():
    c8 = get_model_config("llama-3-8b")
    assert (c8.hidden_size, c8.num_layers, c8.num_q_heads,
            c8.num_kv_heads) == (4096, 32, 32, 8)
    c70 = get_model_config("llama-3-70b")
    assert (c70.hidden_size, c70.num_layers, c70.intermediate_size) == (
        8192, 80, 28672)
    q2 = get_model_config("qwen2-7b")
    assert q2.qkv_bias and not q2.qk_norm and q2.vocab_size == 152064
    q3 = get_model_config("qwen3-8b")
    assert q3.qk_norm and not q3.qkv_bias
    g120 = get_model_config("gpt-oss-120b")
    assert g120.num_layers == 36 and g120.num_experts == 128


def test_tp_and_overrides():
    cfg = get_model_config("llama-3-8b", tp=4, num_layers=2)
    assert cfg.num_layers == 2
    assert cfg.num_q_heads == 8 and cfg.num_kv_heads == 2


def test_unknown_name():
    with pytest.raises(KeyError):
        get_model_config("gpt-17")

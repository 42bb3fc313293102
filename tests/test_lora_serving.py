"""Multi-LoRA serving: per-token adapter routing through the model must
equal (a) the base model for idx=-1 tokens and (b) the adapter-merged
dense model for tokens on a slot — in ONE mixed batch."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.utils import assert_allclose
from vllm_xpu_kernels_tpu.models import (LlamaConfig, init_params,
                                         init_kv_cache, decode_step)
from vllm_xpu_kernels_tpu.models.lora import (init_lora_adapters,
                                              merge_adapter)


CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=128, quant="none", block_size=16)


def _decode(params, lora_params=None, lora_idx=None):
    b = 3
    kc, vc = init_kv_cache(CFG, 16)
    tok = jnp.asarray([5, 9, 14], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)
    logits, _, _ = decode_step(
        CFG, params, tok, kv_lens - 1, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32, lora_params=lora_params,
        lora_idx=None if lora_idx is None else jnp.asarray(
            lora_idx, jnp.int32))
    return np.asarray(logits, np.float32)


def test_mixed_adapter_batch():
    params = init_params(CFG, jax.random.PRNGKey(0))
    lora = init_lora_adapters(CFG, n_lora=2, rank=8,
                              key=jax.random.PRNGKey(5), alpha=16)
    # give the adapters real B weights (init is zeros)
    lora = jax.tree.map(
        lambda x: (jax.random.normal(jax.random.PRNGKey(hash(x.shape) % 97),
                                     x.shape, jnp.float32) * 0.05
                   ).astype(x.dtype)
        if hasattr(x, "ndim") and x.ndim == 3 and x.shape[-1] == 8
        else x, lora)

    base = _decode(params)
    mixed = _decode(params, lora, [-1, 0, 1])   # row 0 base, rows 1-2 LoRA

    # row 0 (idx -1): exactly the base model
    assert_allclose(mixed[0], base[0], rtol=1e-3, atol=1e-3)
    assert not np.allclose(mixed[1], base[1], atol=1e-2)

    # rows on a slot equal the adapter-merged dense model
    for slot in (0, 1):
        merged = merge_adapter(params, lora, slot)
        want = _decode(merged)
        assert_allclose(mixed[slot + 1], want[slot + 1],
                        rtol=5e-2, atol=5e-2)


def test_zero_init_adapters_are_noop():
    params = init_params(CFG, jax.random.PRNGKey(1))
    lora = init_lora_adapters(CFG, n_lora=2, rank=4)
    base = _decode(params)
    routed = _decode(params, lora, [0, 1, 0])
    assert_allclose(routed, base, rtol=1e-3, atol=1e-3)

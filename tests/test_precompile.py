"""AOT precompile: every bucket compiles ahead of time and executes the
decode step without retracing; pick_bucket raises an actionable error for
missing shapes (the reference's missing-kernel-combo UX)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.models import (LlamaConfig, init_params,
                                         init_kv_cache)
from vllm_xpu_kernels_tpu.models.precompile import (decode_buckets,
                                                    pick_bucket,
                                                    precompile_decode)


CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=128, quant="none", block_size=16)


def test_precompile_and_execute():
    params = init_params(CFG, jax.random.PRNGKey(0))
    kc, vc = init_kv_cache(CFG, 16)
    buckets = [(2, 2), (4, 4)]
    seen = []
    compiled = precompile_decode(CFG, params, (kc, vc), buckets,
                                 donate_cache=False,
                                 progress=seen.append)
    assert sorted(compiled) == buckets == sorted(seen)

    b, mb = pick_bucket(list(compiled), batch=2, n_blocks=2)
    assert (b, mb) == (2, 2)
    exe = compiled[(b, mb)]
    tok = jnp.asarray([5, 9], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    tbl = jnp.asarray(np.arange(b * mb).reshape(b, mb), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)
    logits, kc2, vc2 = exe(params, tok, kv_lens - 1, slots, tbl, kv_lens,
                           kc, vc)
    assert logits.shape == (b, CFG.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_pick_bucket_error():
    with pytest.raises(ValueError, match="precompile_decode"):
        pick_bucket(decode_buckets(), batch=128, n_blocks=64)

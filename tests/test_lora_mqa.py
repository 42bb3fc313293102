"""LoRA bgmv + DeepSeek MQA-logits tests (mirrors reference
tests/test_lora_ops.py and tests/mqa_logits/test_mqa_logits.py goldens)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.utils import assert_allclose


def test_bgmv_shrink_expand_roundtrip(impl):
    t, h, r, n_lora = 12, 64, 8, 3
    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, h)).astype(np.float32)
    la = rng.standard_normal((n_lora, r, h)).astype(np.float32) * 0.1
    lb = rng.standard_normal((n_lora, h, r)).astype(np.float32) * 0.1
    idx = rng.integers(-1, n_lora, t).astype(np.int32)
    base = rng.standard_normal((t, h)).astype(np.float32)

    shrunk = ops.bgmv_shrink(jnp.asarray(x), jnp.asarray(la),
                             jnp.asarray(idx), scaling=0.5)
    out = ops.bgmv_expand(shrunk, jnp.asarray(lb), jnp.asarray(base),
                          jnp.asarray(idx), add_inputs=True)
    golden = base.copy()
    for i in range(t):
        if idx[i] >= 0:
            mid = 0.5 * (la[idx[i]] @ x[i])
            golden[i] += lb[idx[i]] @ mid
    tol = 1e-4 if impl == "ref" else 5e-3   # kernel tier: bf16 operands
    assert_allclose(out, golden, rtol=tol, atol=tol)


def test_bgmv_expand_slice(impl):
    t, r, n_lora = 6, 4, 2
    h_slice, h_total, off = 16, 48, 16
    rng = np.random.default_rng(1)
    x = rng.standard_normal((t, r)).astype(np.float32)
    lb = rng.standard_normal((n_lora, h_slice, r)).astype(np.float32)
    idx = rng.integers(0, n_lora, t).astype(np.int32)
    base = rng.standard_normal((t, h_total)).astype(np.float32)
    out = ops.bgmv_expand_slice(
        jnp.asarray(x), jnp.asarray(lb), jnp.asarray(base),
        jnp.asarray(idx), off, h_slice, add_inputs=True)
    golden = base.copy()
    for i in range(t):
        golden[i, off:off + h_slice] += lb[idx[i]] @ x[i]
    tol = 1e-4 if impl == "ref" else 2e-2   # unscaled ~O(1) operands
    assert_allclose(out, golden, rtol=tol, atol=tol)
    # untouched columns preserved
    assert_allclose(np.asarray(out)[:, :off], base[:, :off], rtol=0, atol=0)


def test_moe_lora_align():
    t, k, e, n_lora, bs = 10, 2, 4, 3, 8
    rng = np.random.default_rng(2)
    ti = rng.integers(0, e, (t, k)).astype(np.int32)
    lora = rng.integers(0, n_lora, t).astype(np.int32)
    sorted_ids, expert_ids, lora_ids, total = ops.moe_lora_align_block_size(
        jnp.asarray(ti), jnp.asarray(lora), e, n_lora, bs)
    sorted_ids, expert_ids, lora_ids = map(
        np.asarray, (sorted_ids, expert_ids, lora_ids))
    numel = t * k
    flat_e = ti.reshape(-1)
    flat_l = np.repeat(lora, k)
    for blk in range(int(np.asarray(total)[0]) // bs):
        for sid in sorted_ids[blk * bs:(blk + 1) * bs]:
            if sid < numel:
                assert flat_e[sid] == expert_ids[blk]
                assert flat_l[sid] == lora_ids[blk]


def np_mqa_logits(q, kv, scale, weights, ks, ke):
    """Golden _pytorch_mqa_logits (test_mqa_logits.py:75-105)."""
    score = np.einsum("mhd,nd->hmn", q.astype(np.float32),
                      kv.astype(np.float32)) * scale[None, None, :]
    logits = np.einsum("hmn,mh->mn", np.maximum(score, 0), weights)
    n = np.arange(kv.shape[0])[None, :]
    mask = (n >= ks[:, None]) & (n < ke[:, None])
    return np.where(mask, logits, -np.inf)


def test_fp8_mqa_logits(impl):
    tq, tkv, h, d = 24, 48, 8, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float8_e4m3fn)
    kvf = rng.standard_normal((tkv, d)).astype(np.float32)
    amax = np.abs(kvf).max(-1, keepdims=True).clip(1e-4)
    sf = (amax / 448.0).astype(np.float32)
    kv = jnp.asarray(kvf / sf, jnp.float8_e4m3fn)
    w = rng.standard_normal((tq, h)).astype(np.float32)
    ks = np.zeros(tq, np.int32)
    ke = np.arange(tq, dtype=np.int32) + (tkv - tq)
    out = ops.fp8_mqa_logits(q, kv, jnp.asarray(sf[:, 0]), jnp.asarray(w),
                             jnp.asarray(ks), jnp.asarray(ke))
    golden = np_mqa_logits(np.asarray(q, np.float32),
                           np.asarray(kv, np.float32), sf[:, 0], w, ks, ke)
    out_np = np.asarray(out)
    np.testing.assert_array_equal(np.isneginf(out_np), np.isneginf(golden))
    fin = np.isfinite(golden)
    denom = max(1.0, np.abs(golden[fin]).max())
    assert_allclose(out_np[fin], golden[fin], rtol=2e-2, atol=2e-2 * denom)


@pytest.mark.parametrize("d,bs,max_model_len", [
    (64, 16, 128),    # unaligned head dim -> BlockSpec-pipelined variant
    (128, 64, 256),   # real V3.2 indexer head dim -> dma kernel
])
@pytest.mark.parametrize("next_n", [1, 2])
def test_fp8_paged_mqa_logits(next_n, d, bs, max_model_len, impl):
    b, h, nb = 3, 8, 32
    rng = np.random.default_rng(4)
    ctx = np.asarray([37, 80, 17], np.int32)
    q = jnp.asarray(rng.standard_normal((b, next_n, h, d)), jnp.bfloat16)
    kvf = rng.standard_normal((nb, bs, d)).astype(np.float32)
    amax = np.abs(kvf).max(-1, keepdims=True).clip(1e-4)
    sf = (amax / 448.0).astype(np.float32)
    kv_q = np.asarray(jnp.asarray(kvf / sf, jnp.float8_e4m3fn))
    # packed byte layout (reference kv_cache_cast_to_fp8)
    packed = np.zeros((nb, bs * (d + 4)), np.uint8)
    packed[:, : bs * d] = kv_q.view(np.uint8).reshape(nb, bs * d)
    packed[:, bs * d:] = sf.astype(np.float32).reshape(nb, bs).view(
        np.uint8).reshape(nb, bs * 4)
    packed = packed.reshape(nb, bs, 1, d + 4)
    maxblk = -(-max_model_len // bs)
    tbl = np.stack([rng.permutation(nb)[:maxblk] for _ in range(b)]
                   ).astype(np.int32)
    w = rng.standard_normal((b * next_n, h)).astype(np.float32)
    out = ops.fp8_paged_mqa_logits(
        q, jnp.asarray(packed), jnp.asarray(w), jnp.asarray(ctx),
        jnp.asarray(tbl), max_model_len)
    # golden
    kv_deq = kv_q.astype(np.float32) * sf
    qf = np.asarray(q, np.float32)
    golden = np.full((b, next_n, max_model_len), -np.inf, np.float32)
    for i in range(b):
        kvs = kv_deq[tbl[i]].reshape(-1, d)[:max_model_len]
        sc = np.einsum("nhd,kd->hnk", qf[i], kvs)
        ws = w[i * next_n:(i + 1) * next_n]
        lg = np.einsum("hnk,nh->nk", np.maximum(sc, 0), ws)
        qo = ctx[i] - next_n + np.arange(next_n)
        ko = np.arange(min(max_model_len, kvs.shape[0]))
        m = (ko[None, :] <= qo[:, None]) & (ko[None, :] < ctx[i])
        golden[i, :, :len(ko)] = np.where(m, lg[:, :len(ko)], -np.inf)
    golden = golden.reshape(b * next_n, max_model_len)
    out_np = np.asarray(out)
    np.testing.assert_array_equal(np.isneginf(out_np), np.isneginf(golden))
    fin = np.isfinite(golden)
    denom = max(1.0, np.abs(golden[fin]).max())
    assert_allclose(out_np[fin], golden[fin], rtol=2e-2, atol=2e-2 * denom)

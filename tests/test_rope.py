"""RoPE family tests vs numpy goldens (mirrors reference
tests/test_rotary_embedding.py, test_deepseek_scaling_rope.py,
test_multimodal_rotary_embedding.py, test_apply_rotary_emb.py,
test_fused_qk_norm_rope.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.utils import assert_allclose, keys, rand


def make_cos_sin_cache(max_pos, rot_dim, base=10000.0):
    inv = 1.0 / base ** (np.arange(0, rot_dim, 2) / rot_dim)
    t = np.arange(max_pos)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.cos(t), np.sin(t)], -1), jnp.float32
    )


def np_rope(x, cos, sin, is_neox):
    """x [..., rot], cos/sin [..., rot/2]"""
    if is_neox:
        c = np.concatenate([cos, cos], -1)
        s = np.concatenate([sin, sin], -1)
        h = x.shape[-1] // 2
        rot = np.concatenate([-x[..., h:], x[..., :h]], -1)
    else:
        c = np.repeat(cos, 2, -1)
        s = np.repeat(sin, 2, -1)
        x1, x2 = x[..., 0::2], x[..., 1::2]
        rot = np.stack([-x2, x1], -1).reshape(x.shape)
    return x * c + rot * s


@pytest.mark.parametrize("is_neox", [True, False])
@pytest.mark.parametrize("rot_dim,head_size", [(64, 64), (64, 128)])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_rotary_embedding(is_neox, rot_dim, head_size, dtype):
    k1, k2 = keys(0, 2)
    T, HQ, HK = 17, 8, 2
    cache = make_cos_sin_cache(128, rot_dim)
    pos = jnp.arange(T, dtype=jnp.int32) % 100
    q = rand(k1, (T, HQ * head_size), dtype)
    kk = rand(k2, (T, HK * head_size), dtype)
    q_out, k_out = ops.rotary_embedding(pos, q, kk, head_size, cache, is_neox)

    csn = np.asarray(cache)[np.asarray(pos)]
    cos, sin = csn[:, : rot_dim // 2], csn[:, rot_dim // 2 :]

    def golden(x, h):
        xr = np.asarray(x, np.float32).reshape(T, h, head_size)
        out = xr.copy()
        out[..., :rot_dim] = np_rope(
            xr[..., :rot_dim], cos[:, None], sin[:, None], is_neox
        )
        return out.reshape(T, h * head_size)

    tol = 2e-2 if dtype != jnp.float32 else 1e-5
    assert_allclose(q_out, golden(q, HQ), rtol=tol, atol=tol)
    assert_allclose(k_out, golden(kk, HK), rtol=tol, atol=tol)
    # key=None path
    q_only, none_k = ops.rotary_embedding(pos, q, None, head_size, cache, is_neox)
    assert none_k is None
    assert_allclose(q_only, q_out, rtol=0, atol=0)


@pytest.mark.parametrize("is_neox", [True, False])
@pytest.mark.parametrize("use_offsets", [False, True])
def test_deepseek_scaling_rope(is_neox, use_offsets):
    k1, k2 = keys(1, 2)
    T, H, rot, hs = 9, 16, 64, 96
    cache = make_cos_sin_cache(256, rot)
    pos = jnp.arange(T, dtype=jnp.int32) * 2
    offs = jnp.ones((T,), jnp.int32) * 3 if use_offsets else None
    q = rand(k1, (T, H, hs), jnp.float32)
    kk = rand(k2, (T, 1, hs), jnp.float32)
    q_out, k_out = ops.deepseek_scaling_rope(pos, q, kk, cache, rot, is_neox, offs)

    p = np.asarray(pos) + (3 if use_offsets else 0)
    csn = np.asarray(cache)[p]
    cos, sin = csn[:, : rot // 2], csn[:, rot // 2 :]
    golden = np.asarray(q, np.float32).copy()
    golden[..., :rot] = np_rope(golden[..., :rot], cos[:, None], sin[:, None], is_neox)
    assert_allclose(q_out, golden, rtol=1e-5, atol=1e-5)
    gk = np.asarray(kk, np.float32).copy()
    gk[..., :rot] = np_rope(gk[..., :rot], cos[:, None], sin[:, None], is_neox)
    assert_allclose(k_out, gk, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hs,rot,sections", [
    (96, 96, (16, 16, 16)),     # 3-section, rot == head
    (64, 64, (8, 12, 12)),      # reference Qwen2-VL-style shape
    (32, 32, (4, 4, 8)),        # small split
    (128, 96, (24, 12, 12)),    # partial rotary (rot < head)
    (32, 32, (16,)),            # single section == standard RoPE
])
@pytest.mark.parametrize("use_key", [False, True])
@pytest.mark.parametrize("T", [1, 16, 128])
def test_multimodal_rotary_embedding(hs, rot, sections, use_key, T):
    """Reference sweep grid (test_multimodal_rotary_embedding.py:154-168:
    head/rot/sections x use_key x num_tokens) + partial-rotary and the
    single-section == standard-RoPE equivalence."""
    k1, k2 = keys(2, 2)
    H, Hk = 4, 2
    cache = make_cos_sin_cache(600, rot)
    pos = jnp.stack(
        [jnp.arange(T), jnp.arange(T) * 2, jnp.arange(T) * 3]
    )[: len(sections) if len(sections) > 1 else 3].astype(jnp.int32)
    if len(sections) == 1:
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (3, T))
    q = rand(k1, (T, H * hs), jnp.float32)
    k = rand(k2, (T, Hk * hs), jnp.float32) if use_key else None
    q_out, k_out = ops.multimodal_rotary_embedding(
        pos, q, k, hs, cache, True, sections
    )
    # golden: build per-column cos/sin picking each section's axis
    csn = np.asarray(cache)
    pn = np.asarray(pos)
    cos = np.zeros((T, rot // 2), np.float32)
    sin = np.zeros((T, rot // 2), np.float32)
    start = 0
    for s, w in enumerate(sections):
        cos[:, start:start + w] = csn[pn[s], start:start + w]
        sin[:, start:start + w] = csn[pn[s],
                                      rot // 2 + start:rot // 2 + start + w]
        start += w

    def golden_of(x, h):
        xf = np.asarray(x, np.float32).reshape(T, h, hs).copy()
        xf[..., :rot] = np_rope(xf[..., :rot], cos[:, None], sin[:, None],
                                True)
        return xf.reshape(T, h * hs)

    assert_allclose(q_out, golden_of(q, H), rtol=1e-5, atol=1e-5)
    if use_key:
        assert_allclose(k_out, golden_of(k, Hk), rtol=1e-5, atol=1e-5)
    if len(sections) == 1:
        # single section: M-RoPE degenerates to token-indexed RoPE
        q_std, _ = ops.rotary_embedding(
            jnp.arange(T, dtype=jnp.int32), q, None, hs, cache,
            is_neox=True)
        assert_allclose(q_out, np.asarray(q_std, np.float32), rtol=1e-5,
                        atol=1e-5)


@pytest.mark.parametrize("is_neox", [False, True])
def test_apply_rotary_emb(is_neox):
    (k1,) = keys(3, 1)
    B, S, H, hs, rot = 2, 7, 4, 64, 32
    x = rand(k1, (B, S, H, hs), jnp.float32)
    inv = 1.0 / 10000.0 ** (np.arange(0, rot, 2) / rot)
    t = np.arange(S)[:, None] * inv[None, :]
    cos, sin = jnp.asarray(np.cos(t), jnp.float32), jnp.asarray(np.sin(t), jnp.float32)
    out = ops.apply_rotary_emb(x, cos, sin, is_neox)
    golden = np.asarray(x, np.float32).copy()
    golden[..., :rot] = np_rope(
        golden[..., :rot],
        np.cos(t)[None, :, None],
        np.sin(t)[None, :, None],
        is_neox,
    )
    assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_fused_qk_norm_rope():
    k1, k2, k3 = keys(4, 3)
    T, HQ, HK, HV, D = 13, 8, 2, 2, 64
    eps = 1e-6
    cache = make_cos_sin_cache(64, D)
    pos = jnp.arange(T, dtype=jnp.int32)
    qkv = rand(k1, (T, (HQ + HK + HV) * D), jnp.float32)
    qw = rand(k2, (D,), jnp.float32, scale=0.5)
    kw = rand(k3, (D,), jnp.float32, scale=0.5)
    out = ops.fused_qk_norm_rope(qkv, HQ, HK, HV, D, eps, qw, kw, cache, True, pos)

    x = np.asarray(qkv, np.float32).reshape(T, HQ + HK + HV, D)
    def norm(y, w):
        inv = 1.0 / np.sqrt((y * y).mean(-1, keepdims=True) + eps)
        return y * inv * w
    csn = np.asarray(cache)[np.asarray(pos)]
    cos, sin = csn[:, : D // 2], csn[:, D // 2 :]
    q = np_rope(norm(x[:, :HQ], np.asarray(qw)), cos[:, None], sin[:, None], True)
    kk = np_rope(
        norm(x[:, HQ : HQ + HK], np.asarray(kw)), cos[:, None], sin[:, None], True
    )
    golden = np.concatenate([q, kk, x[:, HQ + HK :]], 1).reshape(T, -1)
    assert_allclose(out, golden, rtol=1e-5, atol=1e-5)

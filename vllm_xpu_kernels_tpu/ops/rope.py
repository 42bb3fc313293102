"""Rotary position embedding family.

Reference semantics: csrc/pos_encoding_kernels.cpp:87-267 (NeoX/GPT-J RoPE),
csrc/fused_qknorm_rope.cpp (fused per-head QK RMSNorm + RoPE),
csrc/xpu/sycl/deepseek_scaling_rope.cpp (+ golden
tests/test_deepseek_scaling_rope.py:37-79), csrc/xpu/sycl/multimodal_rope.cpp
(M-RoPE), csrc/xpu/sycl/apply_rotary_emb.cpp with Python wrapper
vllm_xpu_kernels/rotary.py:18-61.  Schemas csrc/torch_bindings.cpp:130-144,
csrc/xpu/torch_bindings.cpp:56-80.

Layouts: ``cos_sin_cache`` is ``[max_position, rot_dim]`` with the first
``rot_dim/2`` columns cos and the rest sin.  NeoX style rotates split
halves of the rot span; GPT-J style rotates interleaved even/odd pairs.
Only the first ``rot_dim`` dims of each head are rotated; the rest pass
through.

TPU-first: these are gather + elementwise ops; expressed in jnp they fuse
into surrounding projections under jit (zero extra HBM passes), which is
the performance ceiling for this op class.  The fused QK-norm-RoPE op kept
as one function mirrors the reference's fusion win by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op


def _rotate_half_neox(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _rotate_gptj(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _expand_cos_sin(cos, sin, is_neox):
    """[..., rot/2] cos,sin -> [..., rot] matching the rotate fn layout."""
    if is_neox:
        return (
            jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1),
        )
    return (
        jnp.repeat(cos, 2, axis=-1),
        jnp.repeat(sin, 2, axis=-1),
    )


def _apply_rope(x_rot, cos, sin, is_neox):
    """x_rot [..., H, rot], cos/sin [..., rot] (broadcast over heads)."""
    rot = _rotate_half_neox(x_rot) if is_neox else _rotate_gptj(x_rot)
    xf = x_rot.astype(jnp.float32)
    return (xf * cos[..., None, :]
            + rot.astype(jnp.float32) * sin[..., None, :]).astype(
        x_rot.dtype
    )


@register_op("rotary_embedding", "rope")
def rotary_embedding(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array | None,
    head_size: int,
    cos_sin_cache: jax.Array,
    is_neox: bool = True,
):
    """Token-indexed NeoX/GPT-J RoPE on q (+optional k)
    (csrc/torch_bindings.cpp:131-135, csrc/pos_encoding_kernels.cpp:87-267).

    positions: int array, any leading shape matching query's leading dims.
    query/key: [..., num_heads * head_size].  Returns (query, key).
    """
    rot_dim = cos_sin_cache.shape[-1]
    embed = rot_dim // 2
    cs = cos_sin_cache[positions].astype(jnp.float32)  # [..., rot_dim]
    cos, sin = _expand_cos_sin(cs[..., :embed], cs[..., embed:], is_neox)

    def one(x):
        if x is None:
            return None
        *lead, hd = x.shape
        h = hd // head_size
        xh = x.reshape(*lead, h, head_size)
        x_rot = _apply_rope(xh[..., :rot_dim], cos, sin, is_neox)
        if rot_dim < head_size:
            x_rot = jnp.concatenate([x_rot, xh[..., rot_dim:]], axis=-1)
        return x_rot.reshape(*lead, hd)

    return one(query), one(key)


@register_op("fused_qk_norm_rope", "rope")
def fused_qk_norm_rope(
    qkv: jax.Array,
    num_heads_q: int,
    num_heads_k: int,
    num_heads_v: int,
    head_dim: int,
    eps: float,
    q_weight: jax.Array,
    k_weight: jax.Array,
    cos_sin_cache: jax.Array,
    is_neox: bool,
    position_ids: jax.Array,
) -> jax.Array:
    """Fused per-head RMSNorm on Q and K + RoPE, on packed QKV
    (csrc/torch_bindings.cpp:138-144, csrc/fused_qknorm_rope.cpp:20-535).

    qkv: [num_tokens, (Hq+Hk+Hv) * head_dim].  Returns updated qkv.
    """
    t = qkv.shape[0]
    h_all = num_heads_q + num_heads_k + num_heads_v
    x = qkv.reshape(t, h_all, head_dim)
    q = x[:, :num_heads_q]
    k = x[:, num_heads_q : num_heads_q + num_heads_k]
    v = x[:, num_heads_q + num_heads_k :]

    def headnorm(y, w):
        yf = y.astype(jnp.float32)
        var = jnp.mean(yf * yf, axis=-1, keepdims=True)
        return (yf * jax.lax.rsqrt(var + eps)
                * w.astype(jnp.float32)).astype(y.dtype)

    q = headnorm(q, q_weight)
    k = headnorm(k, k_weight)

    rot_dim = cos_sin_cache.shape[-1]
    embed = rot_dim // 2
    cs = cos_sin_cache[position_ids].astype(jnp.float32)
    cos, sin = _expand_cos_sin(cs[..., :embed], cs[..., embed:], is_neox)

    def rope(y):
        y_rot = _apply_rope(y[..., :rot_dim], cos, sin, is_neox)
        if rot_dim < head_dim:
            return jnp.concatenate([y_rot, y[..., rot_dim:]], axis=-1)
        return y_rot

    out = jnp.concatenate([rope(q), rope(k), v], axis=1)
    return out.reshape(t, h_all * head_dim)


@register_op("deepseek_scaling_rope", "rope")
def deepseek_scaling_rope(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array,
    cos_sin_cache: jax.Array,
    rotary_dim: int,
    is_neox_style: bool = True,
    offsets: jax.Array | None = None,
):
    """DeepSeek YaRN-scaled RoPE; cache already holds scaled cos/sin with
    mscale applied.  Returns (q, k)
    (csrc/xpu/torch_bindings.cpp:56-61; golden
    tests/test_deepseek_scaling_rope.py:37-79).

    query/key: [..., num_heads, head_size] (rotary span = first rotary_dim).
    """
    pos = positions if offsets is None else positions + offsets
    cs = cos_sin_cache[pos].astype(jnp.float32)
    cos, sin = _expand_cos_sin(
        cs[..., : rotary_dim // 2], cs[..., rotary_dim // 2 :], is_neox_style
    )

    def one(x):
        x_rot = _apply_rope(x[..., :rotary_dim], cos, sin, is_neox_style)
        if rotary_dim < x.shape[-1]:
            return jnp.concatenate([x_rot, x[..., rotary_dim:]], axis=-1)
        return x_rot

    return one(query), one(key)


@register_op("multimodal_rotary_embedding", "rope")
def multimodal_rotary_embedding(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array | None,
    head_size: int,
    cos_sin_cache: jax.Array,
    is_neox: bool,
    mrope_section: tuple[int, ...],
):
    """M-RoPE (Qwen2-VL): positions ``[num_sections, num_tokens]`` with
    ``mrope_section`` partitioning the rotary half-dim across t/h/w axes
    (csrc/xpu/torch_bindings.cpp:63-73, csrc/xpu/sycl/multimodal_rope.cpp).
    """
    rot_dim = cos_sin_cache.shape[-1]
    embed = rot_dim // 2
    assert sum(mrope_section) == embed, "mrope_section must sum to rot_dim/2"
    cs = cos_sin_cache[positions].astype(jnp.float32)  # [S, T, rot_dim]
    cos_s, sin_s = cs[..., :embed], cs[..., embed:]
    # pick section s for half-dim columns in that section
    pieces_c, pieces_s = [], []
    start = 0
    for s, width in enumerate(mrope_section):
        pieces_c.append(cos_s[s, :, start : start + width])
        pieces_s.append(sin_s[s, :, start : start + width])
        start += width
    cos = jnp.concatenate(pieces_c, axis=-1)  # [T, embed]
    sin = jnp.concatenate(pieces_s, axis=-1)
    cos, sin = _expand_cos_sin(cos, sin, is_neox)

    def one(x):
        if x is None:
            return None
        *lead, hd = x.shape
        h = hd // head_size
        xh = x.reshape(*lead, h, head_size)
        x_rot = _apply_rope(xh[..., :rot_dim], cos, sin, is_neox)
        if rot_dim < head_size:
            x_rot = jnp.concatenate([x_rot, xh[..., rot_dim:]], axis=-1)
        return x_rot.reshape(*lead, hd)

    return one(query), one(key)


@register_op("apply_rotary_emb", "rope")
def apply_rotary_emb(
    x: jax.Array, cos: jax.Array, sin: jax.Array, is_neox: bool = False
) -> jax.Array:
    """Flash-attn style RoPE with externally precomputed cos/sin (diffusion
    models; csrc/xpu/torch_bindings.cpp:77-80, wrapper
    vllm_xpu_kernels/rotary.py:18-61).

    x: [batch, seq, heads, head_size]; cos/sin: [seq, rot_dim/2].
    Rotates the first ``2*cos.shape[-1]`` dims of each head.
    """
    rot_dim = cos.shape[-1] * 2
    cos_e, sin_e = _expand_cos_sin(
        cos.astype(jnp.float32), sin.astype(jnp.float32), is_neox
    )
    # broadcast over batch: cos_e [seq, rot] -> [1, seq, rot]
    cos_e = cos_e[None]
    sin_e = sin_e[None]
    x_rot = _apply_rope(x[..., :rot_dim], cos_e, sin_e, is_neox)
    if rot_dim < x.shape[-1]:
        return jnp.concatenate([x_rot, x[..., rot_dim:]], axis=-1)
    return x_rot

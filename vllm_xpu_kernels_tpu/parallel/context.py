"""Ring attention (context parallelism) from the LSE-merge primitive.

The reference ships the building blocks — prefill kernels with ``lse=true``
("used for distributed attention merging", KERNEL_CONFIGURATION.md:189) and
the ``merge_attn_states`` combine op — and leaves composition to vLLM.
Here the composition is first-class: KV shards rotate around the mesh axis
with ``ppermute`` (ICI neighbour exchange) while each device accumulates
partial (O, LSE) and merges via the same LSE math as merge_attn_states.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _partial_attn(q, k, v, q_pos, k_pos, scale, causal, window):
    """Dense partial attention -> (O [T, H, D], LSE [H, T]) with global
    positions for causal/window masking."""
    logits = jnp.einsum(
        "qhd,khd->hqk",
        q.astype(jnp.float32) * scale,
        k.astype(jnp.float32))
    mask = jnp.zeros(logits.shape[1:], bool)
    if causal:
        mask = k_pos[None, :] > q_pos[:, None]
    wl, wr = window
    if wl >= 0:
        mask = mask | (k_pos[None, :] < q_pos[:, None] - wl)
    if wr >= 0:
        mask = mask | (k_pos[None, :] > q_pos[:, None] + wr)
    logits = jnp.where(mask[None], -jnp.inf, logits)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -1e30)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
    # o is un-normalized (numerator); lse carries the normalizer
    return o, (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0], l[..., 0]


def ring_attention(
    q: jax.Array,          # [Tq_local, H, D] this device's query chunk
    k: jax.Array,          # [Tkv_local, H, D] this device's KV shard
    v: jax.Array,
    axis: str,             # mesh axis to ring over (must be inside shard_map)
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    window: tuple[int, int] = (-1, -1),
    sink: Optional[jax.Array] = None,   # [H] per-head sink logits
):
    """Blockwise ring attention over a sharded sequence.

    Each device owns contiguous chunks (device i holds tokens
    ``[i*Tl, (i+1)*Tl)``).  KV rotates ``n-1`` times via ``ppermute``;
    partials merge with the merge_attn_states LSE math
    (reference: csrc/attention/merge_attn_states.cpp).  Returns the local
    output chunk [Tq_local, H, D].

    ``window`` masks in GLOBAL positions, so sliding-window layers
    (GPT-OSS local attention) shard unchanged — fully-out-of-window KV
    blocks contribute l=0 and merge as no-ops.  ``sink`` (per-head
    attention-sink logits, reference ``s_aux``) joins the softmax
    normalizer EXACTLY ONCE — at the final normalization, not per ring
    step — which is the subtle part the single-device kernels hide.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    tl = q.shape[0]
    kl = k.shape[0]
    q_pos = idx * tl + jnp.arange(tl)

    def kv_pos(owner):
        return owner * kl + jnp.arange(kl)

    # running (numerator, max, denom) in f32
    o_num = jnp.zeros((*q.shape[:2], v.shape[-1]), jnp.float32)
    m_run = jnp.full((q.shape[1], tl), -1e30, jnp.float32)
    l_run = jnp.zeros((q.shape[1], tl), jnp.float32)

    def merge(carry, o, lse_m, l_blk):
        o_num, m_run, l_run = carry
        m_new = jnp.maximum(m_run, lse_m)
        c_old = jnp.exp(m_run - m_new)
        c_new = jnp.exp(lse_m - m_new)
        l_out = l_run * c_old + l_blk * c_new
        o_out = (o_num * c_old.T[:, :, None]
                 + o * c_new.T[:, :, None])
        return o_out, m_new, l_out

    kv = (k, v)
    owner = idx
    carry = (o_num, m_run, l_run)
    perm = [(i, (i + 1) % n) for i in range(n)]
    for step in range(n):
        kk, vv = kv
        o_blk, lse_blk, l_blk = _partial_attn(
            q, kk, vv, q_pos, kv_pos(owner), scale, causal, window)
        # lse_blk = m + log l; recover block max for stable merge
        m_blk = lse_blk - jnp.log(jnp.maximum(l_blk, 1e-30))
        carry = merge(carry, o_blk, m_blk, l_blk)
        if step < n - 1:
            kv = jax.lax.ppermute(kv, axis, perm)
            owner = (owner - 1) % n
    o_num, m_run, l_run = carry
    if sink is not None:
        # the sink logit enters the softmax denominator once, globally
        s = sink.astype(jnp.float32)[:, None]        # [H, 1]
        m_f = jnp.maximum(m_run, s)
        l_run = l_run * jnp.exp(m_run - m_f) + jnp.exp(s - m_f)
        o_num = o_num * jnp.exp(m_run - m_f).T[:, :, None]
    out = o_num / jnp.maximum(l_run, 1e-30).T[:, :, None]
    return out.astype(q.dtype)

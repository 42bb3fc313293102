"""Ring attention (context parallelism) from the LSE-merge primitive.

The reference ships the building blocks — prefill kernels with ``lse=true``
("used for distributed attention merging", KERNEL_CONFIGURATION.md:189) and
the ``merge_attn_states`` combine op — and leaves composition to vLLM.
Here the composition is first-class: KV shards rotate around the mesh axis
with ``ppermute`` (ICI neighbour exchange) while each device merges partial
(O, LSE) with the merge_attn_states math.

Each ring block runs the REAL Pallas prefill kernel
(kernels/flash_attention.chunk_prefill): the kernel's per-seq
``causal_offsets`` override makes one causal kernel serve every ring case
— offset >= Kl means the block is fully visible, 0 is the self-attention
diagonal, and a very negative offset yields an l == 0 partial that merges
as a no-op.  The pure-jnp dense partial remains as the reference tier
(O(T_loc^2) f32 logits — golden twin only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import use_pallas

_NEG = -1e30


def _partial_attn(q, k, v, q_pos, k_pos, scale, causal, window):
    """Dense partial attention -> (O_norm [T, H, D] f32, LSE [H, T]) with
    global positions for causal/window masking (reference tier)."""
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
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), _NEG)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jnp.einsum("hqk,khd->qhd", p / l, v.astype(jnp.float32))
    return o, (m + jnp.log(l))[..., 0]


def _block_attn_kernel(q, k, v, offset, scale, causal, window):
    """One ring block on the Pallas prefill kernel ->
    (O_norm [T, H, Dv], LSE [H, T])."""
    from vllm_xpu_kernels_tpu.kernels import flash_attention as fa

    tl = q.shape[0]
    kl = k.shape[0]
    cu_q = jnp.asarray([0, tl], jnp.int32)
    cu_k = jnp.asarray([0, kl], jnp.int32)
    o, lse = fa.chunk_prefill(
        q, k, v, cu_q, cu_k, None, None,
        max_seqlen_q=tl, max_seqlen_k=kl, scale=scale, causal=causal,
        window=window, softcap=0.0, sink=None,
        k_descale=None, v_descale=None,
        causal_offsets=offset.reshape(1))
    return o.astype(jnp.float32), lse


def _lse_merge(o_run, lse_run, o_blk, lse_blk):
    """merge_attn_states math over normalized partials
    (csrc/attention/merge_attn_states.cpp; paper 2501.01005 §2.2)."""
    m = jnp.maximum(lse_run, lse_blk)
    w1 = jnp.exp(lse_run - m)
    w2 = jnp.exp(lse_blk - m)
    den = jnp.maximum(w1 + w2, 1e-38)
    o = (o_run * w1.T[:, :, None] + o_blk * w2.T[:, :, None]) \
        / den.T[:, :, None]
    return o, m + jnp.log(den)


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
    every block runs the Pallas prefill kernel with the TRUE global
    diagonal offset (``causal_offsets``), and partials merge with the
    merge_attn_states LSE math.  Returns the local output chunk
    [Tq_local, H, D].

    ``window`` masks in GLOBAL positions, so sliding-window layers
    (GPT-OSS local attention) shard unchanged — fully-out-of-window KV
    blocks contribute l == 0 and merge as no-ops.  ``sink`` (per-head
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
    kernel = use_pallas()
    q_pos = idx * tl + jnp.arange(tl)

    o_run = jnp.zeros((tl, q.shape[1], v.shape[-1]), jnp.float32)
    lse_run = jnp.full((q.shape[1], tl), _NEG, jnp.float32)

    kv = (k, v)
    owner = idx
    perm = [(i, (i + 1) % n) for i in range(n)]
    for step in range(n):
        kk, vv = kv
        if kernel:
            # global diagonal offset of this q chunk vs the block
            offset = (idx * tl - owner * kl).astype(jnp.int32)
            o_blk, lse_blk = _block_attn_kernel(
                q, kk, vv, offset, scale, causal, window)
        else:
            o_blk, lse_blk = _partial_attn(
                q, kk, vv, q_pos, owner * kl + jnp.arange(kl),
                scale, causal, window)
        o_run, lse_run = _lse_merge(o_run, lse_run, o_blk, lse_blk)
        if step < n - 1:
            kv = jax.lax.ppermute(kv, axis, perm)
            owner = (owner - 1) % n
    if sink is not None:
        # the sink logit enters the softmax denominator once, globally
        s = sink.astype(jnp.float32)[:, None]            # [H, 1]
        m = jnp.maximum(lse_run, s)
        den = jnp.exp(lse_run - m) + jnp.exp(s - m)
        o_run = o_run * (jnp.exp(lse_run - m) / den).T[:, :, None]
    return o_run.astype(q.dtype)


def cp_paged_decode(
    q: jax.Array,              # [B, Hq, D] decode queries (replicated)
    kv_cache: jax.Array,       # this shard's paged cache (fused layout ok)
    v_cache: Optional[jax.Array],
    seqused_k: jax.Array,      # [B] kv tokens held by THIS shard
    block_table: jax.Array,    # [B, max_blocks] into the LOCAL pool
    axis: str,                 # mesh axis the context is sharded over
    *,
    max_seqlen_k: int,
    scale: Optional[float] = None,
    window: tuple[int, int] = (-1, -1),
    sink: Optional[jax.Array] = None,
    k_descale=None, v_descale=None,
    kv_layout: str = "fused",
):
    """Context-parallel paged decode: each shard runs the paged-decode
    kernel over its own KV pages and the per-shard (O, LSE) partials
    combine with one pmax + two psums (the merge_attn_states math as
    collectives).  A shard holding zero tokens of a sequence contributes
    an l == 0 partial (weight exp(-69)·...) — a no-op in the merge.

    ``sink`` folds AFTER the cross-shard merge (exactly once).
    Must be called inside shard_map; q replicated over ``axis``, cache +
    block tables sharded.  Returns [B, Hq, Dv]."""
    from vllm_xpu_kernels_tpu import ops

    b = q.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    out, lse = ops.flash_attn_varlen_func(
        q, kv_cache, v_cache, 1, cu_q, max_seqlen_k,
        seqused_k=jnp.maximum(seqused_k, 0), block_table=block_table,
        causal=True, softmax_scale=scale, kv_layout=kv_layout,
        window_size=None if window == (-1, -1) else window,
        k_descale=k_descale, v_descale=v_descale,
        return_softmax_lse=True)
    # lse [Hq, B]; merge across shards
    m = jax.lax.pmax(lse, axis)
    w = jnp.exp(lse - m)                                  # [Hq, B]
    num = jax.lax.psum(out.astype(jnp.float32) * w.T[:, :, None], axis)
    den = jax.lax.psum(w, axis)
    if sink is not None:
        den = den + jnp.exp(sink.astype(jnp.float32)[:, None] - m)
    return (num / jnp.maximum(den, 1e-38).T[:, :, None]).astype(q.dtype)

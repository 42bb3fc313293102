"""GDN attention — Qwen3-Next gated delta net
(reference: csrc/xpu/gdn_attn/gdn_attn_interface.cpp:16-505 single mega-op,
causal conv kernels xe_2/chunk_causal_conv1d*.hpp, chunked delta-rule scan
xe_2/chunk_gated_delta_rule_kernels_xe2.hpp:53-1503; golden
tests/gdn_attn/test_gdn_attn.py ``ref_gdn_attention``).

Pipeline (mirroring the reference's): unpack packed qkvz/ba projections →
causal depthwise conv1d over the concatenated (conv_state ‖ tokens) window
(+ SiLU) → L2 norm on q,k → gated delta rule recurrence with inter-step
state carry → out, updated (conv_state, ssm_state).

TPU-first translation:

- varlen batches go through one padded [B, Tmax, ...] layout; prefill,
  decode AND speculative decode are all just sequences of different
  lengths, so the single varlen path replaces the reference's three
  sub-batch dispatches (gdn_attn_interface.cpp:296-505) — pass spec-decode
  drafts as length-``num_spec_tokens`` sequences.
- the depthwise causal conv is W static shifted multiply-adds (W = 4)
  fused by XLA — no im2col.
- the delta rule runs in the chunked (WY-transform) formulation by
  default — the reference's chunk=64 blocked algorithm re-derived as
  batched XLA matmuls + one batched triangular solve per chunk
  (``_chunked_delta_rule``); only the chunk-to-chunk state carry is
  sequential.  ``algorithm="scan"`` keeps the exact per-token recurrence
  as the golden twin.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op


def _softplus(x, threshold=20.0):
    return jnp.where(x > threshold, x, jax.nn.softplus(x))


def unpack_qkvz_ba(
    projected_states_qkvz,   # [T, NK*(2*Hk + 2*rep*Hv)]
    projected_states_ba,     # [T, NK*2*rep]
    num_k_heads, num_v_heads, head_k_dim, head_v_dim,
):
    """Packed per-k-head interleaved projections -> (qkv [T, C], z
    [T, NV, Hv], b [T, NV], a [T, NV]) (golden unpack,
    test_gdn_attn.py:109-143).  Head counts are per-rank (tp pre-divided,
    like every head-count arg in the reference)."""
    t = projected_states_qkvz.shape[0]
    nk, nv = num_k_heads, num_v_heads
    rep = nv // nk
    qkvz = projected_states_qkvz.reshape(
        t, nk, 2 * head_k_dim + 2 * rep * head_v_dim)
    q = qkvz[..., :head_k_dim].reshape(t, nk * head_k_dim)
    k = qkvz[..., head_k_dim:2 * head_k_dim].reshape(t, nk * head_k_dim)
    v = qkvz[..., 2 * head_k_dim:2 * head_k_dim + rep * head_v_dim].reshape(
        t, nk * rep * head_v_dim)
    z = qkvz[..., 2 * head_k_dim + rep * head_v_dim:].reshape(
        t, nv, head_v_dim)
    ba = projected_states_ba.reshape(t, nk, 2 * rep)
    b = ba[..., :rep].reshape(t, nv)
    a = ba[..., rep:].reshape(t, nv)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    return qkv, z, b, a


def _chunked_delta_rule(q, k, v, beta, g, s0, chunk=64):
    """Chunked gated delta rule — the reference's blocked formulation
    (chunk=64, sub-kernels prepare/compute_A/UT-inverse/compute_wu/fwd_o,
    csrc/xpu/gdn_attn/xe_2/chunk_gated_delta_rule_kernels_xe2.hpp:53-1503)
    re-derived for batched XLA matmuls.

    With S_t = g_t S_{t-1}(I − β_t k_t k_tᵀ) + β_t v_t k_tᵀ and per-chunk
    cumulative decays G_i = Π g, the WY transform gives (ρ rows solve a
    unit-lower-triangular system with decay-*ratio* weights, so nothing
    under/overflows):

        (I + A) ρ = β ⊙ (V − G ⊙ (K S₀ᵀ)),  A[i,j] = β_i (k_i·k_j) G_i/G_j
        O[i]  = G_i (Q S₀ᵀ)[i] + Σ_{j≤i} (q_i·k_j)(G_i/G_j) ρ_j
        S_C   = G_C S₀ + Σ_j ρ_jᵀ-outer (G_C/G_j) k_j

    All per-chunk work is batched matmuls + one batched triangular solve;
    only the chunk-to-chunk state carry is sequential (T/C scan steps
    instead of T).

    Shapes: q/k [B, T, NV, Hk] (q pre-scaled), v [B, T, NV, Hv],
    beta/g [B, T, NV], s0 [B, NV, Hv, Hk].  T must be a multiple of
    ``chunk`` with masked tail tokens given beta=0, g=1.
    Returns (o [B, T, NV, Hv], s_final).
    """
    from vllm_xpu_kernels_tpu.registry import use_pallas

    if use_pallas():
        from vllm_xpu_kernels_tpu.kernels.gdn import (
            chunked_delta_rule_pallas)

        return chunked_delta_rule_pallas(q, k, v, beta, g, s0, chunk=chunk)

    b, t, nv, hk = k.shape
    hv = v.shape[-1]
    c = chunk
    nc = t // c

    def to_chunks(x):
        return x.reshape(b, nc, c, *x.shape[2:]).transpose(
            1, 0, 3, 2, *range(4, x.ndim + 1))

    # [NC, B, NV, C, ...]
    qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)
    bc = beta.reshape(b, nc, c, nv).transpose(1, 0, 3, 2)
    gc = g.reshape(b, nc, c, nv).transpose(1, 0, 3, 2)

    tri_lo = jnp.tril(jnp.ones((c, c), jnp.bool_), -1)
    tri_inc = jnp.tril(jnp.ones((c, c), jnp.bool_), 0)
    eye = jnp.eye(c, dtype=jnp.float32)

    def chunk_step(s, xs):
        qh, kh, vh, bh, gh = xs               # [B, NV, C, ...]
        cs = jnp.cumsum(jnp.log(jnp.maximum(gh, 1e-30)), axis=-1)
        ratio = jnp.exp(cs[..., :, None] - cs[..., None, :])   # G_i/G_j
        kk = jnp.einsum("bvik,bvjk->bvij", kh, kh)
        a = jnp.where(tri_lo, bh[..., :, None] * kk * ratio, 0.0)
        ks0 = jnp.einsum("bvck,bvhk->bvch", kh, s)             # K S0^T
        gfull = jnp.exp(cs)                                    # G_i
        rhs = bh[..., None] * (vh - gfull[..., None] * ks0)
        rho = jax.scipy.linalg.solve_triangular(
            eye + a, rhs, lower=True)                          # [B,NV,C,Hv]
        qk = jnp.einsum("bvik,bvjk->bvij", qh, kh)
        m = jnp.where(tri_inc, qk * ratio, 0.0)
        o = (gfull[..., None] * jnp.einsum("bvck,bvhk->bvch", qh, s)
             + jnp.einsum("bvij,bvjh->bvih", m, rho))
        g_c = gfull[..., -1]                                   # G_C
        k_dec = kh * jnp.exp(
            cs[..., -1:, None].swapaxes(-1, -2) - cs[..., None])  # (G_C/G_j) k_j
        s_new = (g_c[..., None, None] * s
                 + jnp.einsum("bvjh,bvjk->bvhk", rho, k_dec))
        return s_new, o

    s_final, o_chunks = jax.lax.scan(chunk_step, s0, (qc, kc, vc, bc, gc))
    o = o_chunks.transpose(1, 0, 3, 2, 4).reshape(b, t, nv, hv)
    return o, s_final


@register_op("gdn_attention", "gdn")
def gdn_attention(
    projected_states_qkvz: jax.Array,
    projected_states_ba: jax.Array,
    conv_state: jax.Array,        # [n_state, W-1, C]
    ssm_state: jax.Array,         # [n_state, NV, Hv, Hk]
    conv_weights: jax.Array,      # [C, W]
    conv_bias: Optional[jax.Array],
    A_log: jax.Array,             # [NV]
    dt_bias: jax.Array,           # [NV]
    query_start_loc: jax.Array,   # [B+1]
    state_indices: jax.Array,     # [B]
    has_initial_state: jax.Array,  # [B] bool
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
    max_seqlen: int,
    activation: Optional[str] = "silu",
    algorithm: str = "chunk",      # chunk (blocked, MXU-bound) | scan
    chunk_size: int = 64,
):
    """-> (core_attn_out [T, NV, Hv], z [T, NV, Hv], conv_state, ssm_state).

    Recurrence (golden, test_gdn_attn.py:230-249):
      β = σ(b);  g = exp(−exp(A_log)·softplus(a + dt_bias))
      S ← g·S;  Δ = (v − S·k)·β;  S ← S + Δ⊗k;  o = S·q
    """
    t_total = projected_states_qkvz.shape[0]
    if algorithm == "chunk" and max_seqlen * 4 <= chunk_size:
        # decode / small spec-decode batches: the chunked path pads T up
        # to a whole chunk (a CxC triangular solve per head for a single
        # token at max_seqlen=1); the recurrent scan does exactly
        # max_seqlen steps of rank-1 updates — far cheaper
        algorithm = "scan"
    nk, nv, hk, hv = num_k_heads, num_v_heads, head_k_dim, head_v_dim
    rep = nv // nk
    batch = int(query_start_loc.shape[0]) - 1
    w = conv_weights.shape[-1]
    dtype = projected_states_qkvz.dtype
    eps = 1e-6
    scale = 1.0 / math.sqrt(hk)

    qkv, z, b, a = unpack_qkvz_ba(
        projected_states_qkvz, projected_states_ba, nk, nv, hk, hv)
    c = qkv.shape[-1]

    # ---- pad per-seq [B, Tmax, ...] -------------------------------------
    pos = jax.lax.broadcasted_iota(jnp.int32, (batch, max_seqlen), 1)
    starts = query_start_loc[:-1][:, None]
    lens = (query_start_loc[1:] - query_start_loc[:-1])[:, None]
    valid = pos < lens
    flat_idx = jnp.where(valid, starts + pos, 0).astype(jnp.int32)

    def pad(xflat):
        out = jnp.take(xflat, flat_idx.reshape(-1), axis=0).reshape(
            batch, max_seqlen, *xflat.shape[1:])
        return jnp.where(
            valid.reshape(batch, max_seqlen,
                          *([1] * (xflat.ndim - 1))), out, 0)

    qkv_p = pad(qkv).astype(jnp.float32)        # [B, Tm, C]
    b_p = pad(b).astype(jnp.float32)
    a_p = pad(a).astype(jnp.float32)

    # ---- causal depthwise conv over (state ‖ tokens) --------------------
    prefix = jnp.where(
        has_initial_state[:, None, None],
        jnp.take(conv_state, state_indices.astype(jnp.int32), axis=0),
        0).astype(jnp.float32)                  # [B, W-1, C]
    xin = jnp.concatenate([prefix, qkv_p], axis=1)  # [B, W-1+Tm, C]
    wf = conv_weights.astype(jnp.float32)
    conv = sum(xin[:, j:j + max_seqlen] * wf[None, None, :, j]
               for j in range(w))
    if conv_bias is not None:
        conv = conv + conv_bias.astype(jnp.float32)[None, None, :]
    if activation is not None:
        conv = jax.nn.silu(conv)
    conv = conv.astype(dtype).astype(jnp.float32)

    # updated conv_state: last W-1 rows of each seq's (state ‖ tokens)
    tail_idx = (lens + jnp.arange(w - 1, dtype=jnp.int32)[None, :])  # [B,W-1]
    new_tail = jnp.take_along_axis(xin, tail_idx[:, :, None], axis=1)
    conv_state = conv_state.at[state_indices.astype(jnp.int32)].set(
        new_tail.astype(conv_state.dtype), mode="drop")

    # ---- split + norms + gates -----------------------------------------
    q = conv[..., : nk * hk].reshape(batch, max_seqlen, nk, hk)
    k = conv[..., nk * hk: 2 * nk * hk].reshape(batch, max_seqlen, nk, hk)
    v = conv[..., 2 * nk * hk:].reshape(batch, max_seqlen, nv, hv)
    q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + eps) * scale
    k = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + eps)
    if rep > 1:
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)
    beta = jax.nn.sigmoid(b_p)                                    # [B,Tm,NV]
    g = jnp.exp(-jnp.exp(A_log.astype(jnp.float32))[None, None, :]
                * _softplus(a_p + dt_bias.astype(jnp.float32)))

    # ---- delta rule ----------------------------------------------------
    s0 = jnp.where(
        has_initial_state[:, None, None, None],
        jnp.take(ssm_state, state_indices.astype(jnp.int32), axis=0
                 ).astype(jnp.float32),
        0.0)                                    # [B, NV, Hv, Hk]

    if algorithm == "chunk":
        # masked tokens become exact no-ops: beta=0, g=1, q=0
        vm = valid[:, :, None]
        beta_m = jnp.where(vm, beta, 0.0)
        g_m = jnp.where(vm, g, 1.0)
        q_m = jnp.where(vm[..., None], q, 0.0)
        tm = max_seqlen
        pad_t = (-tm) % chunk_size
        if pad_t:
            def padt(x, fill):
                cfgpad = [(0, 0)] * x.ndim
                cfgpad[1] = (0, pad_t)
                return jnp.pad(x, cfgpad, constant_values=fill)
            q_m, k_, v_ = padt(q_m, 0), padt(k, 0), padt(v, 0)
            beta_m, g_m = padt(beta_m, 0), padt(g_m, 1)
        else:
            k_, v_ = k, v
        o_pad, s_final = _chunked_delta_rule(
            q_m, k_, v_, beta_m, g_m, s0, chunk=chunk_size)
        o_pad = o_pad[:, :tm]
    else:
        def step(s, xs):
            q_t, k_t, v_t, beta_t, g_t, valid_t = xs
            s_dec = s * g_t[:, :, None, None]
            kv_mem = jnp.einsum("bvhk,bvk->bvh", s_dec, k_t)
            delta = (v_t - kv_mem) * beta_t[:, :, None]
            s_new = s_dec + jnp.einsum("bvh,bvk->bvhk", delta, k_t)
            s_new = jnp.where(valid_t[:, None, None, None], s_new, s)
            o_t = jnp.einsum("bvhk,bvk->bvh", s_new, q_t)
            return s_new, o_t

        xs = (
            q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
            v.transpose(1, 0, 2, 3), beta.transpose(1, 0, 2),
            g.transpose(1, 0, 2), valid.T,
        )
        s_final, o_seq = jax.lax.scan(step, s0, xs)
        o_pad = o_seq.transpose(1, 0, 2, 3)     # [B, Tm, NV, Hv]
    ssm_state = ssm_state.at[state_indices.astype(jnp.int32)].set(
        s_final.astype(ssm_state.dtype), mode="drop")
    rows = jnp.arange(t_total, dtype=jnp.int32)
    seq_of_row = (jnp.searchsorted(query_start_loc, rows, side="right") - 1
                  ).astype(jnp.int32)
    seq_of_row = jnp.clip(seq_of_row, 0, batch - 1)
    pos_of_row = rows - query_start_loc[seq_of_row]
    out = o_pad[seq_of_row, pos_of_row].astype(dtype)
    return out, z.astype(dtype), conv_state, ssm_state

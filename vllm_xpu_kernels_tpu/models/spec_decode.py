"""Speculative decoding: draft-verify loop over the paged serving runtime.

The reference bakes spec-decode into its op contracts — the GDN mega-op
takes mixed prefill/decode/spec sub-batches (gdn_attn_interface.cpp:296-505)
and vLLM drives the loop.  A standalone engine owns the loop; this module
provides the pieces, proposer-agnostic:

- ``build_verify_batch``: append K draft tokens per sequence and emit the
  packed varlen arrays for a target-model ``prefill_step`` over existing
  KV (chunk-prefill with bottom-right-aligned causal masking verifies all
  K positions in one pass — the reference's mixed-batch chunk_prefill
  role, flash_api.cpp:236-322).
- ``greedy_verify``: longest-accepted-prefix rule for greedy decoding
  (exact: output sequence is identical to vanilla greedy decode).
- ``sample_verify``: rejection-sampling verification (Leviathan et al.,
  2211.17192 §3 / Chen et al. 2302.01318): accept draft ``d_j`` with
  probability ``min(1, p_j(d_j) / q_j(d_j))``, resample the first
  rejection from the residual ``norm(max(p - q, 0))``, bonus-sample from
  ``p_K`` on full acceptance.  The emitted stream is distributed EXACTLY
  as vanilla sampling from the target.  Composes with
  ``topk_topp_sampler``: the target distribution runs through the same
  ``apply_top_k_top_p`` filter + temperature as the vanilla sampler.
- ``rollback_rejected``: shrink per-seq KV lengths back past rejected
  tokens; paged KV makes rollback O(1) — stale slots are overwritten.

The loop accepts ``m+1`` tokens per verify step (m matched drafts plus the
target's own next token), so K drafts cost one target forward instead of
``m+1``.
"""

from __future__ import annotations

import numpy as np

from vllm_xpu_kernels_tpu.models.runtime import BlockManager


def build_verify_batch(mgr: BlockManager, seq_ids, draft_tokens):
    """Append each sequence's K drafts and emit packed verify arrays.

    draft_tokens: [B, K] int.  Returns (token_ids [B*K], positions,
    cu_q, slot_mapping, block_table, kv_lens, max_blocks) — inputs for
    prefill_step with the drafts as query tokens over existing KV.
    """
    drafts = np.asarray(draft_tokens, np.int64)
    b, k = drafts.shape
    assert b == len(seq_ids)
    base_lens = mgr.kv_lens_batch(seq_ids)
    token_ids, positions, slots = [], [], []
    for i, sid in enumerate(seq_ids):
        for j in range(k):
            mgr.append_token(sid)
        n = int(base_lens[i])
        token_ids.append(drafts[i])
        positions.append(np.arange(n, n + k, dtype=np.int32))
        slots.append(np.asarray(
            [mgr.slot(sid, p) for p in range(n, n + k)], np.int32))
    cu_q = np.arange(0, b * k + 1, k, dtype=np.int32)
    kv_lens = mgr.kv_lens_batch(seq_ids)
    max_blocks = max(len(mgr.tables[s]) for s in seq_ids)
    tbl = mgr.block_table_batch(seq_ids, max_blocks)
    return (np.concatenate(token_ids).astype(np.int32),
            np.concatenate(positions), cu_q,
            np.concatenate(slots), tbl, kv_lens, max_blocks)


def greedy_verify(logits, drafts):
    """Greedy acceptance.  ``drafts[:, 0]`` is the already-committed last
    token (fed to write its KV entry and get the next prediction);
    ``drafts[:, 1:]`` are the proposer's guesses.

    logits [B*K, V] packed (cu_q = arange*K): position j's logits are the
    target's prediction AFTER consuming fed token j, so guess j+1 is
    accepted iff it equals ``argmax(logits[j])``; the first mismatch is
    replaced by the target's own argmax (every verify step emits >= 1 new
    token, and the emitted stream is IDENTICAL to vanilla greedy decode).

    Returns (n_keep [B] — fed tokens to keep in KV, new_tokens [B, K],
    new_len [B] — count of newly generated tokens, i.e. new_tokens[:len];
    the last new token is the next step's committed token).
    """
    drafts = np.asarray(drafts, np.int64)
    b, k = drafts.shape
    pred = np.asarray(logits, np.float32).argmax(-1).reshape(b, k)
    new_tokens = np.zeros((b, k), np.int64)
    n_keep = np.zeros(b, np.int64)
    new_len = np.zeros(b, np.int64)
    for i in range(b):
        m = 0
        while m < k - 1 and drafts[i, m + 1] == pred[i, m]:
            m += 1
        n_keep[i] = m + 1                     # drafts[0..m] stay in KV
        new_len[i] = m + 1
        new_tokens[i, : m + 1] = pred[i, : m + 1]
    return n_keep, new_tokens, new_len


def sample_verify(
    logits,                 # [B*K, V] packed verify logits (cu_q=arange*K)
    drafts,                 # [B, K]; [:,0] committed, [:,1:] guesses
    draft_probs,            # [B, K-1, V] proposer distributions q_j
    key,                    # jax PRNG key for this verify step
    top_k=None,             # [B] int32 | None — vanilla-sampler params
    top_p=None,             # [B] f32   | None
    temperature=None,       # [B] f32   | None
):
    """Rejection-sampling verification (sampling analogue of
    ``greedy_verify``; same return contract).

    Position ``j``'s logits are the target's prediction AFTER consuming
    fed token ``j``.  The target distribution ``p_j`` is
    ``softmax(apply_top_k_top_p(logits_j / temperature, k, p))`` — the
    EXACT distribution ``topk_topp_sampler`` draws from in vanilla
    decoding, so the emitted stream is vanilla-sampling-distributed for
    ANY proposer.  Acceptance: draft ``d_j`` survives iff
    ``u_j * q_j(d_j) < p_j(d_j)`` (u ~ U[0,1)); the first rejection
    resamples from ``norm(max(p_j - q_j, 0))``; full acceptance draws
    the bonus token from ``p_{K-1}``.

    Returns (n_keep [B], new_tokens [B, K], new_len [B]) as numpy, like
    ``greedy_verify``.  All device math is vectorized jnp (no host loop).
    """
    import jax
    import jax.numpy as jnp

    from vllm_xpu_kernels_tpu.ops.sampler import apply_top_k_top_p

    drafts_np = np.asarray(drafts, np.int64)
    b, k = drafts_np.shape
    raw = jnp.asarray(logits, jnp.float32).reshape(b, k, -1)
    v = raw.shape[-1]
    if temperature is not None:
        raw = raw / jnp.maximum(
            jnp.asarray(temperature, jnp.float32).reshape(b, 1, 1), 1e-6)
    kk = None if top_k is None else jnp.repeat(
        jnp.asarray(top_k, jnp.int32), k)
    pp = None if top_p is None else jnp.repeat(
        jnp.asarray(top_p, jnp.float32), k)
    proc = apply_top_k_top_p(raw.reshape(b * k, v), kk, pp)
    pdist = jax.nn.softmax(proc, axis=-1).reshape(b, k, v)

    q = jnp.asarray(draft_probs, jnp.float32)            # [B, K-1, V]
    d = jnp.asarray(drafts_np[:, 1:])                    # [B, K-1]
    p_d = jnp.take_along_axis(pdist[:, : k - 1], d[..., None],
                              axis=-1)[..., 0]
    q_d = jnp.take_along_axis(q, d[..., None], axis=-1)[..., 0]
    key_u, key_s = jax.random.split(key)
    u = jax.random.uniform(key_u, (b, k - 1))
    acc = u * q_d < p_d                                  # [B, K-1]
    a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

    # replacement / bonus position: fed index `a` (== K-1 on full accept)
    rows = jnp.arange(b)
    p_pos = pdist[rows, a]                               # [B, V]
    q_pos = jnp.where((a < k - 1)[:, None],
                      q[rows, jnp.minimum(a, k - 2)], 0.0)
    resid = jnp.maximum(p_pos - q_pos, 0.0)
    norm = jnp.sum(resid, axis=-1, keepdims=True)
    # numerically-empty residual (q >= p everywhere): fall back to p
    resid = jnp.where(norm > 0, resid / jnp.maximum(norm, 1e-30), p_pos)
    logp = jnp.log(jnp.maximum(resid, 1e-30))
    sampled = jax.random.categorical(key_s, logp, axis=-1)  # [B]

    a_np = np.asarray(a, np.int64)
    sampled_np = np.asarray(sampled, np.int64)
    new_tokens = np.zeros((b, k), np.int64)
    n_keep = a_np + 1
    new_len = a_np + 1
    for i in range(b):
        new_tokens[i, : a_np[i]] = drafts_np[i, 1 : a_np[i] + 1]
        new_tokens[i, a_np[i]] = sampled_np[i]
    return n_keep, new_tokens, new_len


def rollback_rejected(mgr: BlockManager, seq_ids, base_lens, n_accept):
    """Shrink each sequence to base_len + n_accept (rejected draft slots
    die; the bonus token is written by the NEXT forward)."""
    for i, sid in enumerate(seq_ids):
        mgr.rollback(sid, int(base_lens[i]) + int(n_accept[i]))

"""Sampler ops: fused top-k/top-p filtering + exponential-race sampling,
per-row top-k for the DeepSeek sparse indexer, and the exponential RNG.

Reference surface (SURVEY.md §2.14):
- ``topk_topp_sampler``: fused filter + sample with per-seq seeds and
  logprobs modes (csrc/xpu/sampler/topk_topp_sampler.cpp:8-60, kernels
  topk_topp_sampler_kernels.hpp 1405 LoC; goldens
  tests/ops/topk_topp_sampler_op.py:25-123).
- ``top_k_per_row_prefill`` / ``top_k_per_row_decode``: histogram-based
  per-row top-k over masked vocab ranges (csrc/topk_per_row.cpp:15-50,
  adapted from vLLM sampler.cu).
- ``exponential_2d``: Philox4x32 exponential RNG
  (csrc/xpu/rand/exponential.cpp).

TPU-first: randomness uses JAX's counter-based threefry (the TPU-native
equivalent of the reference's Philox — both are stateless counter PRNGs,
seeds map to keys); top-k runs on XLA's fused sort/top_k.  The sampling
identity is the same exponential race the reference uses:
``argmax(probs / Exp(1))`` (topk_topp_sampler_op.py:25-56 random_sample).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import register_op

NEG_INF = float("-inf")


@register_op("apply_top_k_top_p", "sampler")
def apply_top_k_top_p(
    logits: jax.Array,                  # [B, V]
    k: Optional[jax.Array] = None,      # [B] int
    p: Optional[jax.Array] = None,      # [B] float
) -> jax.Array:
    """Mask logits outside per-row top-k / nucleus top-p
    (golden: apply_top_k_top_p_pytorch, topk_topp_sampler_op.py:81-123).
    Rows with k == vocab keep everything; the top-p mask always keeps the
    best token."""
    b, v = logits.shape
    out = logits.astype(jnp.float32)
    if k is None and p is None:
        return logits
    # ascending sort (matches the golden's sort direction)
    sort_idx = jnp.argsort(out, axis=-1)
    logits_sort = jnp.take_along_axis(out, sort_idx, axis=-1)
    if k is not None:
        kk = jnp.clip(k.astype(jnp.int32), 1, v)
        thresh = jnp.take_along_axis(
            logits_sort, (v - kk)[:, None], axis=-1)
        keep_all = (k == v)[:, None]
        mask = (logits_sort < thresh) & ~keep_all
        logits_sort = jnp.where(mask, NEG_INF, logits_sort)
    if p is not None:
        probs = jax.nn.softmax(logits_sort, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        top_p_mask = csum <= (1.0 - p.astype(jnp.float32))[:, None]
        top_p_mask = top_p_mask.at[:, -1].set(False)
        logits_sort = jnp.where(top_p_mask, NEG_INF, logits_sort)
    # scatter back to vocab order
    out = jnp.zeros_like(out).at[
        jnp.arange(b)[:, None], sort_idx].set(logits_sort)
    return out.astype(logits.dtype)


@register_op("exponential_2d", "sampler")
def exponential_2d(
    shape: tuple[int, int],
    seeds: jax.Array,          # [2] int64-ish (seed, offset)
    lambd: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Exponential(λ) samples (csrc/xpu/rand/exponential.cpp; the
    reference uses Philox4x32 — here threefry, the TPU-native counter
    PRNG; distributions match, streams differ by design)."""
    key = jax.random.fold_in(
        jax.random.PRNGKey(jnp.asarray(seeds[0], jnp.uint32)),
        jnp.asarray(seeds[1], jnp.uint32))
    return (jax.random.exponential(key, shape, jnp.float32) / lambd
            ).astype(dtype)


@register_op("topk_topp_sampler", "sampler")
def topk_topp_sampler(
    logits: jax.Array,                 # [B, V]
    key: jax.Array,                    # jax PRNG key
    k: Optional[jax.Array] = None,
    p: Optional[jax.Array] = None,
    seeds: Optional[jax.Array] = None,  # [B] per-request seeds (or -1)
    logprobs_mode: str = "raw_logits",
    temperature: Optional[jax.Array] = None,
):
    """Filter + exponential-race sample -> (token_ids [B], logprobs_out).

    ``seeds`` gives per-request reproducible streams (the reference's
    per-seq generators, topk_topp_sampler.cpp): requests with seed >= 0
    use fold_in(seed), others use the batch key.
    Returns logprobs per ``logprobs_mode`` ∈ {raw_logits, raw_logprobs,
    processed_logits, processed_logprobs} (reference LogprobsMode).
    """
    b, v = logits.shape
    raw = logits.astype(jnp.float32)
    if temperature is not None:
        raw = raw / jnp.maximum(
            temperature.astype(jnp.float32)[:, None], 1e-6)
    processed = apply_top_k_top_p(raw, k, p)
    probs = jax.nn.softmax(processed, axis=-1)
    q = jax.random.exponential(key, (b, v), jnp.float32)
    if seeds is not None:
        seeded = jax.vmap(
            lambda s: jax.random.exponential(
                jax.random.fold_in(key, s), (v,), jnp.float32))(seeds)
        q = jnp.where((seeds >= 0)[:, None], seeded, q)
    token_ids = jnp.argmax(probs / q, axis=-1).astype(jnp.int32)
    if logprobs_mode == "raw_logits":
        lp = raw
    elif logprobs_mode == "raw_logprobs":
        lp = jax.nn.log_softmax(raw, axis=-1)
    elif logprobs_mode == "processed_logits":
        lp = processed
    elif logprobs_mode == "processed_logprobs":
        lp = jax.nn.log_softmax(processed, axis=-1)
    else:
        raise ValueError(logprobs_mode)
    return token_ids, lp


@register_op("top_k_per_row_prefill", "sampler")
def top_k_per_row_prefill(
    logits: jax.Array,         # [R, V]
    row_starts: jax.Array,     # [R]
    row_ends: jax.Array,       # [R]
    top_k: int,
) -> jax.Array:
    """Per-row top-k indices over [row_start, row_end) windows
    (csrc/topk_per_row.cpp top_k_per_row_prefill; used by the DeepSeek-V3.2
    sparse indexer).  Returns indices [R, top_k] (value-descending);
    slots beyond the valid count are -1."""
    r, v = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, v), 1)
    valid = (col >= row_starts[:, None]) & (col < row_ends[:, None])
    masked = jnp.where(valid, logits.astype(jnp.float32), NEG_INF)
    _, idx = jax.lax.top_k(masked, top_k)
    n_valid = jnp.minimum(row_ends - row_starts, top_k)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, top_k), 1)
    return jnp.where(pos < n_valid[:, None], idx, -1).astype(jnp.int32)


@register_op("top_k_per_row_decode", "sampler")
def top_k_per_row_decode(
    logits: jax.Array,         # [R, V]  (R = B * next_n)
    next_n: int,
    seq_lens: jax.Array,       # [B]
    top_k: int,
) -> jax.Array:
    """Decode variant: row i (= b*next_n + j) sees
    [0, seq_len[b] - next_n + j + 1) (csrc/topk_per_row.cpp
    top_k_per_row_decode — speculative-decode position windows)."""
    r, v = logits.shape
    b = r // next_n
    bidx = jnp.arange(r, dtype=jnp.int32) // next_n
    j = jnp.arange(r, dtype=jnp.int32) % next_n
    ends = seq_lens.astype(jnp.int32)[bidx] - next_n + j + 1
    starts = jnp.zeros((r,), jnp.int32)
    return top_k_per_row_prefill(logits, starts, ends, top_k)

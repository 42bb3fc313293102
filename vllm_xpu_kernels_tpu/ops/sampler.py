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


def _topk_topp_full_sort(out, k, p):
    """Full-vocab ascending argsort reference path (golden semantics:
    apply_top_k_top_p_pytorch, topk_topp_sampler_op.py:81-123)."""
    b, v = out.shape
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
    return jnp.zeros_like(out).at[
        jnp.arange(b)[:, None], sort_idx].set(logits_sort)


def _f32_keys(x):
    """f32 -> order-preserving uint32 keys (sign-flip + bias trick; no
    int64 needed — JAX x64 is off by default and would truncate)."""
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    i = jnp.where(i < 0, i ^ 0x7FFFFFFF, i)
    return jax.lax.bitcast_convert_type(
        i ^ jnp.int32(-2 ** 31), jnp.uint32)


def _kth_key_bisect(keys, kk, rounds=18):
    """Per-row k-th largest KEY by 4-ary integer bisection — no sort.

    XLA's top_k on this TPU costs ~57 us PER ELEMENT extracted below
    k=1024 (iterative reduce-window) and a ~4 ms full sort above; ~18
    quartile-count rounds over the [B, V] uint32 key array find the
    exact order statistic at ~1 array pass per round.  ``kk`` is the
    1-based rank; the result t satisfies count(keys >= t) >= kk with t
    maximal — the value-threshold whose ties-keep mask equals the sort
    golden's."""
    one = jnp.uint32(1)

    def rnd(_, state):
        lo, hi = state
        q = (hi - lo) // jnp.uint32(4)
        # distinct interior thresholds even at tiny spans (equal
        # thresholds would shrink the interval by only 1/round)
        cs = [jnp.minimum(
            lo + jnp.maximum(q * jnp.uint32(j) + one, jnp.uint32(j)), hi)
              for j in (1, 2, 3)]                   # interior thresholds
        cnts = [jnp.sum((keys >= c[:, None]).astype(jnp.int32), axis=-1)
                for c in cs]
        # largest threshold whose count still reaches kk bounds below
        new_lo, new_hi = lo, cs[0] - one
        for j in range(3):
            ok = cnts[j] >= kk
            new_lo = jnp.where(ok, cs[j], new_lo)
            nh = (cs[j + 1] - one if j < 2 else hi)
            new_hi = jnp.where(ok, nh, new_hi)
        new_lo = jnp.clip(new_lo, lo, hi)
        new_hi = jnp.clip(new_hi, new_lo, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(
        0, rounds, rnd,
        (jnp.min(keys, axis=-1), jnp.max(keys, axis=-1)))
    return lo


def _nucleus_key_bisect(keys, ex, target, rounds=18):
    """Per-row minimal key t with mass{keys > t} < target (``ex`` holds
    exp(x - m) weights, zeroed outside the k-filter) — the top-p
    boundary as an order statistic on mass; same 4-ary bisection."""
    one = jnp.uint32(1)

    def rnd(_, state):
        lo, hi = state
        q = (hi - lo) // jnp.uint32(4)
        cs = [jnp.minimum(
            lo + jnp.maximum(q * jnp.uint32(j) + one, jnp.uint32(j)), hi)
              for j in (1, 2, 3)]
        ms = [jnp.sum(jnp.where(keys > c[:, None], ex, 0.0), axis=-1)
              for c in cs]
        # minimal t with mass < target: pull hi down to the smallest
        # passing threshold, push lo past failing ones
        new_lo, new_hi = cs[2] + one, hi
        for j in (2, 1, 0):
            ok = ms[j] < target
            new_hi = jnp.where(ok, cs[j], new_hi)
            nl = (cs[j - 1] + one if j > 0 else lo)
            new_lo = jnp.where(ok, nl, new_lo)
        new_lo = jnp.clip(new_lo, lo, hi)
        new_hi = jnp.clip(new_hi, new_lo, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(
        0, rounds, rnd,
        (jnp.min(keys, axis=-1), jnp.max(keys, axis=-1)))
    # the quartile thresholds never test t == lo, so a converged
    # interval can stall at [ans, ans+1]; one final pred(lo) resolves it
    m_lo = jnp.sum(jnp.where(keys > lo[:, None], ex, 0.0), axis=-1)
    return jnp.where(m_lo < target, lo, hi)


def _topk_topp_thresholds(raw, k, p, rounds=18):
    """-> (uint32 keys [B, V], per-row uint32 KEY threshold) implementing
    the golden top-k / top-p mask as ``keep iff key(x) >= t`` (exact
    modulo value ties, which the golden breaks by sort position —
    measure-zero for float logits)."""
    b, v = raw.shape
    keys = _f32_keys(raw)
    t = jnp.zeros((b,), jnp.uint32)
    if k is not None:
        kk = jnp.clip(k.astype(jnp.int32), 1, v)
        t_k = _kth_key_bisect(keys, kk, rounds)
        t = jnp.maximum(t, jnp.where(kk >= v, t, t_k))
    if p is not None:
        m = jnp.max(raw, axis=-1, keepdims=True)
        ex = jnp.exp(raw - m)
        # the golden renormalizes top-p over the k-filtered logits
        exf = jnp.where(keys >= t[:, None], ex, 0.0)
        z_k = jnp.sum(exf, axis=-1)
        t_p = _nucleus_key_bisect(
            keys, exf, p.astype(jnp.float32) * z_k, rounds)
        t = jnp.maximum(t, t_p)
    return keys, t


@register_op("apply_top_k_top_p", "sampler")
def apply_top_k_top_p(
    logits: jax.Array,                  # [B, V]
    k: Optional[jax.Array] = None,      # [B] int
    p: Optional[jax.Array] = None,      # [B] float
    window: int = 2048,                 # kept for API compat; unused
) -> jax.Array:
    """Mask logits outside per-row top-k / nucleus top-p
    (golden: apply_top_k_top_p_pytorch, topk_topp_sampler_op.py:81-123).
    Rows with k == vocab keep everything; the top-p mask always keeps the
    best token.

    Large vocabularies use exact 4-ary key bisection for both thresholds
    (the reference's histogram-kernel role, topk_per_row.cpp) — XLA's
    sort at [32, 128k] costs ~4.7 ms and its top_k is no better; the
    bisection is ~18 counting passes.  Small vocabularies keep the
    direct sort."""
    b, v = logits.shape
    out = logits.astype(jnp.float32)
    if k is None and p is None:
        return logits
    if v <= 4096:
        return _topk_topp_full_sort(out, k, p).astype(logits.dtype)
    keys, t = _topk_topp_thresholds(out, k, p)
    return jnp.where(keys < t[:, None], NEG_INF, out).astype(logits.dtype)


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


def _race(probs, key, seeds, shape_cols):
    """Exponential-race draw over ``probs`` columns -> argmax index.
    Per-request seeded streams when seeds[i] >= 0."""
    b = probs.shape[0]
    q = jax.random.exponential(key, (b, shape_cols), jnp.float32)
    if seeds is not None:
        seeded = jax.vmap(
            lambda s: jax.random.exponential(
                jax.random.fold_in(key, s), (shape_cols,), jnp.float32)
        )(seeds)
        q = jnp.where((seeds >= 0)[:, None], seeded, q)
    return jnp.argmax(probs / q, axis=-1).astype(jnp.int32)


@register_op("topk_topp_sampler", "sampler")
def topk_topp_sampler(
    logits: jax.Array,                 # [B, V]
    key: jax.Array,                    # jax PRNG key
    k: Optional[jax.Array] = None,
    p: Optional[jax.Array] = None,
    seeds: Optional[jax.Array] = None,  # [B] per-request seeds (or -1)
    logprobs_mode: str = "raw_logits",
    temperature: Optional[jax.Array] = None,
    window: int = 2048,                 # kept for API compat; unused
):
    """Filter + exponential-race sample -> (token_ids [B], logprobs_out).

    ``seeds`` gives per-request reproducible streams (the reference's
    per-seq generators, topk_topp_sampler.cpp): requests with seed >= 0
    use fold_in(seed), others use the batch key.
    Returns logprobs per ``logprobs_mode`` in {raw_logits, raw_logprobs,
    processed_logits, processed_logprobs} (reference LogprobsMode).

    The filter runs through apply_top_k_top_p (exact key bisection at
    large vocab — no sort), then the exponential race over the filtered
    softmax (the reference's fused filter+sample design,
    topk_topp_sampler_kernels.hpp, without its per-WG histograms)."""
    b, v = logits.shape
    raw = logits.astype(jnp.float32)
    if temperature is not None:
        raw = raw / jnp.maximum(
            temperature.astype(jnp.float32)[:, None], 1e-6)
    processed = apply_top_k_top_p(raw, k, p)
    probs = jax.nn.softmax(processed, axis=-1)
    token_ids = _race(probs, key, seeds, v)
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

"""Sampler op tests (mirrors reference tests/test_topk_topp_sampler.py,
test_topk_per_row.py, test_exponential_2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.utils import assert_allclose


def np_apply_top_k_top_p(logits, k, p):
    """Golden: apply_top_k_top_p_pytorch (topk_topp_sampler_op.py:81-123)."""
    out = logits.astype(np.float32).copy()
    b, v = out.shape
    idx = np.argsort(out, axis=-1)
    srt = np.take_along_axis(out, idx, axis=-1)
    if k is not None:
        thr = np.take_along_axis(srt, (v - k)[:, None], axis=-1)
        mask = (srt < thr) & (k != v)[:, None]
        srt[mask] = -np.inf
    if p is not None:
        e = np.exp(srt - np.nanmax(np.where(np.isfinite(srt), srt, -1e30),
                                   -1, keepdims=True))
        e[~np.isfinite(srt)] = 0
        probs = e / e.sum(-1, keepdims=True)
        cs = np.cumsum(probs, -1)
        m = cs <= (1 - p)[:, None]
        m[:, -1] = False
        srt[m] = -np.inf
    res = np.zeros_like(out)
    np.put_along_axis(res, idx, srt, axis=-1)
    return res


@pytest.mark.parametrize("use_k", [True, False])
@pytest.mark.parametrize("use_p", [True, False])
def test_apply_top_k_top_p(use_k, use_p):
    b, v = 8, 512
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((b, v)).astype(np.float32) * 3
    k = rng.integers(1, v + 1, b).astype(np.int32) if use_k else None
    p = rng.uniform(0.1, 1.0, b).astype(np.float32) if use_p else None
    out = ops.apply_top_k_top_p(
        jnp.asarray(logits),
        None if k is None else jnp.asarray(k),
        None if p is None else jnp.asarray(p))
    golden = np_apply_top_k_top_p(logits, k, p)
    out_np = np.asarray(out)
    # compare finite masks and surviving values
    np.testing.assert_array_equal(np.isfinite(out_np), np.isfinite(golden))
    fin = np.isfinite(golden)
    assert_allclose(out_np[fin], golden[fin], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_k", [True, False])
@pytest.mark.parametrize("use_p", [True, False])
def test_apply_top_k_top_p_bisect(use_k, use_p):
    """The exact key-bisection threshold path (large vocab, no sort)
    matches the full-sort golden, including keep-all rows, k beyond any
    window, and near-flat logits with a wide nucleus."""
    if not (use_k or use_p):
        return
    b, v, window = 8, 8192, 64
    rng = np.random.default_rng(5)
    logits = rng.standard_normal((b, v)).astype(np.float32) * 3
    k = rng.integers(1, 300, b).astype(np.int32) if use_k else None
    if use_k:
        k[0] = v          # keep-all row
    p = rng.uniform(0.3, 0.9, b).astype(np.float32) if use_p else None
    out = ops.apply_top_k_top_p(
        jnp.asarray(logits),
        None if k is None else jnp.asarray(k),
        None if p is None else jnp.asarray(p), window=window)
    out_np = np.asarray(out)
    if p is None:
        # top-k thresholds are exact order statistics: bitwise mask match
        golden = np_apply_top_k_top_p(logits, k, p)
        np.testing.assert_array_equal(
            np.isfinite(out_np), np.isfinite(golden))
        fin = np.isfinite(golden)
        assert_allclose(out_np[fin], golden[fin], rtol=1e-5, atol=1e-5)
    else:
        # top-p boundary tokens are decided by f32 mass sums whose
        # accumulation ORDER differs between the bisection and the
        # golden's ascending cumsum — sandwich between golden masks at
        # p*(1 -/+ eps) (monotone in p) instead of bit-matching
        g_lo = np.isfinite(np_apply_top_k_top_p(logits, k, p * (1 - 1e-4)))
        g_hi = np.isfinite(np_apply_top_k_top_p(logits, k, p * (1 + 1e-4)))
        ours = np.isfinite(out_np)
        assert not (g_lo & ~ours).any()
        assert not (ours & ~g_hi).any()
        assert_allclose(out_np[ours], logits[ours].astype(np.float32),
                        rtol=1e-5, atol=1e-5)

    # near-flat logits (wide nucleus / k past any window heuristic)
    logits2 = rng.standard_normal((b, v)).astype(np.float32) * 0.01
    k2 = (np.full(b, window + 9, np.int32) if use_k else None)
    p2 = np.full(b, 0.999, np.float32) if use_p else None
    out2 = np.asarray(ops.apply_top_k_top_p(
        jnp.asarray(logits2),
        None if k2 is None else jnp.asarray(k2),
        None if p2 is None else jnp.asarray(p2), window=window))
    ours2 = np.isfinite(out2)
    if p2 is None:
        golden2 = np_apply_top_k_top_p(logits2, k2, p2)
        np.testing.assert_array_equal(ours2, np.isfinite(golden2))
    else:
        g2_lo = np.isfinite(
            np_apply_top_k_top_p(logits2, k2, p2 * (1 - 1e-4)))
        g2_hi = np.isfinite(
            np_apply_top_k_top_p(logits2, k2, p2 * (1 + 1e-4)))
        assert not (g2_lo & ~ours2).any()
        assert not (ours2 & ~g2_hi).any()


def test_topk_topp_sampler_statistics():
    """Sampled distribution matches the filtered softmax (reference
    validates via fixed seeds; we validate the distribution itself)."""
    v = 16
    logits = jnp.asarray(np.linspace(0, 2, v, dtype=np.float32))[None, :]
    logits = jnp.tile(logits, (4096, 1))
    k = jnp.full((4096,), 4, jnp.int32)
    toks, lp = ops.topk_topp_sampler(
        logits, jax.random.PRNGKey(0), k=k, logprobs_mode="processed_logits")
    toks = np.asarray(toks)
    assert toks.min() >= v - 4  # only top-4 tokens ever sampled
    # empirical freq ~ softmax over top-4
    top = np.asarray(logits[0, -4:], np.float32)
    pref = np.exp(top - top.max()); pref /= pref.sum()
    emp = np.bincount(toks - (v - 4), minlength=4) / toks.size
    assert np.abs(emp - pref).max() < 0.05
    assert np.isneginf(np.asarray(lp)[0, 0])


def test_topk_topp_sampler_seeded_reproducible():
    b, v = 4, 128
    rng = np.random.default_rng(1)
    logits_np = rng.standard_normal((b, v)).astype(np.float32)
    logits_np[2] = logits_np[0]   # identical row + identical seed
    logits = jnp.asarray(logits_np)
    seeds = jnp.asarray([7, -1, 7, 9], jnp.int32)
    t1, _ = ops.topk_topp_sampler(logits, jax.random.PRNGKey(5), seeds=seeds)
    t2, _ = ops.topk_topp_sampler(logits, jax.random.PRNGKey(5), seeds=seeds)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # same per-request seed + same logits row => same sample
    assert int(t1[0]) == int(t1[2])


def test_exponential_2d_statistics():
    """Mean/var of Exp(λ) (reference test_exponential_2d statistical
    check)."""
    x = np.asarray(ops.exponential_2d((512, 512), jnp.asarray([3, 0]), 2.0))
    assert abs(x.mean() - 0.5) < 0.02
    assert abs(x.var() - 0.25) < 0.03
    assert (x >= 0).all()


@pytest.mark.parametrize("num_rows,top_k", [(16, 8), (64, 32)])
def test_top_k_per_row_prefill(num_rows, top_k):
    v = 256
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((num_rows, v)).astype(np.float32)
    starts = np.zeros(num_rows, np.int32)
    ends = np.arange(1, num_rows + 1, dtype=np.int32) * (v // num_rows)
    idx = np.asarray(ops.top_k_per_row_prefill(
        jnp.asarray(logits), jnp.asarray(starts), jnp.asarray(ends), top_k))
    for r in range(num_rows):
        n_valid = min(top_k, ends[r] - starts[r])
        got = set(idx[r, :n_valid].tolist())
        want = set(np.argsort(-logits[r, :ends[r]])[:n_valid].tolist())
        assert got == want, r
        assert (idx[r, n_valid:] == -1).all()


def test_top_k_per_row_decode():
    b, next_n, v, k = 3, 2, 128, 16
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((b * next_n, v)).astype(np.float32)
    seq_lens = np.asarray([40, 90, 128], np.int32)
    idx = np.asarray(ops.top_k_per_row_decode(
        jnp.asarray(logits), next_n, jnp.asarray(seq_lens), k))
    for r in range(b * next_n):
        bi, j = divmod(r, next_n)
        end = seq_lens[bi] - next_n + j + 1
        n_valid = min(k, end)
        got = set(idx[r, :n_valid].tolist())
        want = set(np.argsort(-logits[r, :end])[:n_valid].tolist())
        assert got == want, r


def test_sampler_filter_edge_cases():
    """k=1 (greedy survivor), p covering everything vs p tiny (top-1
    nucleus), duplicate max logits, and all-equal rows — the boundary
    semantics the reference kernel encodes in its histogram passes
    (topk_topp_sampler_kernels.hpp)."""
    rng = np.random.default_rng(5)
    b, v = 6, 257
    logits = rng.standard_normal((b, v)).astype(np.float32) * 2
    logits[1] = 0.0                       # all-equal row
    logits[2, 10] = logits[2].max() + 0.0 # duplicate max (exact tie)
    logits[2, 20] = logits[2, 10]

    # k=1 is a threshold filter (x >= kth value): untied rows keep
    # exactly the argmax; tied maxima ALL survive (the reference's
    # histogram-threshold semantics — ties at the boundary are kept)
    out = np.asarray(ops.apply_top_k_top_p(
        jnp.asarray(logits), jnp.full(b, 1, jnp.int32), None))
    n_max = (logits == logits.max(-1, keepdims=True)).sum(-1)
    np.testing.assert_array_equal(np.isfinite(out).sum(-1), n_max)
    rows = np.arange(b)
    assert np.isfinite(out[rows, logits.argmax(-1)]).all()

    # p = 1.0 keeps everything
    out = np.asarray(ops.apply_top_k_top_p(
        jnp.asarray(logits), None, jnp.full(b, 1.0, jnp.float32)))
    assert np.isfinite(out).all()

    # tiny p: the nucleus always keeps >= 1 token, and a MAX-valued one
    # (with exact ties any tied column may be the survivor)
    out = np.asarray(ops.apply_top_k_top_p(
        jnp.asarray(logits), None, jnp.full(b, 1e-6, jnp.float32)))
    assert (np.isfinite(out).sum(-1) >= 1).all()
    surv_max = np.where(np.isfinite(out), out, -np.inf).max(-1)
    np.testing.assert_allclose(surv_max, logits.max(-1), rtol=1e-6)

    # k = v keeps everything
    out = np.asarray(ops.apply_top_k_top_p(
        jnp.asarray(logits), jnp.full(b, v, jnp.int32), None))
    assert np.isfinite(out).all()

    # large-vocab BISECT path (v > 4096): all-equal rows with k=1 /
    # tiny p keep every tied value (threshold semantics) — never an
    # empty row (which would NaN the downstream softmax)
    vz = 8192
    zeros = jnp.zeros((2, vz), jnp.float32)
    for kk, pp in ((jnp.full(2, 1, jnp.int32), None),
                   (None, jnp.full(2, 1e-6, jnp.float32))):
        o = np.asarray(ops.apply_top_k_top_p(zeros, kk, pp))
        assert (np.isfinite(o).sum(-1) >= 1).all()


def test_topk_topp_sampler_k1_is_greedy():
    """k=1 sampling must be deterministic argmax for any key/seed."""
    rng = np.random.default_rng(6)
    b, v = 8, 512
    logits = rng.standard_normal((b, v)).astype(np.float32) * 3
    for s in range(3):
        ids, _ = ops.topk_topp_sampler(
            jnp.asarray(logits), jax.random.PRNGKey(s),
            k=jnp.full(b, 1, jnp.int32))
        np.testing.assert_array_equal(np.asarray(ids), logits.argmax(-1))


def test_topk_topp_sampler_temperature_sharpens():
    """Low temperature concentrates samples on the argmax; high
    temperature spreads them (distribution sanity over many draws)."""
    rng = np.random.default_rng(7)
    v = 64
    logits = rng.standard_normal(v).astype(np.float32)
    n = 512
    lo_hits = hi_hits = 0
    batch = jnp.asarray(np.tile(logits, (n, 1)))
    ids_lo, _ = ops.topk_topp_sampler(
        batch, jax.random.PRNGKey(0),
        temperature=jnp.full(n, 0.05, jnp.float32))
    ids_hi, _ = ops.topk_topp_sampler(
        batch, jax.random.PRNGKey(1),
        temperature=jnp.full(n, 3.0, jnp.float32))
    am = int(logits.argmax())
    lo_hits = (np.asarray(ids_lo) == am).mean()
    hi_hits = (np.asarray(ids_hi) == am).mean()
    assert lo_hits > 0.95, lo_hits
    assert hi_hits < 0.5, hi_hits

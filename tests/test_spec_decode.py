"""Speculative decoding: the draft-verify loop must emit EXACTLY the
vanilla greedy-decode stream for any proposer (greedy acceptance is
lossless), and accept everything when the proposer is oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.models import (
    LlamaConfig, init_params, init_kv_cache, decode_step, prefill_step)
from vllm_xpu_kernels_tpu.models.runtime import (
    BlockManager, build_decode_batch, build_prefill_batch)
from vllm_xpu_kernels_tpu.models.spec_decode import (
    build_verify_batch, greedy_verify, rollback_rejected)


CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=128, quant="none", block_size=16)
K = 4  # fed tokens per verify step (1 committed + K-1 guesses)


def _prefill(params, prompts, mgr, kc, vc):
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(mgr, prompts)
    logits, kc, vc = prefill_step(
        CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc,
        max_seqlen_q=-(-max_q // 8) * 8, max_seqlen_k=-(-max_k // 16) * 16)
    last = np.asarray(logits, np.float32)[np.asarray(cu_q[1:]) - 1]
    return seq_ids, last, kc, vc


def _vanilla_greedy(params, prompts, n_new):
    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    seq_ids, last, kc, vc = _prefill(params, dict(prompts), mgr, kc, vc)
    tok = last.argmax(-1).astype(np.int64)
    gen = {i: [int(tok[i])] for i in seq_ids}
    while min(len(gen[i]) for i in seq_ids) < n_new:
        batch = build_decode_batch(mgr, seq_ids, tok, max_blocks=4)
        logits, kc, vc = decode_step(
            CFG, params, jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
            kc, vc, max_seqlen_k=64)
        tok = np.asarray(logits, np.float32).argmax(-1).astype(np.int64)
        for i in seq_ids:
            gen[i].append(int(tok[i]))
    return gen


def _spec_greedy(params, prompts, n_new, proposer):
    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    seq_ids, last, kc, vc = _prefill(params, dict(prompts), mgr, kc, vc)
    committed = last.argmax(-1).astype(np.int64)
    gen = {i: [int(committed[i])] for i in seq_ids}
    accepts = []
    while min(len(gen[i]) for i in seq_ids) < n_new:
        base_lens = mgr.kv_lens_batch(seq_ids).copy()
        drafts = np.zeros((len(seq_ids), K), np.int64)
        drafts[:, 0] = committed
        drafts[:, 1:] = proposer(gen, seq_ids)
        (tok, pos, cu_q, slots, tbl, kv_lens, mb) = build_verify_batch(
            mgr, seq_ids, drafts)
        logits, kc, vc = prefill_step(
            CFG, params, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
            jnp.asarray(kv_lens), kc, vc,
            max_seqlen_q=-(-K // 8) * 8, max_seqlen_k=64)
        n_keep, new_tokens, new_len = greedy_verify(
            np.asarray(logits, np.float32), drafts)
        rollback_rejected(mgr, seq_ids, base_lens, n_keep)
        for i, sid in enumerate(seq_ids):
            gen[sid].extend(int(t) for t in new_tokens[i, : new_len[i]])
        committed = new_tokens[np.arange(len(seq_ids)), new_len - 1]
        accepts.append(n_keep.copy())
    return gen, np.asarray(accepts)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(4))
    rng = np.random.default_rng(0)
    prompts = {0: rng.integers(0, CFG.vocab_size, 11).astype(np.int64),
               1: rng.integers(0, CFG.vocab_size, 23).astype(np.int64)}
    vanilla = _vanilla_greedy(params, prompts, 9)
    return params, prompts, vanilla


def test_spec_decode_random_drafts_lossless(setup):
    """Adversarial proposer (random guesses): output identical anyway."""
    params, prompts, vanilla = setup
    rng = np.random.default_rng(7)

    def proposer(gen, seq_ids):
        return rng.integers(0, CFG.vocab_size, (len(seq_ids), K - 1))

    gen, accepts = _spec_greedy(params, prompts, 9, proposer)
    for i in vanilla:
        n = min(len(vanilla[i]), len(gen[i]))
        assert gen[i][:n] == vanilla[i][:n], f"seq {i} diverged"
    # random drafts almost never match: mostly 1 token kept per step
    assert accepts.mean() < 2.0


def test_spec_decode_oracle_drafts_accept_all(setup):
    """Oracle proposer (the vanilla continuation): full acceptance, K
    tokens per verify step."""
    params, prompts, vanilla = setup

    def proposer(gen, seq_ids):
        out = np.zeros((len(seq_ids), K - 1), np.int64)
        for i, sid in enumerate(seq_ids):
            done = len(gen[sid])
            cont = vanilla[sid][done:done + K - 1]
            out[i, :len(cont)] = cont
        return out

    gen, accepts = _spec_greedy(params, prompts, 9, proposer)
    for i in vanilla:
        n = min(len(vanilla[i]), len(gen[i]))
        assert gen[i][:n] == vanilla[i][:n], f"seq {i} diverged"
    assert accepts[0].min() == K  # first steps: everything accepted


def test_rollback_frees_blocks():
    mgr = BlockManager(8, 16)
    mgr.allocate(0, 20)           # 2 blocks
    free0 = len(mgr.free)
    for _ in range(30):
        mgr.append_token(0)       # 50 tokens -> 4 blocks
    assert len(mgr.free) == free0 - 2
    mgr.rollback(0, 21)
    assert mgr.lens[0] == 21 and len(mgr.tables[0]) == 2
    assert len(mgr.free) == free0


# ---------------------------------------------------------------------------
# sampling-based verification (rejection sampling)
# ---------------------------------------------------------------------------

from vllm_xpu_kernels_tpu.models.spec_decode import sample_verify  # noqa: E402


def test_sample_verify_matches_target_distribution():
    """The emitted first token is distributed EXACTLY as vanilla sampling
    from the (filtered) target, for an arbitrary proposer — the lossless
    guarantee of rejection sampling.  Single-draft (K=2) case, empirical
    TV distance over many keys."""
    rng = np.random.default_rng(11)
    v, n = 8, 30000
    target_logits = rng.standard_normal(v).astype(np.float32) * 1.5
    q_logits = rng.standard_normal(v).astype(np.float32) * 1.5
    pt = np.exp(target_logits - target_logits.max())
    pt /= pt.sum()
    qd = np.exp(q_logits - q_logits.max())
    qd /= qd.sum()

    # batch the n trials: each row draws its own draft from q
    key = jax.random.PRNGKey(0)
    kd, kv_ = jax.random.split(key)
    drafts_guess = np.asarray(
        jax.random.categorical(kd, jnp.asarray(q_logits)[None, :].repeat(
            n, 0), axis=-1))
    drafts = np.zeros((n, 2), np.int64)
    drafts[:, 1] = drafts_guess
    # logits for fed position 0 (= the verify position) and 1 (bonus)
    logits = np.tile(target_logits, (n * 2, 1))
    dprobs = np.tile(qd, (n, 1, 1))
    n_keep, new_tokens, new_len = sample_verify(
        logits, drafts, dprobs, kv_)
    emitted = new_tokens[np.arange(n), 0]
    emp = np.bincount(emitted, minlength=v) / n
    tv = 0.5 * np.abs(emp - pt).sum()
    assert tv < 0.02, (tv, emp, pt)
    # acceptance rate equals sum min(p, q)
    acc_rate = (n_keep - 1).mean()
    assert abs(acc_rate - np.minimum(pt, qd).sum()) < 0.02


def test_sample_verify_oracle_proposer_accepts_all():
    """q == p  =>  acceptance probability sum(min(p, q)) == 1: every
    draft accepted, bonus sampled from the last position."""
    rng = np.random.default_rng(12)
    b, k, v = 4, 4, 16
    logits = rng.standard_normal((b * k, v)).astype(np.float32)
    pt = np.exp(logits - logits.max(-1, keepdims=True))
    pt /= pt.sum(-1, keepdims=True)
    pt = pt.reshape(b, k, v)
    key = jax.random.PRNGKey(3)
    drafts = np.zeros((b, k), np.int64)
    for j in range(1, k):
        # any draft value works as long as q(d) == p(d); draw from p
        key, sub = jax.random.split(key)
        drafts[:, j] = np.asarray(jax.random.categorical(
            sub, jnp.log(jnp.asarray(pt[:, j - 1])), axis=-1))
    n_keep, new_tokens, new_len = sample_verify(
        logits.reshape(b * k, v), drafts, pt[:, : k - 1], key)
    assert (n_keep == k).all(), n_keep
    assert (new_len == k).all()
    np.testing.assert_array_equal(new_tokens[:, : k - 1], drafts[:, 1:])


def test_sample_verify_respects_topk_filter():
    """Composition with topk_topp_sampler's filter: emitted tokens always
    lie in the target's top-k support, even when the proposer puts all
    its mass outside it."""
    rng = np.random.default_rng(13)
    b, v, n_trials = 16, 32, 40
    logits1 = rng.standard_normal((b, v)).astype(np.float32) * 2.0
    topk = 4
    allowed = np.argsort(-logits1, axis=-1)[:, :topk]
    # proposer mass entirely on the WORST token
    worst = np.argsort(-logits1, axis=-1)[:, -1]
    qd = np.full((b, 1, v), 1e-9, np.float32)
    qd[np.arange(b), 0, worst] = 1.0
    drafts = np.zeros((b, 2), np.int64)
    drafts[:, 1] = worst
    logits = np.repeat(logits1, 2, axis=0)
    for t in range(n_trials):
        n_keep, new_tokens, new_len = sample_verify(
            logits, drafts, qd, jax.random.PRNGKey(t),
            top_k=np.full(b, topk, np.int32))
        assert (n_keep == 1).all()     # filtered target prob of worst = 0
        for i in range(b):
            assert new_tokens[i, 0] in allowed[i]


def test_spec_decode_sampling_e2e(setup):
    """Full loop: drafts through the verify batch + scheduler + paged
    rollback with the SAMPLING verifier.  Deterministic per key; every
    emitted token lies in the filtered target support; KV bookkeeping
    stays consistent (rollback leaves lens == generated count)."""
    params, prompts, _ = setup
    topk = 8

    def run(seed):
        mgr = BlockManager(64, CFG.block_size)
        kc, vc = init_kv_cache(CFG, 64)
        seq_ids, last, kc, vc = _prefill(params, dict(prompts), mgr, kc, vc)
        key = jax.random.PRNGKey(seed)
        # first committed token: vanilla top-k sample
        from vllm_xpu_kernels_tpu import ops as vops

        key, sub = jax.random.split(key)
        committed, _ = vops.topk_topp_sampler(
            jnp.asarray(last), sub, k=jnp.full(len(seq_ids), topk,
                                               jnp.int32))
        committed = np.asarray(committed, np.int64)
        gen = {i: [int(committed[j])] for j, i in enumerate(seq_ids)}
        rng = np.random.default_rng(seed)
        n_new = 7
        while min(len(gen[i]) for i in seq_ids) < n_new:
            base_lens = mgr.kv_lens_batch(seq_ids).copy()
            drafts = np.zeros((len(seq_ids), K), np.int64)
            drafts[:, 0] = committed
            drafts[:, 1:] = rng.integers(0, CFG.vocab_size,
                                         (len(seq_ids), K - 1))
            dprobs = np.full((len(seq_ids), K - 1, CFG.vocab_size),
                             1.0 / CFG.vocab_size, np.float32)
            (tok, pos, cu_q, slots, tbl, kv_lens, mb) = build_verify_batch(
                mgr, seq_ids, drafts)
            logits, kc, vc = prefill_step(
                CFG, params, jnp.asarray(tok), jnp.asarray(pos),
                jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
                jnp.asarray(kv_lens), kc, vc,
                max_seqlen_q=-(-K // 8) * 8, max_seqlen_k=64)
            key, sub = jax.random.split(key)
            n_keep, new_tokens, new_len = sample_verify(
                np.asarray(logits, np.float32), drafts, dprobs, sub,
                top_k=np.full(len(seq_ids), topk, np.int32))
            # every emitted token lies in its verify position's top-k
            lg = np.asarray(logits, np.float32).reshape(
                len(seq_ids), K, -1)
            for i, sid in enumerate(seq_ids):
                for j in range(int(new_len[i])):
                    sup = np.argsort(-lg[i, j])[:topk]
                    assert new_tokens[i, j] in sup
            rollback_rejected(mgr, seq_ids, base_lens, n_keep)
            for i, sid in enumerate(seq_ids):
                gen[sid].extend(int(t) for t in new_tokens[i, :new_len[i]])
            committed = new_tokens[np.arange(len(seq_ids)), new_len - 1]
        # KV length == prompt + generated - 1 (last token not yet fed)
        for i, sid in enumerate(seq_ids):
            assert mgr.lens[sid] == len(prompts[sid]) + len(gen[sid]) - 1
        return gen

    g1, g2 = run(21), run(21)
    assert g1 == g2, "sampling spec decode must be deterministic per key"
    g3 = run(22)
    assert g3 != g1  # different key explores a different stream

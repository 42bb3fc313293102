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

"""Qwen3-Next-family hybrid model: incremental paged+recurrent decode must
reproduce teacher-forced full-prefill logits — this exercises the GDN
conv/ssm state carry, the gated full-attention KV path, and the MoE MLP
together (reference's gdn_attention op contract:
csrc/xpu/gdn_attn/gdn_attn_interface.cpp:16-505)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils import assert_allclose
from vllm_xpu_kernels_tpu.models import qwen3_next as Q
from vllm_xpu_kernels_tpu.models.runtime import (
    BlockManager, build_decode_batch, build_prefill_batch)


CFG = Q.Qwen3NextConfig(
    hidden_size=128, num_layers=4, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=0, vocab_size=256, max_position=128,
    quant="none", block_size=16,
    full_attn_interval=2, partial_rotary_factor=0.25,
    linear_num_k_heads=2, linear_num_v_heads=4,
    linear_k_head_dim=16, linear_v_head_dim=16,
    num_experts=4, top_k=2, moe_intermediate_size=64,
    shared_intermediate_size=96)


def _prefill(params, prompts, mgr, state, cfg=CFG):
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(mgr, prompts)
    max_q = -(-max_q // 8) * 8
    kc, vc, conv, ssm = state
    logits, kc, vc, conv, ssm = Q.prefill_step(
        cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), jnp.asarray(np.asarray(seq_ids, np.int32)),
        kc, vc, conv, ssm,
        max_seqlen_q=max_q, max_seqlen_k=-(-max_k // 16) * 16)
    last = np.asarray(logits, np.float32)[np.asarray(cu_q[1:]) - 1]
    return seq_ids, last, (kc, vc, conv, ssm)


def test_hybrid_layer_structure():
    assert CFG.num_attn_layers == 2 and CFG.num_gdn_layers == 2
    p = Q.init_params(CFG, jax.random.PRNGKey(0))
    assert "wqkvg" in p["layers"][1] and "in_qkvz" in p["layers"][0]


@pytest.mark.parametrize("head_dim", [32, 128])
def test_incremental_decode_matches_teacher_forcing(head_dim):
    # head_dim=128 takes the fused [nb, Hkv, bs, 2*D] KV-page layout in
    # the gated full-attention layers; 32 takes the split pair
    cfg = dataclasses.replace(CFG, head_dim=head_dim)
    params = Q.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    prompt_lens = [9, 21]
    prompts = {i: rng.integers(0, cfg.vocab_size, n).astype(np.int64)
               for i, n in enumerate(prompt_lens)}
    n_steps = 4

    mgr = BlockManager(64, cfg.block_size)
    state = Q.init_state(cfg, 64, num_state_slots=8)
    if head_dim == 128:
        assert state[1][0] is None, "expected fused KV pages"
    seq_ids, last, state = _prefill(params, prompts, mgr, state, cfg)
    next_tok = last.argmax(-1).astype(np.int64)
    gen = {i: [int(next_tok[i])] for i in seq_ids}

    for _ in range(n_steps):
        batch = build_decode_batch(mgr, seq_ids, next_tok, max_blocks=4)
        kc, vc, conv, ssm = state
        logits, kc, vc, conv, ssm = Q.decode_step(
            cfg, params, jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
            jnp.asarray(np.asarray(seq_ids, np.int32)),
            kc, vc, conv, ssm, max_seqlen_k=64)
        state = (kc, vc, conv, ssm)
        next_tok = np.asarray(logits, np.float32).argmax(-1).astype(np.int64)
        for i in seq_ids:
            gen[i].append(int(next_tok[i]))

    # teacher-forced golden: fresh prefill over prompt + generated prefix
    for step in range(n_steps):
        seqs = {i: np.concatenate([prompts[i], gen[i][:step + 1]])
                for i in seq_ids}
        mgr2 = BlockManager(64, cfg.block_size)
        state2 = Q.init_state(cfg, 64, num_state_slots=8)
        _, last2, _ = _prefill(params, seqs, mgr2, state2, cfg)
        want = last2.argmax(-1)
        got = np.asarray([gen[i][step + 1] for i in seq_ids])
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"diverged at step {step}")


def test_decode_state_isolation():
    """Sequences in different state slots don't interfere: decoding one
    sequence alone equals decoding it inside a batch."""
    params = Q.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(1)
    prompts = {0: rng.integers(0, CFG.vocab_size, 12).astype(np.int64),
               1: rng.integers(0, CFG.vocab_size, 7).astype(np.int64)}

    mgr = BlockManager(64, CFG.block_size)
    state = Q.init_state(CFG, 64, num_state_slots=8)
    seq_ids, last, state = _prefill(params, prompts, mgr, state)
    tok = last.argmax(-1).astype(np.int64)
    batch = build_decode_batch(mgr, seq_ids, tok, max_blocks=4)
    kc, vc, conv, ssm = state
    logits_b, *_ = Q.decode_step(
        CFG, params, jnp.asarray(batch.token_ids),
        jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
        jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
        jnp.asarray(np.asarray(seq_ids, np.int32)),
        kc, vc, conv, ssm, max_seqlen_k=64)

    # sequence 0 alone, fresh managers
    mgr1 = BlockManager(64, CFG.block_size)
    state1 = Q.init_state(CFG, 64, num_state_slots=8)
    sid1, last1, state1 = _prefill(params, {0: prompts[0]}, mgr1, state1)
    b1 = build_decode_batch(mgr1, sid1, tok[:1], max_blocks=4)
    kc1, vc1, conv1, ssm1 = state1
    logits_1, *_ = Q.decode_step(
        CFG, params, jnp.asarray(b1.token_ids), jnp.asarray(b1.positions),
        jnp.asarray(b1.slot_mapping), jnp.asarray(b1.block_table),
        jnp.asarray(b1.kv_lens), jnp.asarray(np.asarray(sid1, np.int32)),
        kc1, vc1, conv1, ssm1, max_seqlen_k=64)

    assert_allclose(np.asarray(logits_b, np.float32)[0],
                    np.asarray(logits_1, np.float32)[0],
                    rtol=2e-2, atol=2e-2)

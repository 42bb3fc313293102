"""Continuous-batching scheduler: admission, chunked prefill, preemption
by recompute.  Every scheduling decision must be invisible in the output —
each request's greedy generation must equal the teacher-forced golden
(full-prefill argmax at every step) no matter how it was batched, chunked,
or preempted."""

import numpy as np
import pytest

import jax

from vllm_xpu_kernels_tpu.models import (
    LlamaConfig, init_params, init_kv_cache, decode_step, prefill_step)
from vllm_xpu_kernels_tpu.models.runtime import BlockManager
from vllm_xpu_kernels_tpu.models.scheduler import (
    Request, Scheduler, serve)

CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=256, quant="none", block_size=16)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(7))


def _golden_generate(params, prompt, n_new):
    """Teacher-forced greedy continuation: full prefill of prompt+prefix
    at every step, argmax of the last-token logits."""
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models.runtime import build_prefill_batch

    toks = list(prompt)
    out = []
    for _ in range(n_new):
        mgr = BlockManager(64, CFG.block_size)
        kc, vc = init_kv_cache(CFG, 64)
        (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
         mq, mk) = build_prefill_batch(
            mgr, {0: np.asarray(toks, np.int64)})
        logits, _, _ = prefill_step(
            CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
            jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
            jnp.asarray(kv_lens), kc, vc,
            max_seqlen_q=-(-mq // 8) * 8, max_seqlen_k=-(-mk // 16) * 16)
        nxt = int(np.asarray(logits, np.float32)[cu_q[-1] - 1].argmax())
        out.append(nxt)
        toks.append(nxt)
    return out


def _run_serve(params, requests, num_blocks, **sched_kw):
    mgr = BlockManager(num_blocks, CFG.block_size)
    kc, vc = init_kv_cache(CFG, num_blocks)
    sched = Scheduler(mgr, **sched_kw)
    return serve(CFG, params, kc, vc, requests, prefill_step=prefill_step,
                 decode_step=decode_step, scheduler=sched, mgr=mgr)


def test_admission_and_completion(params):
    """More requests than one batch; staggered lengths; all complete and
    match the per-sequence teacher-forced golden."""
    rng = np.random.default_rng(3)
    lens = [13, 30, 5, 22, 9]
    n_new = [4, 3, 6, 2, 5]
    reqs = [Request(i, rng.integers(0, CFG.vocab_size, n).astype(np.int64),
                    m) for i, (n, m) in enumerate(zip(lens, n_new))]
    prompts = {r.seq_id: r.prompt.copy() for r in reqs}
    outs, sched = _run_serve(params, reqs, num_blocks=64,
                             max_batch=3, prefill_token_budget=64)
    for r in reqs:
        golden = _golden_generate(params, prompts[r.seq_id],
                                  r.max_new_tokens)
        assert outs[r.seq_id] == golden, r.seq_id


def test_chunked_prompt_admission(params):
    """A prompt longer than the prefill token budget is admitted over
    several chunks and still generates the golden continuation."""
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, CFG.vocab_size, 75).astype(np.int64)
    reqs = [Request(0, prompt.copy(), 4)]
    outs, sched = _run_serve(params, reqs, num_blocks=64,
                             prefill_token_budget=16)
    assert outs[0] == _golden_generate(params, prompt, 4)


def test_preemption_recompute(params):
    """A pool too small for all sequences forces preemption; evicted
    sequences recompute (prompt + generated) and still match golden."""
    rng = np.random.default_rng(9)
    lens = [30, 28, 26]
    n_new = 12
    reqs = [Request(i, rng.integers(0, CFG.vocab_size, n).astype(np.int64),
                    n_new) for i, n in enumerate(lens)]
    prompts = {r.seq_id: r.prompt.copy() for r in reqs}
    # 8 blocks of 16 = 128 token slots; the three sequences grow to
    # 42/40/38 tokens = 3 blocks each (9 total) -> the third block-
    # boundary crossing finds the pool empty and must evict
    outs, sched = _run_serve(params, reqs, num_blocks=8,
                             watermark_blocks=0)
    assert sched.n_preemptions > 0, "scenario must actually preempt"
    for r in reqs:
        golden = _golden_generate(params, prompts[r.seq_id], n_new)
        assert outs[r.seq_id] == golden, r.seq_id


def test_mixed_batches_no_decode_starvation(params):
    """The reference's mixed prefill+decode batch
    (flash_api.cpp:236-322): while a long prompt is chunk-admitted,
    running sequences ride along as 1-token rows — they keep generating
    (no starvation) and all outputs still match the golden."""
    rng = np.random.default_rng(21)
    short = [rng.integers(0, CFG.vocab_size, n).astype(np.int64)
             for n in (9, 11)]
    long_p = rng.integers(0, CFG.vocab_size, 120).astype(np.int64)
    reqs = [Request(0, short[0].copy(), 10),
            Request(1, short[1].copy(), 10),
            Request(2, long_p.copy(), 3)]

    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    # FCFS admits the shorts first; the long prompt then trickles in over
    # ceil(120/16) chunked batches while the shorts are running
    sched = Scheduler(mgr, prefill_token_budget=16, mixed_batches=True)
    orig_step = sched.step
    mixed_seen = {"n": 0}

    def counting_step():
        out = orig_step()
        if out.kind == "prefill" and out.decoding:
            mixed_seen["n"] += 1
        return out
    sched.step = counting_step

    outs, _ = serve(CFG, params, kc, vc, reqs,
                    prefill_step=prefill_step, decode_step=decode_step,
                    scheduler=sched, mgr=mgr)
    assert mixed_seen["n"] > 0, "long admission must produce mixed batches"
    prompts = {0: short[0], 1: short[1], 2: long_p}
    for r in reqs:
        golden = _golden_generate(params, prompts[r.seq_id],
                                  r.max_new_tokens)
        assert outs[r.seq_id] == golden, r.seq_id


def test_pool_exhaustion_raises(params):
    """A single sequence that cannot even hold itself fails loudly."""
    rng = np.random.default_rng(1)
    reqs = [Request(0, rng.integers(0, CFG.vocab_size, 60).astype(np.int64),
                    80)]
    with pytest.raises(RuntimeError):
        _run_serve(params, reqs, num_blocks=5, watermark_blocks=0)


def test_eos_stops_early(params):
    """eos_token finishes a request before max_new_tokens."""
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, CFG.vocab_size, 17).astype(np.int64)
    golden = _golden_generate(params, prompt, 8)
    eos = golden[3]
    # the tiny model may emit eos earlier too — expected output stops at
    # the FIRST occurrence
    expected = golden[:golden.index(eos) + 1]
    reqs = [Request(0, prompt.copy(), 8, eos_token=eos)]
    outs, _ = _run_serve(params, reqs, num_blocks=32)
    assert outs[0] == expected

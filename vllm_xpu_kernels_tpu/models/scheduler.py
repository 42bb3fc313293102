"""Continuous-batching scheduler: admission, chunked prefill, preemption.

The reference is a kernel library and delegates batching policy to vLLM —
but its device contracts (block tables, slot mappings, cu_seqlens, mixed
prefill/decode batches, csrc/flash_attn/flash_api.cpp:236-322) exist to be
driven by exactly this loop.  This module supplies the policy tier above
models/runtime.py's BlockManager, following the vLLM v1 scheduler design:

- **FCFS admission with a token budget**: waiting requests are prefilled
  in arrival order; a long prompt is split into chunks of at most
  ``prefill_token_budget`` tokens (chunked prefill), and several short
  prompts can share one prefill batch.
- **Block watermark**: admission leaves ``watermark_blocks`` free so
  running sequences can append a few tokens before the pool runs dry.
- **Preemption by recompute**: when a decode step would need more fresh
  blocks than exist, the most-recently admitted sequences are evicted
  (KV released) and re-queued at the head of the waiting queue; on
  re-admission their prompt *plus everything generated so far* is
  re-prefilled (vLLM's RECOMPUTE policy — the natural one here, since
  chunked prefill makes recompute cheap and there is no swap target).
- **Shape bucketing**: ``serve`` pads decode batches to power-of-two
  buckets and prefill token counts to multiples of 8 so the jit cache
  stays small (the TPU analogue of vLLM's CUDA-graph capture sizes).

The hot per-step bookkeeping (slot/table assembly) stays in
models/runtime.py / csrc/host_runtime.cpp; this file is pure policy.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Callable, Optional

import numpy as np

from vllm_xpu_kernels_tpu.models.runtime import (
    BlockManager, build_chunked_prefill_batch, build_decode_batch)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass
class Request:
    """One generation request tracked through the scheduler."""
    seq_id: int
    prompt: np.ndarray                  # int token ids
    max_new_tokens: int
    eos_token: Optional[int] = None
    out: list = dataclasses.field(default_factory=list)
    prefilled: int = 0                  # tokens of context() already in KV

    def context(self) -> np.ndarray:
        """Tokens that must be in the KV cache before the next decode:
        the prompt plus everything generated so far (the generated part
        matters after a preemption-recompute)."""
        return np.concatenate(
            [self.prompt, np.asarray(self.out, self.prompt.dtype)])

    def finished(self) -> bool:
        if len(self.out) >= self.max_new_tokens:
            return True
        return (self.eos_token is not None and self.out
                and self.out[-1] == self.eos_token)


@dataclasses.dataclass
class SchedulerOutput:
    kind: str                            # "prefill" | "decode" | "idle"
    # prefill: context chunks keyed by seq_id, + requests whose context
    # completes with this batch (their last-row logits yield a token).
    # With mixed batches the chunks dict ALSO carries 1-token rows for
    # already-running requests (listed in ``decoding``) — the
    # reference's mixed prefill+decode batch (flash_api.cpp:236-322).
    chunks: dict = dataclasses.field(default_factory=dict)
    completing: list = dataclasses.field(default_factory=list)
    decoding: list = dataclasses.field(default_factory=list)
    # decode: the running requests, in batch order
    decode: list = dataclasses.field(default_factory=list)
    preempted: list = dataclasses.field(default_factory=list)


class Scheduler:
    """Admission + preemption policy over a BlockManager."""

    def __init__(self, mgr: BlockManager, *, max_batch: int = 32,
                 prefill_token_budget: int = 2048,
                 watermark_blocks: int = 1, mixed_batches: bool = True):
        self.mgr = mgr
        self.max_batch = max_batch
        self.prefill_token_budget = prefill_token_budget
        self.watermark_blocks = watermark_blocks
        # mixed prefill+decode batches (the reference's mix_batch,
        # flash_api.cpp:236-322): running sequences ride along as 1-token
        # rows of the varlen prefill call, so admission chunks never
        # starve decode
        self.mixed_batches = mixed_batches
        self.waiting: collections.deque[Request] = collections.deque()
        self.running: list[Request] = []
        self.n_preemptions = 0

    # ---- public API ------------------------------------------------------

    def add_request(self, req: Request):
        self.waiting.append(req)

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    def finish(self, req: Request):
        """Release a finished request's blocks and drop it."""
        self.mgr.release(req.seq_id)
        self.running.remove(req)

    def step(self) -> SchedulerOutput:
        """Decide the next device batch (does NOT touch the BlockManager
        for prefill — build_chunked_prefill_batch allocates/extends when
        the batch is built; preemption releases immediately)."""
        preempted = self._preempt_for_decode() if self.running else []
        # blocks the running sequences will need for their next token —
        # reserved from admission so a mixed/decode step stays feasible
        bs = self.mgr.block_size
        reserve = sum(1 for r in self.running
                      if self.mgr.lens[r.seq_id] % bs == 0)
        out = self._schedule_prefill(reserve)
        if out is not None:
            out.preempted = preempted
            if self.mixed_batches and self.running:
                in_chunks = set(out.chunks)
                for r in self.running:
                    if r.seq_id in in_chunks or not r.out:
                        continue
                    out.chunks[r.seq_id] = np.asarray(
                        [r.out[-1]], r.prompt.dtype)
                    out.decoding.append(r)
            return out
        if not self.running:
            return SchedulerOutput(kind="idle", preempted=preempted)
        return SchedulerOutput(kind="decode", decode=list(self.running),
                               preempted=preempted)

    # ---- policy ----------------------------------------------------------

    def _blocks_of(self, seq_id: int) -> int:
        return len(self.mgr.tables.get(seq_id, ()))

    def _schedule_prefill(self, reserve: int = 0) -> \
            Optional[SchedulerOutput]:
        """FCFS chunked admission under the token budget + watermark;
        ``reserve`` blocks are off-limits (owed to running sequences'
        next appends)."""
        chunks: dict[int, np.ndarray] = {}
        completing: list[Request] = []
        budget = self.prefill_token_budget
        free = len(self.mgr.free) - reserve
        n_batch = len(self.running)
        while self.waiting and budget > 0 and n_batch < self.max_batch:
            req = self.waiting[0]
            ctx = req.context()
            take = min(budget, len(ctx) - req.prefilled)
            need = (_cdiv(req.prefilled + take, self.mgr.block_size)
                    - self._blocks_of(req.seq_id))
            if free - self.watermark_blocks < need:
                break                     # strict FCFS: no skipping ahead
            chunks[req.seq_id] = ctx[req.prefilled:req.prefilled + take]
            req.prefilled += take
            free -= need
            budget -= take
            n_batch += 1
            if req.prefilled == len(ctx):
                self.waiting.popleft()
                completing.append(req)
                self.running.append(req)
            else:
                break                     # budget spent mid-prompt
        if not chunks:
            return None
        return SchedulerOutput(kind="prefill", chunks=chunks,
                               completing=completing)

    def _preempt_for_decode(self) -> list[Request]:
        """Evict most-recently admitted sequences until every running
        sequence can append one token (RECOMPUTE policy: released
        requests rejoin the head of the waiting queue with prefilled=0
        and re-prefill prompt+generated on re-admission)."""
        preempted: list[Request] = []
        while len(self.running) > 0:
            bs = self.mgr.block_size
            need = sum(
                1 for r in self.running
                if self.mgr.lens[r.seq_id] % bs == 0)
            if len(self.mgr.free) >= need:
                break
            if len(self.running) == 1:
                raise RuntimeError(
                    "KV pool exhausted: a single running sequence cannot "
                    "append (free=0) and preemption cannot help — size "
                    "num_blocks for at least one full sequence")
            victim = self.running.pop()
            self.mgr.release(victim.seq_id)
            victim.prefilled = 0
            self.waiting.appendleft(victim)
            preempted.append(victim)
            self.n_preemptions += 1
        return preempted


# ---------------------------------------------------------------------------
# reference serving loop
# ---------------------------------------------------------------------------


def _bucket(n: int, lo: int = 1) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _supports(fn, name) -> bool:
    import inspect

    try:
        return name in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def serve(cfg, params, kc, vc, requests, *, prefill_step: Callable,
          decode_step: Callable, scheduler: Optional[Scheduler] = None,
          mgr: Optional[BlockManager] = None, num_blocks: int = 0,
          max_steps: int = 10_000, sample=None):
    """Drive requests to completion with continuous batching; returns
    ``{seq_id: [generated tokens]}`` plus the scheduler (for stats).

    ``prefill_step`` / ``decode_step`` follow the models/llama.py
    signatures; ``sample`` maps logits rows -> token ids (greedy argmax
    by default).  Decode batches are padded to power-of-two buckets and
    prefill lengths to multiples of 8 to bound jit specialization.
    """
    import jax.numpy as jnp

    greedy = sample is None
    if sample is None:
        def sample(rows):
            return np.asarray(rows, np.float32).argmax(-1).astype(np.int64)
    if mgr is None:
        assert num_blocks > 0
        mgr = BlockManager(num_blocks, cfg.block_size)
    sched = scheduler or Scheduler(mgr)
    for r in requests:
        sched.add_request(r)
    by_id = {r.seq_id: r for r in requests}
    max_blocks = max(1, len(mgr.free))
    max_k = mgr.block_size * max_blocks

    for _ in range(max_steps):
        if not sched.has_work():
            break
        out = sched.step()
        if out.kind == "idle":
            raise RuntimeError(
                "scheduler deadlock: no batch schedulable "
                f"(free blocks={len(mgr.free)})")
        if out.kind == "prefill":
            (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
             mq, mk) = build_chunked_prefill_batch(mgr, out.chunks)
            # mixed-batch split routing: the decode riders are the LAST
            # sequences of the chunks dict (Scheduler.step appends them
            # after the admission chunks); prefill_step routes their
            # attention to the decode kernel (flash_api.cpp:236-322)
            nd = len(out.decoding)
            kw = {}
            if nd and _supports(prefill_step, "decode_tail"):
                assert [r.seq_id for r in out.decoding] == \
                    list(seq_ids[len(seq_ids) - nd:])
                kw["decode_tail"] = nd
            # only each sequence's last row is sampled — slice before the
            # lm_head (the full-row head GEMM is pure waste at prefill)
            last = np.asarray(cu_q[1:]) - 1
            sliced = _supports(prefill_step, "logits_rows")
            if sliced:
                kw["logits_rows"] = jnp.asarray(last, jnp.int32)
            logits, kc, vc = prefill_step(
                cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
                jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
                jnp.asarray(kv_lens), kc, vc,
                max_seqlen_q=_cdiv(mq, 8) * 8,
                max_seqlen_k=min(max_k, _cdiv(mk, 16) * 16), **kw)
            # rows that emit a token: contexts completing with this batch
            # plus (mixed batches) the 1-token rows of running sequences
            emit = {r.seq_id for r in out.completing}
            emit |= {r.seq_id for r in out.decoding}
            toks = sample(np.asarray(logits) if sliced
                          else np.asarray(logits)[last])
            for i, sid in enumerate(seq_ids):
                if sid in emit:
                    # the sampled token joins context(); its KV enters the
                    # cache on the next mixed/decode step (or, if this
                    # request is preempted first, via recompute-prefill)
                    by_id[sid].out.append(int(toks[i]))
        else:
            reqs = out.decode
            ids = [r.seq_id for r in reqs]
            next_tok = np.asarray([r.out[-1] for r in reqs], np.int64)
            batch = build_decode_batch(
                mgr, ids, next_tok, max_blocks=max_blocks,
                pad_to=_bucket(len(ids)))
            # greedy serving uses the fused lm_head+argmax head when the
            # model offers it — token ids come back directly, the [B, V]
            # logits never materialize
            kw = {}
            fused_head = greedy and _supports(decode_step, "head_mode")
            if fused_head:
                kw["head_mode"] = "argmax"
            outv, kc, vc = decode_step(
                cfg, params, jnp.asarray(batch.token_ids),
                jnp.asarray(batch.positions),
                jnp.asarray(batch.slot_mapping),
                jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
                kc, vc, max_seqlen_k=max_k, **kw)
            toks = (np.asarray(outv)[: len(ids)].astype(np.int64)
                    if fused_head else sample(np.asarray(outv)[: len(ids)]))
            for i, req in enumerate(reqs):
                req.out.append(int(toks[i]))
        for req in list(sched.running):
            if req.finished():
                sched.finish(req)
    else:
        raise RuntimeError("serve(): max_steps exceeded")
    return {r.seq_id: list(r.out) for r in requests}, sched

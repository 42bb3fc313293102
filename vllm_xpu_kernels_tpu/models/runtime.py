"""Minimal continuous-batching serving runtime: paged-KV block manager +
scheduler loop.

The reference delegates batching policy to vLLM and only defines the device
contracts (block tables, slot mappings, cu_seqlens — csrc/cache.cpp,
flash_api.cpp).  This runtime produces exactly those contracts on host
(numpy, no device sync) and feeds the jitted model steps; shapes are
bucketed so the jit cache stays small (the TPU analogue of vLLM's CUDA-graph
capture sizes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


class BlockManager:
    """Host-side paged-KV allocator (the role vLLM's BlockSpaceManager plays
    above the reference's cache ops)."""

    def __init__(self, num_blocks: int, block_size: int):
        self.block_size = block_size
        self.free = list(range(num_blocks - 1, -1, -1))
        self.tables: dict[int, list[int]] = {}
        self.lens: dict[int, int] = {}

    def can_allocate(self, n_tokens: int) -> bool:
        return len(self.free) >= -(-n_tokens // self.block_size)

    def allocate(self, seq_id: int, n_tokens: int):
        need = -(-n_tokens // self.block_size)
        assert len(self.free) >= need, "out of KV blocks"
        self.tables[seq_id] = [self.free.pop() for _ in range(need)]
        self.lens[seq_id] = n_tokens

    def append_token(self, seq_id: int):
        """Extend a sequence by one token, growing its table as needed."""
        ln = self.lens[seq_id]
        if ln == self.block_size * len(self.tables[seq_id]):
            self.tables[seq_id].append(self.free.pop())
        self.lens[seq_id] = ln + 1

    def extend(self, seq_id: int, n_tokens: int):
        """Grow a known sequence by ``n_tokens`` (chunked prefill)."""
        ln = self.lens[seq_id]
        need = -(-(ln + n_tokens) // self.block_size)
        tbl = self.tables[seq_id]
        assert len(self.free) >= need - len(tbl), "out of KV blocks"
        while len(tbl) < need:
            tbl.append(self.free.pop())
        self.lens[seq_id] = ln + n_tokens

    def release(self, seq_id: int):
        self.free.extend(reversed(self.tables.pop(seq_id)))
        del self.lens[seq_id]

    def rollback(self, seq_id: int, n_tokens: int):
        """Shrink a sequence to ``n_tokens`` (speculative-decode reject
        path): KV entries past the new length become dead and are simply
        overwritten later; whole trailing blocks are freed."""
        assert n_tokens <= self.lens[seq_id]
        need = max(1, -(-n_tokens // self.block_size))
        tbl = self.tables[seq_id]
        while len(tbl) > need:
            self.free.append(tbl.pop())
        self.lens[seq_id] = n_tokens

    def slot(self, seq_id: int, pos: int) -> int:
        tbl = self.tables[seq_id]
        return tbl[pos // self.block_size] * self.block_size + (
            pos % self.block_size)

    # ---- batched views ---------------------------------------------------

    def block_table_batch(self, seq_ids, max_blocks: int) -> np.ndarray:
        out = np.zeros((len(seq_ids), max_blocks), np.int32)
        for i, sid in enumerate(seq_ids):
            t = self.tables[sid]
            out[i, : len(t)] = t
        return out

    def kv_lens_batch(self, seq_ids) -> np.ndarray:
        return np.asarray([self.lens[s] for s in seq_ids], np.int32)


@dataclasses.dataclass
class DecodeBatch:
    """Device-ready arrays for one decode step (all int32 numpy)."""
    token_ids: np.ndarray
    positions: np.ndarray
    slot_mapping: np.ndarray
    block_table: np.ndarray
    kv_lens: np.ndarray
    max_seqlen_k: int


def build_decode_batch(
    mgr: BlockManager,
    seq_ids,
    next_tokens,
    max_blocks: Optional[int] = None,
    pad_to: Optional[int] = None,
) -> DecodeBatch:
    """Advance each sequence by one token and emit the decode-step inputs.

    ``pad_to`` pads the batch to a bucket size (repeat last row, masked by
    kv_lens=1 dummy rows pointing at block 0) so jit shapes stay bucketed.
    """
    for sid in seq_ids:
        mgr.append_token(sid)
    kv_lens = mgr.kv_lens_batch(seq_ids)
    positions = kv_lens - 1
    slots = np.asarray(
        [mgr.slot(sid, int(p)) for sid, p in zip(seq_ids, positions)],
        np.int32)
    if max_blocks is None:
        max_blocks = max(len(mgr.tables[s]) for s in seq_ids)
    tbl = mgr.block_table_batch(seq_ids, max_blocks)
    tok = np.asarray(next_tokens, np.int32)
    b = len(seq_ids)
    if pad_to is not None and pad_to > b:
        pad = pad_to - b
        tok = np.concatenate([tok, np.zeros(pad, np.int32)])
        positions = np.concatenate([positions, np.zeros(pad, np.int32)])
        slots = np.concatenate(
            [slots, np.full(pad, -1, np.int32)])   # dropped by scatter
        tbl = np.concatenate([tbl, np.zeros((pad, max_blocks), np.int32)])
        kv_lens = np.concatenate([kv_lens, np.ones(pad, np.int32)])
    return DecodeBatch(tok, positions.astype(np.int32), slots, tbl,
                       kv_lens, int(kv_lens.max()))


def build_prefill_batch(mgr: BlockManager, prompts: dict[int, np.ndarray]):
    """Allocate and pack prompts -> arrays for prefill_step."""
    seq_ids = list(prompts)
    q_lens = [len(prompts[s]) for s in seq_ids]
    for sid, n in zip(seq_ids, q_lens):
        mgr.allocate(sid, n)
    return _pack_varlen(mgr, prompts, [0] * len(seq_ids))


def build_chunked_prefill_batch(mgr: BlockManager,
                                chunks: dict[int, np.ndarray]):
    """Chunked-prefill / mixed-batch scheduling: each entry is the NEXT
    chunk of a sequence's prompt.  New sequences are allocated, known
    sequences extended — so one call can mix fresh prompts, continuation
    chunks, and 1-token chunks of running sequences (the decode rows of
    the reference's mixed batch, csrc/flash_attn/flash_api.cpp:236-322).
    Returns the same tuple as build_prefill_batch."""
    seq_ids = list(chunks)
    starts = []
    for sid in seq_ids:
        if sid in mgr.lens:
            starts.append(mgr.lens[sid])
            mgr.extend(sid, len(chunks[sid]))
        else:
            starts.append(0)
            mgr.allocate(sid, len(chunks[sid]))
    return _pack_varlen(mgr, chunks, starts)


def _pack_varlen(mgr: BlockManager, toks: dict[int, np.ndarray], starts):
    seq_ids = list(toks)
    q_lens = [len(toks[s]) for s in seq_ids]
    token_ids = np.concatenate([toks[s] for s in seq_ids]).astype(np.int32)
    positions = np.concatenate(
        [np.arange(st, st + n, dtype=np.int32)
         for st, n in zip(starts, q_lens)])
    slots = np.concatenate([
        np.asarray([mgr.slot(sid, p) for p in range(st, st + n)], np.int32)
        for sid, st, n in zip(seq_ids, starts, q_lens)])
    cu_q = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    max_blocks = max(len(mgr.tables[s]) for s in seq_ids)
    tbl = mgr.block_table_batch(seq_ids, max_blocks)
    kv_lens = mgr.kv_lens_batch(seq_ids)
    return (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
            int(max(q_lens)), int(kv_lens.max()))

"""Pallas flash attention kernels: chunked varlen prefill + paged decode.

TPU-native re-design of the reference's two CUTLASS-SYCL attention kernels
(reference: csrc/xpu/attn/xe_2/kernel/chunk_prefill_kernel.hpp:70 varlen
prefill mainloop, paged_decode_kernel.hpp:67 split-KV decode + ReduceSplitK,
work-list scheduler chunk_prefill_scheduler.hpp:93-220).

Key design translations:

- **Paged KV gather**: the reference's kernels walk block tables inside the
  device loop; here the block-table indirection lives in the BlockSpec
  ``index_map`` reading a scalar-prefetched table, so the Pallas pipeline
  double-buffers page DMAs automatically (one KV tile == one cache page).
- **Split-KV**: the reference oversubscribes Xe cores with per-seq splits
  planned on host (docs/group_split_kv_design.md).  A single v5e TPU core
  executes the grid *sequentially* with pipelined DMAs, so splits buy
  nothing there and ``num_splits_kv<=1`` (the default) keeps the dense
  per-sequence grid.  ``num_splits_kv=S>1`` IS honored (the reference's
  ReduceSplitK role): each sequence's page range splits into S contiguous
  chunks run as a virtual batch of B*S sequences, merged exactly with the
  merge_attn_states LSE math — useful on megacore parts (v4/v5p/v6e,
  where XLA parallelizes the widened grid over cores) and for skewed
  batches where one long sequence serializes the step.  Empty splits cost
  one masked grid step (out=0, lse=-inf — a no-op in the merge).
- **Kernel-variant matrix**: the reference precompiles 216+384 static
  configs (.conf codegen); here every (head_size, page_size, flags) combo is
  jit-specialized at trace time.
- Online softmax uses the standard rescaled accumulation
  (chunk_prefill_mainloop.hpp's softmax-rescale), with sinks folded into the
  final max/denominator and fully-masked rows yielding zeros.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import interpret_mode

_NEG = -1e30
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _exp_consts(scale, softcap, sink, hkv, g):
    """Launch-time constants for the online softmax, optionally rewritten
    in base 2 (``VXK_ATTN_EXP2``): exp(x) == exp2(x·log2e), and folding
    log2e into the QK scale (or the softcap's output multiplier) turns
    every exponential in the hot loop into the VPU's native pow2 with no
    extra multiply.  ``l`` is invariant (exp2 of base-2 logits equals exp
    of natural logits) — only the running max changes domain, and the
    epilogue converts lse back via ``m·ln2 + log(l)``.

    -> (spec_updates dict, sink_arr [hkv, g, 1] f32)."""
    from vllm_xpu_kernels_tpu.envs import VXK_ATTN_EXP2

    base2 = VXK_ATTN_EXP2()
    mult = _LOG2E if base2 else 1.0
    softcap = float(softcap or 0.0)
    sink_arr = (jnp.zeros((hkv, g, 1), jnp.float32) if sink is None
                else (sink.astype(jnp.float32) * mult).reshape(hkv, g, 1))
    return dict(
        scale=float(scale) * (1.0 if softcap else mult),
        softcap=softcap,
        softcap_mult=softcap * mult,
        exp2=base2,
        m2ln=_LN2 if base2 else 1.0,
    ), sink_arr


# ---------------------------------------------------------------------------
# paged split-KV decode (reference: paged_decode_kernel.hpp)
# ---------------------------------------------------------------------------


def _decode_kernel(
    spec,
    # scalar prefetch
    kv_lens_ref, tbl_ref, sink_ref, descale_ref,
    # tensor inputs: q, then P (k, v) page pairs
    *refs,
):
    """One grid step = one (sequence, P pages): all KV heads ride in one
    page DMA per page (the [nb, Hkv, bs, D] layout keeps a page
    contiguous), P pages are concatenated in VMEM and consumed by
    head-batched dot_generals.  Fat steps amortize the ~1 us per-grid-step
    pipeline cost that bounds paged decode: 1 page/step measured 644 GB/s,
    2 pages/step 740+ GB/s on v5e at batch 32, kv 1024."""
    import jax.experimental.pallas as pl

    P = spec["pages_per_step"]
    q_ref = refs[0]
    k_refs = refs[1:1 + P]
    nv = 0 if spec["qpad"] else P       # qpad: V rides in the K pages
    v_refs = refs[1 + P:1 + P + nv]
    o_ref, lse_ref, m_ref, l_ref, acc_ref = refs[1 + P + nv:]

    b = pl.program_id(0)
    j = pl.program_id(1)
    bs = spec["bs"]
    g = spec["g"]
    hkv = spec["hkv"]

    kv_len = kv_lens_ref[b]
    n_steps = jnp.maximum((kv_len + P * bs - 1) // (P * bs), 1)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ex = jnp.exp2 if spec["exp2"] else jnp.exp

    @pl.when(j < n_steps)
    def _():
        from vllm_xpu_kernels_tpu.kernels.quant_matmul import fp8_upcast_f32

        # batched over kv heads: [hkv, g, d] x [hkv, bs, d] -> [hkv, g, bs]
        # (a per-head python loop of tiny 2-D dots ran at 408 GB/s; the
        # head-batched dot_generals reach 740+ GB/s).  The P pages of the
        # step are separate unrolled updates — concatenating them in VMEM
        # measured slower (2 MB VPU copy per step).
        # fp8 KV: k_descale folds into the q scale and v_descale into the
        # epilogue accumulator (same fold as _decode_kernel_dma) — the
        # per-page chain stays a pure upcast.
        qk_scale = (spec["scale"] * descale_ref[0, 0] if spec["fp8_kv"]
                    else spec["scale"])
        q = q_ref[0].astype(jnp.float32) * qk_scale
        for pi in range(P):
            k = fp8_upcast_f32(k_refs[pi][0])
            # qpad (half-lane fused pages): the whole page serves as K
            # and V — q is zero-padded over the V half so QK contracts
            # exactly, and the accumulator's K half is discarded outside
            v = k if spec["qpad"] else fp8_upcast_f32(v_refs[pi][0])
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [hkv, g, bs]
            if spec["softcap"]:
                s = spec["softcap_mult"] * jnp.tanh(s / spec["softcap"])
            kpos = ((j * P + pi) * bs
                    + jax.lax.broadcasted_iota(jnp.int32, (1, g, bs), 2))
            mask = kpos >= kv_len
            if spec["window_left"] >= 0:
                mask = mask | (kpos < kv_len - 1 - spec["window_left"])
            s = jnp.where(mask, -jnp.inf, s)
            cur = jnp.max(s, axis=-1, keepdims=True)
            m_old = m_ref[...]
            m_new = jnp.maximum(jnp.maximum(cur, m_old), _NEG)
            alpha = ex(m_old - m_new)
            p = ex(s - m_new)
            l_ref[...] = (l_ref[...] * alpha
                          + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [hkv, g, dv]
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        m = m_ref[...]
        l = l_ref[...]
        acc = acc_ref[...]
        if spec["fp8_kv"]:
            acc = acc * descale_ref[0, 1]    # v_descale folded out
        if spec["has_sink"]:
            sink = sink_ref[...]                         # [hkv, g, 1]
            m_f = jnp.maximum(m, sink)
            corr = ex(m - m_f)
            l = l * corr + ex(sink - m_f)
            acc = acc * corr
            m = m_f
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = (m * spec["m2ln"]
                      + jnp.log(jnp.maximum(l, 1e-30)))


def _decode_kernel_dma(
    spec,
    # refs: scalar prefetch (kv_lens, tbl, [fresh_slots]), then tensor
    # inputs (sink, descale, q, [fresh], cache — split: k_hbm, v_hbm;
    # fused: one kv_hbm), then outputs (o, [o_scale], lse,
    # [aliased cache]), then scratch (buffers, staged logits, softmax
    # state, [writeback window], semaphores)
    *refs,
):
    """One grid step = one full sequence.  The kernel walks the block
    table itself with multi-buffered async page copies (prefetch depth D
    pages in flight), instead of one BlockSpec-pipelined operand per page
    slot: per-grid-step cost drops from ~13 operand index-maps x
    B*ceil(pages/pp) steps to a single fat step per sequence, and the DMA
    queue stays D deep rather than the pipeline's fixed double buffer.

    ``spec["fused"]``: the cache is one [nb, Hkv, bs, Dk+Dv] array — a
    page is ONE async copy instead of a (K, V) pair, halving the per-page
    DMA issue+wait overhead that dominates the decode-attention slack
    (~2 DMA transactions/page measured as ~2 ms of a 19 ms 8B step).

    ``spec["stage"]``: pages per online-softmax update.  Logits for a
    PAIR of pages stage into one [hkv, g, 2*bs] buffer and fold with a
    single max/exp/sum/acc-rescale pass — the acc rescale ([hkv, g, dv]
    f32) is the widest VPU op of the page loop, and pairing halves it
    (same trick as the prefill kernel's staged wide softmax).  Buffer
    slots are consumed pair-at-a-time, so with depth 4 the DMA queue
    still stays >= 2 pages ahead.

    ``spec["fresh"]``: the current token's quantized (K|V) row rides as a
    direct input [B, Hkv, 1, Dk+Dv] instead of being scattered into the
    cache *before* attention: the kernel folds it into the online-softmax
    epilogue (an extra logit column with a value — same shape of fold as
    the attention sink, reference merge_attn_states semantics).  Masking
    uses the cached length kv_len-1, so page reads never see the row's
    slot.  With ``spec["writeback"]`` the kernel also writes the row into
    the (input-output aliased) cache itself: a single row is not a legal
    Mosaic HBM slice (sublane slices must align to the dtype tiling), so
    it merges the row into an 8-row-aligned window of the page — already
    resident in VMEM from the attention pass — and DMAs the window back.
    This removes the XLA cache-row scatter entirely (~0.8 ms of a 19 ms
    8B step).

    ``spec["out_q"]``: per-token dynamic int8 quant of the attention
    output fused into the epilogue (the w8a8 o-projection consumes int8
    rows; quantizing [hkv, g, dv] from the f32 accumulator here removes
    the standalone activation-quant pass between attention and the
    o-proj GEMM)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vllm_xpu_kernels_tpu.kernels.quant_matmul import fp8_upcast_f32

    fused = spec["fused"]
    fresh = spec["fresh"]
    wb = spec["writeback"]
    out_q = spec["out_q"]
    d = spec["d"]
    bs = spec["bs"]
    depth = spec["depth"]
    stage = spec["stage"]

    it = iter(refs)
    kv_lens_ref = next(it)
    tbl_ref = next(it)
    fslots_ref = next(it) if wb else None
    sink_ref = next(it)
    descale_ref = next(it)
    q_ref = next(it)
    fresh_ref = next(it) if fresh else None
    if fused:
        kv_hbm = next(it)
    else:
        k_hbm, v_hbm = next(it), next(it)
    o_ref = next(it)
    os_ref = next(it) if out_q else None
    lse_ref = next(it)
    cache_out = next(it) if wb else None
    if fused:
        kvbuf = next(it)
    else:
        kbuf, vbuf = next(it), next(it)
    m_ref, l_ref, acc_ref = next(it), next(it), next(it)
    wbuf = next(it) if wb else None
    if fused:
        skv = next(it)
    else:
        sk, sv = next(it), next(it)
    wsem = next(it) if wb else None

    b = pl.program_id(0)
    num_seqs = pl.num_programs(0)
    # with a fresh row, the pages hold kv_len-1 cached tokens; the fresh
    # token is folded in the epilogue and never read back from the cache
    kv_len = kv_lens_ref[b] - (1 if fresh else 0)
    n_pages = jnp.maximum((kv_len + bs - 1) // bs, 1)

    def issue(seq, page_i, slot):
        pg = tbl_ref[seq, page_i]
        if fused:
            pltpu.make_async_copy(
                kv_hbm.at[pg], kvbuf.at[slot], skv.at[slot]).start()
        else:
            pltpu.make_async_copy(
                k_hbm.at[pg], kbuf.at[slot], sk.at[slot]).start()
            pltpu.make_async_copy(
                v_hbm.at[pg], vbuf.at[slot], sv.at[slot]).start()

    # Fill: only the first sequence issues its own head pages — every
    # later sequence's head was prefetched by the previous grid step's
    # epilogue, so the DMA stream never drains at sequence boundaries.
    @pl.when(b == 0)
    def _():
        for s in range(depth):
            @pl.when(s < n_pages)
            def _():
                issue(b, s, s)

    if wb:
        # Prefetch the fresh row's 8-row-aligned page window now; the
        # read's latency hides behind the whole page loop and the merge
        # in the epilogue preserves every sibling byte of the window
        # (bit-identical to an XLA row scatter).
        @pl.when(fslots_ref[b] >= 0)
        def _():
            fs = fslots_ref[b]
            pltpu.make_async_copy(
                kv_hbm.at[fs // bs, :, pl.ds(fs % bs // 8 * 8, 8), :],
                wbuf, wsem).start()

    m_ref[...] = jnp.full_like(m_ref, _NEG)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    # bf16 matmul operands, f32 accumulation (f32 x f32 MXU rate is a
    # fraction of bf16).  The QK scale (with k_descale folded in for fp8
    # KV — v_descale folds into the epilogue accumulator) applies to q
    # BEFORE the bf16 cast: one [hkv, g, d] pass instead of a per-page
    # [hkv, g, bs] logits multiply.
    qk_scale = (spec["scale"] * descale_ref[0, 0] if spec["fp8_kv"]
                else spec["scale"])
    q = (q_ref[0].astype(jnp.float32) * qk_scale).astype(jnp.bfloat16)
    g = q.shape[1]
    ex = jnp.exp2 if spec["exp2"] else jnp.exp

    def wait_kv(i, slot):
        pg = tbl_ref[b, i]
        if fused:
            pltpu.make_async_copy(
                kv_hbm.at[pg], kvbuf.at[slot], skv.at[slot]).wait()
        else:
            pltpu.make_async_copy(
                k_hbm.at[pg], kbuf.at[slot], sk.at[slot]).wait()
            pltpu.make_async_copy(
                v_hbm.at[pg], vbuf.at[slot], sv.at[slot]).wait()

    def kv_slot(slot):
        if spec["qpad"]:
            # half-lane fused pages: the whole [hkv, bs, 128] page is
            # both K and V (q zero-padded over the V half; the
            # accumulator's K half is discarded by the caller)
            whole = kvbuf[slot]
            return whole, whole
        if fused:
            return kvbuf[slot, :, :, :d], kvbuf[slot, :, :, d:]
        return kbuf[slot], vbuf[slot]

    def qk_dot(slot):
        kraw, _ = kv_slot(slot)
        if spec["fp8_kv"]:
            k = fp8_upcast_f32(kraw).astype(jnp.bfloat16)
        else:
            k = kraw.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [hkv, g, bs]

    def bf16_v(slot):
        _, vraw = kv_slot(slot)
        if spec["fp8_kv"]:
            return fp8_upcast_f32(vraw).astype(jnp.bfloat16)
        return vraw.astype(jnp.bfloat16)

    def fold(s, i0, width, pv, masked=True):
        """Online-softmax fold of logits ``s`` ([hkv, g, width], first
        column at kv position i0*bs) followed by ``pv(p)`` accumulator
        updates.  ``masked=False`` skips the position-mask passes for
        interior pages (every column in range and in window)."""
        if spec["softcap"]:
            s = spec["softcap_mult"] * jnp.tanh(s / spec["softcap"])
        if masked:
            kpos = (i0 * bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, g, width), 2))
            mask = kpos >= kv_len
            if spec["window_left"] >= 0:
                # current token's position: kv_len-1 normally, kv_len
                # (the fresh row, outside the pages) in fresh mode
                cur_pos = kv_len - (0 if fresh else 1)
                mask = mask | (kpos < cur_pos - spec["window_left"])
            s = jnp.where(mask, -jnp.inf, s)
        cur = jnp.max(s, axis=-1, keepdims=True)
        m_old = m_ref[...]
        m_new = jnp.maximum(jnp.maximum(cur, m_old), _NEG)
        alpha = ex(m_old - m_new)
        p = ex(s - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha
        pv(p)

    def consume(i, slot):
        """stage=1 fast path: wait page i, fold it straight from
        registers (no staging buffer round trip), re-issue the slot.
        (A dynamic interior/masked pl.when split was measured SLOWER
        than masking every page — the duplicated fold bodies and scalar
        branches cost more than 3 short VPU mask passes save.)"""
        wait_kv(i, slot)
        s = qk_dot(slot)

        def pv(p):
            acc_ref[...] += jax.lax.dot_general(
                p.astype(jnp.bfloat16), bf16_v(slot),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [hkv, g, dv]

        fold(s, i, bs, pv)

        @pl.when(i + depth < n_pages)
        def _():
            issue(b, i + depth, slot)

    def update(i0, ps, s):
        """One online-softmax fold over the register-resident logits of
        pages i0..i0+stage-1 (buffer slots ps..).  Columns of pages past
        n_pages are killed by the kv_len mask (kpos >= kv_len always
        holds there), and their PV dot is skipped."""
        def pv(p):
            for c in range(stage):
                def pv_dot(c=c):
                    acc_ref[...] += jax.lax.dot_general(
                        p[:, :, c * bs:(c + 1) * bs].astype(jnp.bfloat16),
                        bf16_v(ps + c), (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [hkv,g,dv]
                if c == 0:
                    pv_dot()
                else:
                    pl.when(i0 + c < n_pages)(lambda c=c: pv_dot(c))

        fold(s, i0, stage * bs, pv)

    # rounds of `depth` statically-unrolled slots, consumed `stage` at a
    # time; each consumed group immediately re-issues its slots, keeping
    # the queue depth-stage pages ahead.
    n_rounds = (n_pages + depth - 1) // depth

    def round_body(r, carry):
        base = r * depth
        if stage == 1:
            for slot in range(depth):
                @pl.when(base + slot < n_pages)
                def _(slot=slot):
                    consume(base + slot, slot)
            return carry
        for ps in range(0, depth, stage):
            i0 = base + ps

            @pl.when(i0 < n_pages)
            def _(ps=ps, i0=i0):
                # wait + QK the pair in REGISTERS (a VMEM staging buffer
                # round trip measured slower) and fold once; stale
                # second-page columns are masked by kpos >= kv_len
                wait_kv(i0, ps)
                parts = [qk_dot(ps)]
                for c in range(1, stage):
                    @pl.when(i0 + c < n_pages)
                    def _(c=c):
                        wait_kv(i0 + c, ps + c)
                    parts.append(qk_dot(ps + c))
                s = (jnp.concatenate(parts, axis=-1) if stage > 1
                     else parts[0])
                update(i0, ps, s)
                for c in range(stage):
                    @pl.when(i0 + c + depth < n_pages)
                    def _(c=c):
                        issue(b, i0 + c + depth, ps + c)
        return carry

    jax.lax.fori_loop(0, n_rounds, round_body, 0, unroll=False)

    if wb:
        # Merge the fresh row into the prefetched 8-row page window and
        # DMA the window back into the aliased cache (a single row is not
        # a legal Mosaic HBM slice; the window is).  Every sibling byte
        # of the window is preserved — bit-identical to an XLA row
        # scatter.  Row select runs in f32 (8-bit/16-bit selects are
        # Mosaic-hostile); quantized values round-trip exactly.
        fslot = fslots_ref[b]

        @pl.when(fslot >= 0)
        def _():
            pg_w = fslot // bs
            off = fslot % bs
            ws = (off // 8) * 8
            pltpu.make_async_copy(
                kv_hbm.at[pg_w, :, pl.ds(ws, 8), :], wbuf, wsem).wait()
            basef = (fp8_upcast_f32(wbuf[...]) if spec["fp8_kv"]
                     else wbuf[...].astype(jnp.float32))  # [hkv, 8, d+dv]
            freshf = (fp8_upcast_f32(fresh_ref[0]) if spec["fp8_kv"]
                      else fresh_ref[0].astype(jnp.float32))  # [hkv,1,*]
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
                   == off - ws)
            wbuf[...] = jnp.where(sel, freshf, basef).astype(wbuf.dtype)
            pltpu.make_async_copy(
                wbuf, cache_out.at[pg_w, :, pl.ds(ws, 8), :], wsem).start()

    # Epilogue: prefetch the next sequence's first pages while this
    # step finalizes and the pipeline swaps q/output blocks.  The page
    # count must match the next step's n_pages EXACTLY (every issued DMA
    # is waited exactly once), so it uses the same cached-length rule.
    @pl.when(b + 1 < num_seqs)
    def _():
        nxt = kv_lens_ref[b + 1] - (1 if fresh else 0)
        nxt_pages = jnp.maximum((nxt + bs - 1) // bs, 1)
        for s in range(depth):
            @pl.when(s < nxt_pages)
            def _():
                issue(b + 1, s, s)

    m = m_ref[...]
    l = l_ref[...]
    acc = acc_ref[...]
    # NOTE: in fresh mode the current token's (k, v) column is NOT
    # folded here — per-sequence epilogue folds are two tiny
    # latency-bound MXU dots per grid step (~2 ms/step at 8B batch 32);
    # the caller merges the fresh column for the whole batch in ONE
    # batched XLA op instead (paged_decode fresh merge).  The kernel's
    # job in fresh mode is the masking (cached length) and the page-
    # window writeback.
    if spec["fp8_kv"]:
        acc = acc * descale_ref[0, 1]    # v_descale folded out of the loop
    if spec["has_sink"]:
        sink = sink_ref[...]                             # [hkv, g, 1]
        m_f = jnp.maximum(m, sink)
        corr = ex(m - m_f)
        l = l * corr + ex(sink - m_f)
        acc = acc * corr
        m = m_f
    o = acc / jnp.maximum(l, 1e-30)
    if out_q:
        # per-token (per-sequence) dynamic int8 quant straight from the
        # f32 accumulator (matches ops.quant
        # dynamic_per_token_scaled_int8_quant numerics).  In qpad mode
        # the K half of the accumulator is garbage — mask it out of the
        # amax (the caller discards those lanes).
        o_amax = o
        if spec["qpad"]:
            lane = jax.lax.broadcasted_iota(jnp.int32, o.shape, 2)
            o_amax = jnp.where(lane >= d, o, 0.0)
        amax = jnp.max(jnp.abs(o_amax))
        s_tok = jnp.maximum(amax / 127.0, 1e-10)
        o_ref[0] = jnp.clip(jnp.round(o * (1.0 / s_tok)), -127, 127
                            ).astype(jnp.int8)
        os_ref[0] = jnp.full_like(os_ref[0], s_tok)
    else:
        o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m * spec["m2ln"] + jnp.log(jnp.maximum(l, 1e-30))
    if wb:
        @pl.when(fslots_ref[b] >= 0)
        def _():
            pltpu.make_async_copy(
                wbuf, cache_out.at[0, :, pl.ds(0, 8), :], wsem).wait()


def _paged_decode_dma(
    q, k_cache, v_cache, seqused_k, block_table, *,
    scale, window, softcap, sink, k_descale, v_descale, max_seqlen_k,
    fresh_kv=None, fresh_slots=None, out_quant=False, v_head_dim=None,
    v_lane_offset=None,
):
    """Sequence-grid decode with kernel-managed page DMAs.
    ``v_cache=None`` selects the fused layout: ``k_cache`` is
    [nb, Hkv, bs, Dk+Dv] with K in [..., :Dk] (one DMA per page).
    ``fresh_kv`` (fused only): [B, Hkv, Dk+Dv] quantized current-token
    row — folded into the online-softmax epilogue instead of being read
    back from the cache, and written into the cache at
    ``fresh_slots[b]`` by the kernel itself (input-output aliased; see
    _decode_kernel_dma); ``seqused_k`` then INCLUDES the fresh token.
    ``out_quant``: fuse per-token dynamic int8 quant of the output into
    the epilogue.
    -> (out [B, Hkv, G, Dv] (int8 when out_quant), lse [B, Hkv, G, 1],
        out_scale [B, 1, 1] | None, new_cache | None)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vllm_xpu_kernels_tpu.envs import (VXK_DECODE_DMA_DEPTH,
                                           VXK_DECODE_STAGE)

    fused = v_cache is None
    b_, hq, d = q.shape
    nb, hkv, bs, _ = k_cache.shape
    if v_head_dim is not None and fused:
        dv = v_head_dim
    else:
        dv = (k_cache.shape[-1] - d) if fused else v_cache.shape[-1]
    W = k_cache.shape[-1] if fused else d + dv  # physical page lane width
    g = hq // hkv
    n_tiles = _cdiv(min(max_seqlen_k, nb * bs), bs)
    depth = max(1, min(VXK_DECODE_DMA_DEPTH(), n_tiles))
    # pages per staged-softmax fold.  stage=1 keeps logits in registers
    # and folds per page; stage=2 stages pairs into a VMEM buffer and
    # folds once (halving the acc-rescale VPU pass) — measured SLOWER on
    # v5e 8B decode (the sbuf round trip and deferred slot re-issue cost
    # more than the saved rescales), so per-page is the default.
    stage = VXK_DECODE_STAGE() or 1
    if depth % stage != 0:
        stage = 1

    q4 = q.reshape(b_, hkv, g, d)
    # padded-q mode: whole [.., W] pages serve as both K and V; q
    # zero-pads over the V (and lane-pad) half so QK contracts exactly,
    # the accumulator runs W-wide and the caller slices out [d : d+dv].
    # Covers half-lane fused pages (d == dv == 64, W 128) and padded MLA
    # absorbed-latent pages (576/512 in W 1152).
    qpad_mode = fused and (d % 128 != 0 or d + dv != W
                           or v_lane_offset is not None)
    dq = W if qpad_mode else d
    dvk = W if qpad_mode else dv
    if qpad_mode:
        q4 = jnp.pad(q4, ((0, 0),) * 3 + ((0, W - d),))
    exp_spec, sink_arr = _exp_consts(scale, softcap, sink, hkv, g)
    desc = jnp.stack([
        jnp.asarray(1.0 if k_descale is None else k_descale,
                    jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_descale is None else v_descale,
                    jnp.float32).reshape(()),
    ]).reshape(1, 2)

    fresh = fresh_kv is not None
    assert not fresh or fused, "fresh_kv requires the fused page layout"
    assert not fresh or d + dv == W, (
        "fresh_kv rows are [Hkv, Dk+Dv]; padded MLA pages scatter first")
    wb = fresh and fresh_slots is not None and bs % 8 == 0
    spec = dict(
        bs=bs, stage=stage,
        window_left=int(window[0]), has_sink=sink is not None,
        fp8_kv=k_cache.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2),
        depth=depth, fused=fused, fresh=fresh, d=d, qpad=qpad_mode,
        writeback=wb, out_q=bool(out_quant), **exp_spec,
    )

    cache_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (1 if fused else 2)
    fresh_specs, fresh_in = [], ()
    if fused:
        bufs = [pltpu.VMEM((depth, hkv, bs, W), k_cache.dtype)]
        sems = [pltpu.SemaphoreType.DMA((depth,))]
        if fresh:
            assert fresh_kv.dtype == k_cache.dtype, (
                "fresh_kv must be pre-quantized to the cache dtype")
            fresh_specs = [pl.BlockSpec((1, hkv, 1, W),
                                        lambda b, *_: (b, 0, 0, 0))]
            fresh_in = (fresh_kv.reshape(b_, hkv, 1, W),)
    else:
        bufs = [pltpu.VMEM((depth, hkv, bs, d), k_cache.dtype),
                pltpu.VMEM((depth, hkv, bs, dv), v_cache.dtype)]
        sems = [pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((depth,))]
    prefetch = [seqused_k.astype(jnp.int32), block_table.astype(jnp.int32)]
    if wb:
        prefetch.append(fresh_slots.astype(jnp.int32))
    out_specs = [
        pl.BlockSpec((1, hkv, g, dvk), lambda b, *_: (b, 0, 0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct(
        (b_, hkv, g, dvk), jnp.int8 if out_quant else q.dtype)]
    if out_quant:
        out_specs.append(pl.BlockSpec((1, 1, 1), lambda b, *_: (b, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b_, 1, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, hkv, g, 1), lambda b, *_: (b, 0, 0, 0)))
    out_shapes.append(jax.ShapeDtypeStruct((b_, hkv, g, 1), jnp.float32))
    aliases = {}
    if wb:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype))
        # aliased input index counts scalar-prefetch + tensor operands:
        # (kv_lens, tbl, fslots, sink, desc, q4, fresh, cache)
        aliases = {7: len(out_specs) - 1}
    scratch = bufs + [
        pltpu.VMEM((hkv, g, 1), jnp.float32),
        pltpu.VMEM((hkv, g, 1), jnp.float32),
        pltpu.VMEM((hkv, g, dvk), jnp.float32),
    ]
    if wb:
        scratch.append(pltpu.VMEM((hkv, 8, W), k_cache.dtype))
    scratch += sems
    if wb:
        scratch.append(pltpu.SemaphoreType.DMA)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b_,),
        in_specs=[
            pl.BlockSpec((hkv, g, 1), lambda b, *_: (0, 0, 0)),   # sink
            pl.BlockSpec((1, 2), lambda b, *_: (0, 0),
                         memory_space=pltpu.SMEM),                # descale
            pl.BlockSpec((1, hkv, g, dq), lambda b, *_: (b, 0, 0, 0)),
        ] + fresh_specs + cache_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    caches = (k_cache,) if fused else (k_cache, v_cache)
    res = pl.pallas_call(
        functools.partial(_decode_kernel_dma, spec),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases=aliases,
        interpret=interpret_mode(),
    )(*prefetch, sink_arr, desc, q4, *fresh_in, *caches)
    res = list(res)
    out = res.pop(0)
    o_scale = res.pop(0) if out_quant else None
    lse = res.pop(0)
    new_cache = res.pop(0) if wb else None
    return out, lse, o_scale, new_cache


def _paged_decode_split(
    q, k_cache, v_cache, seqused_k, block_table, *,
    num_splits, scale, softcap, sink, k_descale, v_descale,
    max_seqlen_k, pages_per_step, fresh_kv, fresh_slots, out_quant,
    v_head_dim=None,
):
    """Split-KV decode: S contiguous page-range splits per sequence run
    as a virtual batch of B*S sequences through the unsplit kernel; the
    partials merge with the merge_attn_states LSE math (reference
    ReduceSplitK, csrc/xpu/attn paged_decode split reduction).  The sink
    column folds once, post-merge; a fresh row is scattered into the
    cache first (the reference ordering) so every split sees a coherent
    cache.  Exact: matches the unsplit kernel to accumulation order."""
    b_, hq, d = q.shape
    bs = k_cache.shape[2]
    if v_head_dim is not None and v_cache is None:
        dv = v_head_dim
    else:
        dv = (k_cache.shape[-1] - d) if v_cache is None else v_cache.shape[-1]
    mb = block_table.shape[1]
    s_ = max(2, min(int(num_splits), mb))
    p_ = _cdiv(mb, s_)
    new_cache = None
    if fresh_kv is not None:
        from vllm_xpu_kernels_tpu.ops.cache import scatter_fused_rows

        k_cache = new_cache = scatter_fused_rows(
            k_cache, fresh_kv, fresh_slots)
    tbl = block_table.astype(jnp.int32)
    if p_ * s_ > mb:
        tbl = jnp.pad(tbl, ((0, 0), (0, p_ * s_ - mb)))
    tbl_s = tbl.reshape(b_ * s_, p_)
    offs = (jnp.arange(s_, dtype=jnp.int32) * (p_ * bs))[None, :]
    used_s = jnp.clip(seqused_k.astype(jnp.int32)[:, None] - offs,
                      0, p_ * bs).reshape(b_ * s_)
    q_s = jnp.repeat(q, s_, axis=0)
    out_s, lse_s = paged_decode(
        q_s, k_cache, v_cache, None, used_s, tbl_s, scale=scale,
        window=(-1, -1), softcap=softcap, sink=None,
        k_descale=k_descale, v_descale=v_descale,
        max_seqlen_k=min(max_seqlen_k, p_ * bs),
        pages_per_step=pages_per_step, v_head_dim=v_head_dim)
    # merge the S partials per sequence (lse is [Hq, B*S], natural-log
    # domain in every exp mode; empty splits carry lse ~ -1e30, out = 0)
    lse_b = lse_s.reshape(hq, b_, s_)
    m = jnp.max(lse_b, axis=2)                            # [Hq, B]
    w = jnp.exp(lse_b - m[:, :, None])                    # [Hq, B, S]
    outf = out_s.astype(jnp.float32).reshape(b_, s_, hq, dv)
    num = jnp.einsum("hbs,bshd->bhd", w, outf)
    den = jnp.sum(w, axis=2)                              # [Hq, B]
    if sink is not None:
        den = den + jnp.exp(
            sink.astype(jnp.float32).reshape(hq)[:, None] - m)
    den = jnp.maximum(den, 1e-30)
    out = (num / den.T[:, :, None]).astype(q.dtype)
    lse = m + jnp.log(den)
    res = [out, lse]
    if out_quant:
        res.append(None)     # caller quantizes (normalized upstream)
    if fresh_kv is not None:
        res.append(new_cache)
    return tuple(res)


def paged_decode(
    q: jax.Array,                 # [B, Hq, D]
    k_cache: jax.Array,           # [nb, Hkv, bs, D]  (TPU-native layout)
    v_cache: jax.Array,           # [nb, Hkv, bs, Dv]
    cu_seqlens_q: jax.Array,      # unused (qlen == 1), kept for symmetry
    seqused_k: jax.Array,         # [B]
    block_table: jax.Array,       # [B, max_blocks]
    *,
    scale: float,
    window: tuple[int, int],
    softcap: float,
    sink: Optional[jax.Array],
    k_descale, v_descale,
    max_seqlen_k: int,
    num_splits_kv: int = 0,       # accepted for parity; see module doc
    pages_per_step: Optional[int] = None,
    fresh_kv: Optional[jax.Array] = None,
    fresh_slots: Optional[jax.Array] = None,
    out_quant: bool = False,
    v_head_dim: Optional[int] = None,
    v_lane_offset: Optional[int] = None,
):
    """-> (out [B, Hq, Dv], lse [Hq, B][, out_scale][, new kv_cache]).

    ``v_cache=None`` selects the fused page layout (``k_cache`` is
    [nb, Hkv, bs, Dk+Dv]): the dma impl copies each page with ONE async
    DMA; the pipelined impl reads K/V as two last-dim blocks of the same
    array (requires Dk == Dv).

    ``v_head_dim``: explicit Dv for fused pages whose lane width exceeds
    Dk+Dv (lane-padding).  The MLA absorbed-latent decode shape (qk 576 /
    vo 512, DeepSeek-V3) stores [K(576) | V(512) | zeros(64)] in
    1152-lane pages: one DMA per page on the dma kernel via the padded-q
    path, vs per-page BlockSpec costs on the split layout (measured 288
    -> ~2x GB/s at B=32, kv 4096 on v5e).

    ``v_lane_offset``: lane where V starts in the fused page (default
    Dk).  The ABSORBED MLA latent layout sets it to 0: a page row is
    [c_kv(512) | k_pe(64) | pad] where K is all 576 payload lanes and V
    is the FIRST 512 (V overlaps K — the padded-q kernel computes PV
    over the whole page width anyway; only the output slice moves).

    ``fresh_kv`` (fused layout only): [B, Hkv, Dk+Dv] quantized
    current-token row, ``seqused_k`` counting it, written at cache slot
    ``fresh_slots[b]`` (negative = skip).  The dma kernel folds it into
    the attention epilogue and writes the cache row itself (in-place
    alias into an 8-row page window already resident in VMEM) — the last
    return value.  When the dma kernel isn't eligible, the row is
    scattered first (same semantics, one extra XLA scatter on the
    critical path).

    ``out_quant``: request fused per-token int8 quant of the output
    (dma kernel only).  The return gains an ``out_scale`` [B] f32 value
    AFTER lse and ``out`` becomes int8; when the fast path is not taken
    the request is ignored and the caller quantizes itself
    (flash_attn_varlen_func normalizes this into an (out, scale|None)
    pair)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fused = v_cache is None
    b_, hq, d = q.shape
    nb, hkv, bs, _ = k_cache.shape
    if v_head_dim is not None:
        assert fused, "v_head_dim is a fused-page-layout parameter"
        dv = v_head_dim
    else:
        dv = (k_cache.shape[-1] - d) if fused else v_cache.shape[-1]
    W = k_cache.shape[-1] if fused else None   # physical page lane width
    g = hq // hkv
    if (num_splits_kv and num_splits_kv > 1 and window[0] < 0
            and v_lane_offset is None
            and block_table.shape[1] > 1):
        # Honored split-KV (reference ReduceSplitK,
        # paged_decode_kernel.hpp:67 + docs/group_split_kv_design.md):
        # run each sequence's page range as S virtual sequences and
        # merge the (O, LSE) partials exactly.  Window masking needs the
        # sequence-global frontier, so windowed calls stay unsplit.
        return _paged_decode_split(
            q, k_cache, v_cache, seqused_k, block_table,
            num_splits=int(num_splits_kv), scale=scale, softcap=softcap,
            sink=sink, k_descale=k_descale, v_descale=v_descale,
            max_seqlen_k=max_seqlen_k, pages_per_step=pages_per_step,
            fresh_kv=fresh_kv, fresh_slots=fresh_slots,
            out_quant=out_quant, v_head_dim=v_head_dim)
    assert v_lane_offset is None or v_lane_offset + dv <= (W or 0), (
        "v_lane_offset must address lanes inside the fused page")
    if fused:
        assert W % 128 == 0 and max(d, (0 if v_lane_offset is None
                                        else v_lane_offset) + dv) <= W, (
            "fused KV pages need a lane-aligned physical width; "
            "d == dv == 64 half-lane pages and MLA 576/512 (padded to "
            "1152) run via the padded-q path")
    assert fresh_kv is None or fused, \
        "fresh_kv requires the fused page layout"

    from vllm_xpu_kernels_tpu.envs import VXK_DECODE_IMPL
    # The dma kernel's manual HBM page slices need lane-aligned trailing
    # dims (Mosaic memref_slice: last dim a multiple of 128).  Fused
    # half-lane pages (d == dv == 64) qualify: whole [.., 128] pages are
    # copied and the padded-q trick avoids sub-128 lane slicing in the
    # kernel.  Exotic head sizes (MLA 192/576, tiny test heads) take the
    # pipelined kernel.
    dma_ok = (((d % 128 == 0 and dv % 128 == 0)
               or (fused and W % 128 == 0))
              and bs % 8 == 0)
    if dma_ok and VXK_DECODE_IMPL() == "dma" and pages_per_step is None:
        oq = out_quant and fresh_kv is None   # fresh merges post-kernel
        out4, lse4, o_scale, new_cache = _paged_decode_dma(
            q, k_cache, v_cache, seqused_k, block_table, scale=scale,
            window=window, softcap=softcap, sink=sink, k_descale=k_descale,
            v_descale=v_descale, max_seqlen_k=max_seqlen_k,
            fresh_kv=fresh_kv, fresh_slots=fresh_slots,
            out_quant=oq, v_head_dim=dv, v_lane_offset=v_lane_offset)
        if fused and (d % 128 != 0 or d + dv != W
                      or v_lane_offset is not None):
            vo = d if v_lane_offset is None else v_lane_offset
            out4 = out4[..., vo:vo + dv]     # qpad: slice the V lanes
        out = out4.reshape(b_, hq, dv)
        lse = lse4.reshape(b_, hq).T
        if fresh_kv is not None:
            # merge the current token's column for the WHOLE batch in one
            # batched op (merge_attn_states math with a value row) — the
            # kernel only attends over the cached tokens and writes the
            # cache row; per-sequence in-kernel folds were latency-bound
            # tiny dots (~2 ms/step at 8B batch 32).  The quantized row
            # upcasts exactly; descales fold like the kernel's.
            knf = fresh_kv[:, :, :d].astype(jnp.float32)
            vnf = fresh_kv[:, :, d:].astype(jnp.float32)
            if k_descale is not None:
                knf = knf * jnp.asarray(k_descale, jnp.float32)
            if v_descale is not None:
                vnf = vnf * jnp.asarray(v_descale, jnp.float32)
            qf = q.reshape(b_, hkv, g, d).astype(jnp.float32) * scale
            sk = jnp.einsum("bhgd,bhd->bhg", qf, knf)        # [B,hkv,g]
            if softcap:
                sk = softcap * jnp.tanh(sk / softcap)
            sk = sk.reshape(b_, hq)
            skip = (fresh_slots < 0)[:, None]                # padding rows
            sk = jnp.where(skip, -jnp.inf, sk)
            lse_t = lse.T                                    # [B, hq]
            m = jnp.maximum(lse_t, sk)
            m = jnp.maximum(m, -1e30)
            w_o = jnp.exp(lse_t - m)
            w_n = jnp.where(skip, 0.0, jnp.exp(sk - m))
            den = jnp.maximum(w_o + w_n, 1e-38)
            vrep = jnp.repeat(vnf, g, axis=1)                # [B, hq, dv]
            out = ((out.astype(jnp.float32) * w_o[:, :, None]
                    + vrep * w_n[:, :, None]) / den[:, :, None]
                   ).astype(out.dtype)
            lse = (m + jnp.log(den)).T
        res = [out, lse]
        if out_quant and oq:
            res.append(o_scale.reshape(b_))
        elif out_quant:
            res.append(None)
        if fresh_kv is not None:
            if new_cache is None:
                # writeback ineligible (e.g. bs % 8): scatter instead —
                # no same-step consumer, off the critical path
                from vllm_xpu_kernels_tpu.ops.cache import \
                    scatter_fused_rows

                new_cache = scatter_fused_rows(
                    k_cache, fresh_kv, fresh_slots)
            res.append(new_cache)
        return tuple(res)
    assert v_lane_offset is None or (
        dma_ok and VXK_DECODE_IMPL() == "dma" and pages_per_step is None), (
        "v_lane_offset (absorbed MLA latent pages) requires the dma "
        "decode kernel path")
    if fresh_kv is not None:
        # pipelined kernel / exotic shapes: scatter the fresh row first
        # (the reference ordering), then attend over the full length.
        from vllm_xpu_kernels_tpu.ops.cache import scatter_fused_rows

        k_cache = scatter_fused_rows(k_cache, fresh_kv, fresh_slots)
        out, lse = paged_decode(
            q, k_cache, None, cu_seqlens_q, seqused_k, block_table,
            scale=scale, window=window, softcap=softcap, sink=sink,
            k_descale=k_descale, v_descale=v_descale,
            max_seqlen_k=max_seqlen_k, pages_per_step=pages_per_step)
        return out, lse, k_cache
    if fused:
        assert d == dv, ("the pipelined decode kernel reads a fused cache "
                         "as two equal last-dim blocks; Dk must equal Dv")
    n_tiles = _cdiv(min(max_seqlen_k, nb * bs), bs)
    # pages per grid step: fat steps amortize per-step pipeline cost; cap
    # VMEM at ~2 MB of pages per buffered stage.
    page_bytes = hkv * bs * (d + dv) * k_cache.dtype.itemsize
    from vllm_xpu_kernels_tpu.envs import VXK_DECODE_PAGES_PER_STEP
    pp = pages_per_step or VXK_DECODE_PAGES_PER_STEP() or max(
        1, min(n_tiles, 2 * 1024 * 1024 // max(page_bytes, 1), 4))
    pp = min(pp, n_tiles)
    n_steps = _cdiv(n_tiles, pp)

    # layout: [B, Hkv, G, D]; the q block picks the kv-head's G q-heads
    # (block dims equal the trailing array dims, satisfying Mosaic tiling).
    q4 = q.reshape(b_, hkv, g, d)

    exp_spec, sink_arr = _exp_consts(scale, softcap, sink, hkv, g)
    desc = jnp.stack([
        jnp.asarray(1.0 if k_descale is None else k_descale,
                    jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_descale is None else v_descale,
                    jnp.float32).reshape(()),
    ]).reshape(1, 2)

    half_fused = fused and (d % 128 != 0 or d + dv != W)
    dq = W if half_fused else d
    dvk = W if half_fused else dv
    if half_fused:
        q4 = jnp.pad(q4, ((0, 0),) * 3 + ((0, W - d),))
    spec = dict(
        bs=bs, g=g, hkv=hkv, qpad=half_fused,
        window_left=int(window[0]), has_sink=sink is not None,
        fp8_kv=k_cache.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2),
        pages_per_step=pp, **exp_spec,
    )

    def q_map(b, j, kv_lens, tbl):
        return (b, 0, 0, 0)

    def kv_map_p(p, vblk=0):
        # Tail handling: operand p's index FREEZES at its own last in-range
        # page (p + pp*floor((last-p)/pp)) rather than clamping to `last`.
        # The Pallas pipeline skips the DMA when an operand's block index is
        # unchanged from the previous grid step, so frozen slots cost zero
        # bandwidth; clamping to `last` re-fetched a page another slot had
        # already loaded (9 pages at pp=4 issued 12 page DMAs, +33% KV
        # traffic).  Stale tail data is masked by the kpos >= kv_len mask.
        # ``vblk``: last-dim block index — fused caches read V as block 1
        # of the [.., Dk+Dv] page (Dk == Dv required).
        def kv_map(b, j, kv_lens, tbl):
            last = jnp.maximum((kv_lens[b] + bs - 1) // bs - 1, 0)
            jmax = jnp.maximum((last - p) // pp, 0)
            jc = jnp.where(p <= last,
                           p + pp * jnp.minimum(j, jmax), last)
            return (tbl[b, jc], 0, 0, vblk)
        return kv_map

    v_specs = ([] if half_fused else [
        pl.BlockSpec((1, hkv, bs, dv), kv_map_p(p, vblk=1 if fused else 0))
        for p in range(pp)])
    v_ins = (() if half_fused
             else ((k_cache if fused else v_cache),) * pp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_, n_steps),
        in_specs=[
            pl.BlockSpec((hkv, g, 1), lambda b, j, *_: (0, 0, 0)),   # sink
            pl.BlockSpec((1, 2), lambda b, j, *_: (0, 0),
                         memory_space=pltpu.SMEM),                   # descale
            pl.BlockSpec((1, hkv, g, dq), q_map),
        ] + [
            pl.BlockSpec((1, hkv, bs, dq), kv_map_p(p)) for p in range(pp)
        ] + v_specs,
        out_specs=[
            pl.BlockSpec((1, hkv, g, dvk), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, hkv, g, 1), lambda b, j, *_: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, g, 1), jnp.float32),
            pltpu.VMEM((hkv, g, 1), jnp.float32),
            pltpu.VMEM((hkv, g, dvk), jnp.float32),
        ],
    )
    # sink/descale ride as tiny SMEM tensors (not prefetch: float arrays)
    out, lse4 = pl.pallas_call(
        functools.partial(_decode_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_, hkv, g, dvk), q.dtype),
            jax.ShapeDtypeStruct((b_, hkv, g, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(seqused_k.astype(jnp.int32), block_table.astype(jnp.int32),
      sink_arr, desc, q4, *([k_cache] * pp), *v_ins)
    if half_fused:
        out = out[..., d:d + dv]   # discard the K half (and lane pad)
    return out.reshape(b_, hq, dv), lse4.reshape(b_, hq).T


# ---------------------------------------------------------------------------
# chunked varlen prefill (reference: chunk_prefill_kernel.hpp)
# ---------------------------------------------------------------------------


def _prefill_kernel(
    spec,
    # scalar prefetch
    q_lens_ref, kv_lens_ref, offs_ref, tbl_ref,
    # tensors: sink, descale, q, then P (k, v) tile pairs
    *refs,
):
    """One grid step = (seq, KV head, q tile, P KV tiles) with ALL of the
    KV head's G q-heads batched into the step's matmuls ([G*bq, D] x
    [bkv, D]).  The original per-q-head single-page grid ran 4096 steps
    per layer at Llama-3-8B prefill shapes and was wholly bound by the
    ~1 us/step pipeline cost (103 ms/step, 5% of MXU peak); head-group
    batching x multi-page steps cut it ~16x."""
    import jax.experimental.pallas as pl

    P = spec["pages"]
    sink_ref, descale_ref, q_ref = refs[:3]
    k_refs = refs[3:3 + P]
    nv = 0 if spec["qpad"] else P       # qpad: V rides in the K pages
    v_refs = refs[3 + P:3 + P + nv]
    (o_ref, lse_ref, m_ref, l_ref, acc_ref,
     s_buf, v_buf) = refs[3 + P + nv:]

    b = pl.program_id(0)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    bq, bkv, g = spec["bq"], spec["bkv"], spec["g"]

    q_len = q_lens_ref[b]
    kv_len = kv_lens_ref[b]
    n_kv_tiles = jnp.maximum((kv_len + bkv - 1) // bkv, 1)

    @pl.when(jk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # fp8 KV: k_descale folds into the logits scale, v_descale into the
    # epilogue accumulator — the per-tile chain stays a pure upcast+cast.
    qk_scale = (spec["scale"] * descale_ref[0, 0] if spec["fp8_kv"]
                else spec["scale"])
    # bf16 matmul operands, f32 accumulation: f32 x f32 runs at a
    # fraction of the MXU's bf16 rate (measured 15 vs 100+ TFLOPS here).
    # The QK scale folds into q BEFORE the bf16 cast (scaling doesn't
    # change float relative precision) — saves one full f32 VPU pass
    # over the staged [g, bq, P*bkv] logits per page.
    q = (q_ref[0, 0].astype(jnp.float32)
         * qk_scale).astype(jnp.bfloat16)                # [g, bq, D]
    # causal/window diagonal offset: kv_len - q_len for self-attention;
    # ring-CP blocks override it with the true global block offset
    off = offs_ref[b]
    qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (g, bq, bkv), 1)

    # causal frontier: KV tiles strictly above the last visible position
    # of this q tile are fully masked — skip their compute entirely
    # (halves softmax VPU work and QK/PV MXU work for self-attention).
    if spec["causal"]:
        last_vis = iq * bq + bq - 1 + off
        n_vis_tiles = jnp.minimum(
            n_kv_tiles, jnp.maximum(last_vis // bkv + 1, 0))
    else:
        n_vis_tiles = n_kv_tiles

    # Stage all P page logits into one [g, bq, P*bkv] buffer and run a
    # SINGLE online-softmax update per grid step: the per-tile
    # max/exp/sum/acc-rescale passes are the VPU bottleneck at prefill
    # (the matmuls are a minority of the time), and one wide update
    # amortizes the acc rescale and max/sum over P pages.  Interior
    # tiles (every row sees every column) also skip the position masks.
    windowed = spec["window_left"] >= 0 or spec["window_right"] >= 0
    q_full = (iq + 1) * bq <= q_len

    def stage_tile(p, jt, masked):
        from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
            fp8_upcast_f32)

        if spec["qpad"]:
            # half-lane fused pages (Dk == Dv == 64, page width 128):
            # the WHOLE page serves as both K and V — q is zero-padded
            # over the V half so QK contracts exactly, and PV runs with
            # a 128-wide accumulator whose K half is discarded outside
            # (no sub-128 lane slicing, which Mosaic rejects/relayouts)
            blk = k_refs[p][0, 0]
            k = (fp8_upcast_f32(blk).astype(jnp.bfloat16)
                 if spec["fp8_kv"] else blk.astype(jnp.bfloat16))
            v = k
        elif spec["fp8_kv"]:
            k = fp8_upcast_f32(k_refs[p][0, 0]).astype(jnp.bfloat16)
            v = fp8_upcast_f32(v_refs[p][0, 0]).astype(jnp.bfloat16)
        else:
            k = k_refs[p][0, 0].astype(jnp.bfloat16)         # [bkv, D]
            v = v_refs[p][0, 0].astype(jnp.bfloat16)         # [bkv, Dv]
        s = jax.lax.dot_general(
            q, k, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # scale folded in q
        if spec["softcap"]:
            s = spec["softcap_mult"] * jnp.tanh(s / spec["softcap"])
        if masked:
            kpos = jt * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (g, bq, bkv), 2)
            mask = (kpos >= kv_len) | (qpos >= q_len)
            if spec["causal"]:
                mask = mask | (kpos > qpos + off)
            if spec["window_right"] >= 0:
                mask = mask | (kpos > qpos + off + spec["window_right"])
            if spec["window_left"] >= 0:
                mask = mask | (kpos < qpos + off - spec["window_left"])
            s = jnp.where(mask, -jnp.inf, s)
        s_buf[:, :, p * bkv:(p + 1) * bkv] = s
        v_buf[p * bkv:(p + 1) * bkv] = v

    for p in range(P):
        jt = jk * P + p
        if windowed:
            @pl.when(jt < n_vis_tiles)
            def _(p=p, jt=jt):
                stage_tile(p, jt, True)
        else:
            interior = ((jt + 1) * bkv <= kv_len) & q_full
            if spec["causal"]:
                interior = interior & ((jt + 1) * bkv - 1 <= iq * bq + off)

            @pl.when(interior)
            def _(p=p, jt=jt):
                stage_tile(p, jt, False)

            @pl.when((jt < n_vis_tiles) & ~interior)
            def _(p=p, jt=jt):
                stage_tile(p, jt, True)

        @pl.when(jt >= n_vis_tiles)
        def _(p=p):
            s_buf[:, :, p * bkv:(p + 1) * bkv] = jnp.full(
                (g, bq, bkv), -jnp.inf, jnp.float32)
            # exp(-inf)=0 rows must not meet NaN/Inf scratch garbage
            # (0 * NaN = NaN in the PV matmul)
            v_buf[p * bkv:(p + 1) * bkv] = jnp.zeros(
                (bkv, v_buf.shape[-1]), v_buf.dtype)

    s = s_buf[...]
    cur = jnp.max(s, axis=-1, keepdims=True)                 # [g, bq, 1]
    m_old = m_ref[...]
    m_new = jnp.maximum(jnp.maximum(cur, m_old), _NEG)
    ex = jnp.exp2 if spec["exp2"] else jnp.exp
    alpha = ex(m_old - m_new)
    pmat = ex(s - m_new)
    l_ref[...] = (l_ref[...] * alpha
                  + jnp.sum(pmat, axis=-1, keepdims=True))
    pv = jax.lax.dot_general(
        pmat.astype(jnp.bfloat16), v_buf[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [g, bq, Dv]
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        m = m_ref[...]
        l = l_ref[...]
        acc = acc_ref[...]
        if spec["fp8_kv"]:
            acc = acc * descale_ref[0, 1]    # v_descale folded out
        if spec["has_sink"]:
            sv = sink_ref[0]                                 # [g, 1]
            m_f = jnp.maximum(m, sv[:, None, :])
            corr = ex(m - m_f)
            l = l * corr + ex(sv[:, None, :] - m_f)
            acc = acc * corr
            m = m_f
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = (m * spec["m2ln"]
                      + jnp.log(jnp.maximum(l, 1e-30)))


def chunk_prefill(
    q: jax.Array,                       # [total_q, Hq, D] packed varlen
    k: jax.Array,       # paged [nb, Hkv, bs, D] | packed [total_k, Hkv, D]
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: Optional[jax.Array],
    seqused_k: Optional[jax.Array],
    block_table: Optional[jax.Array],
    *,
    max_seqlen_q: int,
    max_seqlen_k: int,
    scale: float,
    causal: bool,
    window: tuple[int, int],
    softcap: float,
    sink: Optional[jax.Array],
    k_descale, v_descale,
    # 512-row q tiles halve the staged-softmax update count vs 256
    # (TTFT 283.3 -> 278.7 ms, prefill 14.5k -> 14.7k tok/s at w8a8
    # 4x1024; the wider tile shrinks pages-per-step under the same
    # VMEM cap, which nets positive).  VXK_PREFILL_BLOCK_Q overrides.
    block_q: int = 512,
    causal_offsets: Optional[jax.Array] = None,
):
    """-> (out [total_q, Hq, Dv], lse [Hq, total_q]).

    ``v=None`` (paged only) selects the fused page layout: ``k`` is
    [nb, Hkv, bs, Dk+Dv], read as two last-dim blocks (Dk == Dv).

    ``causal_offsets`` ([B] int32): override the per-seq causal/window
    diagonal offset (default ``kv_len - q_len``, the bottom-right-aligned
    self-attention diagonal).  Ring/context-parallel callers pass the
    TRUE global offset of the q chunk relative to the kv block, which
    makes one kernel serve every ring case: offset >= kv_len => block
    fully visible, 0 => standard causal diagonal, very negative =>
    fully masked (l == 0 partial that LSE-merges as a no-op)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vllm_xpu_kernels_tpu.ops import attention as attn_ops

    total_q, hq, d = q.shape
    paged = block_table is not None
    fused = v is None
    assert not fused or paged, "fused KV layout is a paged-cache layout"
    if paged:
        nb, hkv, bs, _ = k.shape
        dv = (k.shape[-1] - d) if fused else v.shape[-1]
        if fused:
            assert d == dv, ("the prefill kernel reads a fused cache as "
                             "two equal last-dim blocks; Dk must equal Dv")
            assert (d + dv) % 128 == 0, "fused pages must be lane-aligned"
        bkv = bs
        kv_limit = min(max_seqlen_k, nb * bs)
    else:
        hkv = k.shape[1]
        dv = v.shape[-1]
        bkv = min(512, _round_up(max_seqlen_k, 128))
        kv_limit = max_seqlen_k
    g = hq // hkv
    batch = int(cu_seqlens_q.shape[0]) - 1
    from vllm_xpu_kernels_tpu.envs import VXK_PREFILL_BLOCK_Q

    bq = min(VXK_PREFILL_BLOCK_Q() or block_q,
             _round_up(max_seqlen_q, 8))
    qp = _round_up(max_seqlen_q, bq)
    n_q_tiles = qp // bq
    n_kv_tiles = _cdiv(kv_limit, bkv)

    q_lens = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    if paged:
        kv_lens = seqused_k.astype(jnp.int32)
        tbl = block_table.astype(jnp.int32)
    else:
        kv_lens = (cu_seqlens_k[1:] - cu_seqlens_k[:-1]).astype(jnp.int32)
        tbl = jnp.zeros((batch, 1), jnp.int32)

    # KV tiles per grid step: wide steps amortize the staged
    # online-softmax update (ONE max/exp/sum/rescale pass per step over
    # [g, bq, P*bkv] — the VPU work that bounds prefill attention; P=4 ->
    # 8 measured 1.20 -> 1.05 ms/layer on 4x1024 Llama-3-8B shapes).
    # VMEM caps: staged f32 logits <= 4 MB, double-buffered K+V operand
    # blocks <= 4 MB (P=16 at 8 MB staged compiled for short prompts but
    # blew the 16 MB scoped limit at 4k).
    from vllm_xpu_kernels_tpu.envs import VXK_PREFILL_PAGES_PER_STEP

    tile_bytes = bkv * (d + dv) * k.dtype.itemsize
    sbuf_page_bytes = g * bq * bkv * 4
    pages = VXK_PREFILL_PAGES_PER_STEP() or max(
        1, min(n_kv_tiles,
               4 * 1024 * 1024 // max(sbuf_page_bytes, 1),
               4 * 1024 * 1024 // max(4 * tile_bytes, 1),
               16))
    pages = min(pages, n_kv_tiles)
    n_kv_steps = _cdiv(n_kv_tiles, pages)

    # half-lane fused pages (Dk == Dv == 64): whole [.., 128] pages serve
    # as both K and V; q zero-pads over the V half so QK contracts
    # exactly, PV accumulates 128-wide and the K half is sliced off the
    # output below (no sub-128 lane slicing in the kernel)
    half_fused = fused and d % 128 != 0
    dq = d + dv if half_fused else d
    dvk = d + dv if half_fused else dv         # kernel-side value width
    # pad q per-seq, grouped by KV head: [B, Hkv, G, Qp, D]
    qpad, _, _ = attn_ops._gather_padded_q(q, cu_seqlens_q, batch, qp)
    qpad = qpad.transpose(0, 2, 1, 3).reshape(batch, hkv, g, qp, d)
    if half_fused:
        qpad = jnp.pad(qpad, ((0, 0),) * 4 + ((0, dv),))
    if not paged:
        kp = _round_up(kv_limit, bkv)
        kpad = attn_ops._gather_padded_kv_packed(
            k, cu_seqlens_k, batch, kp).transpose(0, 2, 1, 3)  # [B,Hkv,Kp,D]
        vpad = attn_ops._gather_padded_kv_packed(
            v, cu_seqlens_k, batch, kp).transpose(0, 2, 1, 3)

    exp_spec, sink_arr = _exp_consts(scale, softcap, sink, hkv, g)
    desc = jnp.stack([
        jnp.asarray(1.0 if k_descale is None else k_descale,
                    jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_descale is None else v_descale,
                    jnp.float32).reshape(()),
    ]).reshape(1, 2)
    spec = dict(
        bq=bq, bkv=bkv, g=g, pages=pages,
        causal=bool(causal), qpad=half_fused,
        window_left=int(window[0]), window_right=int(window[1]),
        has_sink=sink is not None,
        fp8_kv=(k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)),
        **exp_spec,
    )

    def q_map(b, h, iq, jk, *_):
        return (b, h, 0, iq, 0)

    def last_tile(b, iq, kv_lens, offs):
        # last in-range KV tile for this (seq, q tile): bounded by the
        # KV length and, for causal, by the q tile's visibility frontier
        # — frozen slots past it issue no DMA (index unchanged).
        last = jnp.maximum((kv_lens[b] + bkv - 1) // bkv - 1, 0)
        if causal:
            frontier = iq * bq + bq - 1 + offs[b]
            last = jnp.clip(frontier // bkv, 0, last)
        return last

    def kv_map_p(p, paged_map, vblk=0):
        # ``vblk``: last-dim block index — fused caches read V as block 1
        # of the [.., Dk+Dv] page.
        def kv_map(b, h, iq, jk, q_lens, kv_lens, offs, tbl):
            last = last_tile(b, iq, kv_lens, offs)
            jmax = jnp.maximum((last - p) // pages, 0)
            jc = jnp.where(p <= last,
                           p + pages * jnp.minimum(jk, jmax), last)
            if paged_map:
                return (tbl[b, jc], h, 0, vblk)
            return (b, h, jc, vblk)
        return kv_map

    k_specs = [pl.BlockSpec((1, 1, bkv, dq), kv_map_p(p, paged))
               for p in range(pages)]
    if half_fused:
        # the whole page is the only operand; the kernel reads V from it
        v_specs, v_ins = [], ()
    else:
        v_specs = [pl.BlockSpec((1, 1, bkv, dv),
                                kv_map_p(p, paged, vblk=1 if fused else 0))
                   for p in range(pages)]
        v_ins = ((k if fused else v) if paged else vpad,) * pages
    k_in = k if paged else kpad

    offs = (causal_offsets.astype(jnp.int32) if causal_offsets is not None
            else (kv_lens - q_lens).astype(jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, hkv, n_q_tiles, n_kv_steps),
        in_specs=[
            pl.BlockSpec((1, g, 1), lambda b, h, iq, jk, *_: (h, 0, 0)),
            pl.BlockSpec((1, 2), lambda *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, bq, dq), q_map),
        ] + k_specs + v_specs,
        out_specs=[
            pl.BlockSpec((1, g, bq, dvk),
                         lambda b, h, iq, jk, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, g, bq, 1),
                         lambda b, h, iq, jk, *_: (b, h, iq, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, bq, 1), jnp.float32),
            pltpu.VMEM((g, bq, 1), jnp.float32),
            pltpu.VMEM((g, bq, dvk), jnp.float32),
            pltpu.VMEM((g, bq, pages * bkv), jnp.float32),   # staged logits
            pltpu.VMEM((pages * bkv, dvk), jnp.bfloat16),    # staged V
        ],
    )
    opad, lsepad = pl.pallas_call(
        functools.partial(_prefill_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, hq, qp, dvk), q.dtype),
            jax.ShapeDtypeStruct((batch, hq, qp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(q_lens, kv_lens, offs, tbl, sink_arr, desc, qpad,
      *([k_in] * pages), *v_ins)
    if half_fused:
        opad = opad[..., d:]                     # discard the K half

    seq_of_row, pos_of_row = attn_ops._row_maps(cu_seqlens_q, total_q, batch)
    out = opad[seq_of_row, :, pos_of_row]        # [total_q, Hq, Dv]
    lse = lsepad[seq_of_row, :, pos_of_row, 0].T  # [Hq, total_q]
    return out, lse

"""Pallas paged MQA-logits kernel — the DeepSeek-V3.2 sparse-indexer
scoring pass (reference: csrc/xpu/mqa_logits/xe_2/mqa_logits_xe2.cpp:45
``fp8_mqa_logits_kernel_t``, WGTile 32x64x32; schema
csrc/xpu/torch_bindings.cpp:139-150).

The op is an fp8 Q·Kᵀ with per-token KV scales, relu, and a per-head
weighted sum — KV-stream bandwidth bound.  The jnp reference tier
gathers and dequantizes the ENTIRE paged KV to f32 (at 128k context
~0.5 GB of f32 per call) before a dense einsum; this kernel streams the
fp8 pages directly:

- grid (seq, kv-chunk); each chunk covers P pages so the out block's
  lane dim is a multiple of 128 and the per-step pipeline cost amortizes
  (same fat-step rule as the decode/prefill attention kernels).
- the block-table indirection lives in scalar-prefetched index maps with
  the frozen-tail trick (consecutive equal indices => no DMA), exactly
  like kernels/flash_attention.
- per-token scales ride as [nb, 1, bs] blocks; the fp8 payload upcasts
  with the packed-lane bit trick (quant_matmul.fp8_upcast_f32).
- output stays the reference's dense [B*next_n, max_model_len] f32
  logits (fed to ops.top_k_per_row_decode), but no dequantized KV copy
  ever exists.

Two kernel variants (VXK_MQA_IMPL):

- ``blockspec``: operand-pipelined pages — step-cost-bound at the
  indexer's tiny pages (8 KB at bs 64): 16-24 GB/s on v5e.
- ``dma`` (default): grid over sequences, kernel-managed page copies in
  two ping-pong halves with ONE combined semaphore wait per full round
  (full rounds issue all R copies under a single branch — the per-page
  pl.when guards were scalar-core cost on par with the descriptors),
  scales pre-gathered dense and copied one chunk per round, fat staged
  QK dots with the per-token scale folded AFTER the relu-weighted head
  sum (scales are positive, so relu(s·c) == relu(s)·c — one [n, cols]
  pass instead of [n·h, cols]), async output chunk writes.
  **289 GB/s on the native (values, scales) cache** at B=32, 32k ctx,
  bs=256 on v5e (round-4 measurement; the 45 GB/s recorded in round 3
  was the packed-parity BYTE layout, whose per-call unpack costs a full
  extra KV read+write+bitcast relayout — serving feeds the structured
  pair from indexer_k_quant_and_cache and never pays it).  Remaining
  gap to the 819 GB/s stream roofline: the e4m3 upcast + [32, R·bs] QK
  dot + relu/weighted-sum VPU chain are core-serial per round (~same
  wall as the fp8 GEMM recipes); fatter serving pages (block_size >=
  256) amortize the per-page DMA issue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import interpret_mode

_NEG = float("-inf")


def _cdiv(a, b):
    return -(-a // b)


def _mqa_kernel(spec, ctx_ref, tbl_ref, *refs):
    import jax.experimental.pallas as pl

    P = spec["pages"]
    bs = spec["bs"]
    next_n = spec["next_n"]
    q_ref, w_ref = refs[0], refs[1]
    kv_refs = refs[2:2 + P]
    sc_refs = refs[2 + P:2 + 2 * P]
    o_ref, kstage, sstage = refs[2 + 2 * P:]

    b = pl.program_id(0)
    j = pl.program_id(1)
    ctx = ctx_ref[b]
    n_pages = jnp.maximum((ctx + bs - 1) // bs, 1)

    from vllm_xpu_kernels_tpu.kernels.quant_matmul import fp8_upcast_f32

    h, d = q_ref.shape[2], q_ref.shape[3]
    q2 = fp8_upcast_f32(q_ref[0]).astype(jnp.bfloat16).reshape(
        next_n * h, d)                                   # [n*h, d]
    w = w_ref[0].astype(jnp.float32)                     # [next_n, h]

    # Stage the step's P pages into one [P*bs, d] buffer and run ONE fat
    # QK dot: per-page [n*h, d] x [d, bs] matrix-vector dots are MXU
    # latency-bound (~us each — 16 of them made the kernel 16 GB/s);
    # the staged form is a single [n*h, d] x [P*bs, d]^T pass.  Stale
    # columns of skipped pages are killed by the position mask.
    for p in range(P):
        jp = j * P + p

        @pl.when(jp < n_pages)
        def _(p=p):
            kstage[p * bs:(p + 1) * bs, :] = fp8_upcast_f32(
                kv_refs[p][0]).astype(jnp.bfloat16)
            sstage[:, p * bs:(p + 1) * bs] = jnp.broadcast_to(
                sc_refs[p][0], (1, bs))

    s = jax.lax.dot_general(
        q2, kstage[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [n*h, P*bs]
    s = s.reshape(next_n, h, P * bs) * sstage[0][None, None, :]
    # per-head weighted sum over the (small) head axis on the VPU — a
    # batched matrix-vector dot here would be latency-bound again
    lg = jnp.sum(jax.nn.relu(s) * w[:, :, None], axis=1)  # [n, P*bs]
    kpos = (j * P * bs
            + jax.lax.broadcasted_iota(jnp.int32, (next_n, P * bs), 1))
    q_off = (ctx - next_n
             + jax.lax.broadcasted_iota(jnp.int32, (next_n, P * bs), 0))
    mask = (kpos <= q_off) & (kpos < ctx)
    o_ref[0] = jnp.where(mask, lg, _NEG)


def _mqa_dma_kernel(spec, ctx_ref, tbl_ref, q_ref, w_ref, kv_hbm, sc_hbm,
                    o_hbm, kbuf, sbuf0, sbuf1, obuf, sk0, sk1, ss, so):
    """One grid step = one sequence.  The kernel walks the block table
    with kernel-managed async page copies (indexer pages are ~8 KB —
    BlockSpec operand pipelines drown in per-step cost at that size) in
    two ping-pong HALVES of R pages each (buffer slots stay static
    python ints — dynamic VMEM indexing lowers to an unsupported
    gather): while half A's fat QK dot runs, half B's pages are in
    flight.  All R page copies of a half share ONE semaphore and are
    drained with a single combined-byte wait; per-token scales are
    pre-gathered to a dense [B, span] array outside (one ~2 MB XLA
    gather vs 512 tiny in-kernel copies) and DMA'd one chunk per round,
    multiplying the logit columns post-dot (lane orientation — scaling
    K rows would need a lane->sublane transpose).  Output chunks stream
    back with per-half async copies."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vllm_xpu_kernels_tpu.kernels.quant_matmul import fp8_upcast_f32

    bs, d = spec["bs"], spec["d"]
    R = spec["round"]
    next_n, h = spec["next_n"], spec["h"]
    b = pl.program_id(0)
    num_seqs = pl.num_programs(0)
    ctx = ctx_ref[b]
    n_pages = jnp.maximum((ctx + bs - 1) // bs, 1)
    n_rounds = spec["n_rounds"]          # static and EVEN (span padded)

    sks = (sk0, sk1)
    sbufs = (sbuf0, sbuf1)

    def issue_half(seq, r, half, lim):
        base = r * R

        # full rounds issue all R copies under ONE branch — the per-page
        # pl.when guards cost ~as much scalar time as the copy-start
        # descriptors themselves (the issue loop, not the transfer, is
        # what bounds this kernel at small pages)
        @pl.when(base + R <= lim)
        def _():
            for c in range(R):
                pltpu.make_async_copy(
                    kv_hbm.at[tbl_ref[seq, base + c]],
                    kbuf.at[half * R + c], sks[half]).start()

        @pl.when((base < lim) & (base + R > lim))
        def _():
            for c in range(R):
                @pl.when(base + c < lim)
                def _(c=c):
                    pltpu.make_async_copy(
                        kv_hbm.at[tbl_ref[seq, base + c]],
                        kbuf.at[half * R + c], sks[half]).start()
        pltpu.make_async_copy(
            sc_hbm.at[pl.ds(seq * spec["sc_span"] + r * R * bs, R * bs)],
            sbufs[half], ss.at[half]).start()

    @pl.when(b == 0)
    def _():
        issue_half(b, 0, 0, n_pages)
        issue_half(b, 1, 1, n_pages)

    q2 = fp8_upcast_f32(q_ref[0]).astype(jnp.bfloat16).reshape(
        next_n * h, d)
    w = w_ref[0].astype(jnp.float32)                     # [next_n, h]

    def half_round(r, half, first_pair):
        base = r * R
        npg = jnp.clip(n_pages - base, 0, R)

        # one combined wait drains all R page copies of a full round
        # (they share one DMA semaphore; the wait descriptor's byte
        # count is what gets drained — a whole-half copy shape).  Only
        # the final partial round falls back to per-page waits.
        @pl.when(npg == R)
        def _():
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(0, R)],
                kbuf.at[pl.ds(half * R, R)], sks[half]).wait()

        @pl.when((npg > 0) & (npg < R))
        def _():
            for c in range(R):
                @pl.when(c < npg)
                def _(c=c):
                    pltpu.make_async_copy(
                        kv_hbm.at[0], kbuf.at[half * R + c],
                        sks[half]).wait()
        pltpu.make_async_copy(
            sc_hbm.at[pl.ds(0, R * bs)], sbufs[half],
            ss.at[half]).wait()

        k = fp8_upcast_f32(
            kbuf[half * R:(half + 1) * R].reshape(R * bs, d)
        ).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n*h, R*bs]
        # per-token scales are POSITIVE (amax/448 with a 1e-4 floor), so
        # relu(s*scale) == relu(s)*scale and the scale multiply folds
        # AFTER the head sum: one [n, cols] pass instead of [n*h, cols]
        s3 = s.reshape(next_n, h, R * bs)
        lg = (jnp.sum(jax.nn.relu(s3) * w[:, :, None], axis=1)
              * sbufs[half][...][None, :])
        kpos = (base * bs + jax.lax.broadcasted_iota(
            jnp.int32, (next_n, R * bs), 1))
        q_off = (ctx - next_n + jax.lax.broadcasted_iota(
            jnp.int32, (next_n, R * bs), 0))

        @pl.when(~first_pair)
        def _():
            # this half's previous output copy must land before reuse
            pltpu.make_async_copy(
                obuf.at[half], o_hbm.at[b, :, pl.ds(0, R * bs)],
                so.at[half]).wait()
        obuf[half] = jnp.where((kpos <= q_off) & (kpos < ctx), lg, _NEG)
        pltpu.make_async_copy(
            obuf.at[half],
            o_hbm.at[b, :, pl.ds(base * bs, R * bs)],
            so.at[half]).start()
        # refill this half for round r + 2
        issue_half(b, r + 2, half, n_pages)

    def pair_body(r2, carry):
        half_round(2 * r2, 0, r2 == 0)
        half_round(2 * r2 + 1, 1, r2 == 0)
        return carry

    jax.lax.fori_loop(0, n_rounds // 2, pair_body, 0, unroll=False)

    # the refills of the LAST two rounds issued pages r+2 >= n_rounds
    # guarded by n_pages, so nothing is outstanding on sk; scale chunks
    # for rounds n_rounds..n_rounds+1 WERE issued (the scale array is
    # padded two rounds long) — drain them
    for half in range(2):
        pltpu.make_async_copy(
            sc_hbm.at[pl.ds(0, R * bs)], sbufs[half],
            ss.at[half]).wait()

    # prefetch the next sequence's head pages while the tail drains
    @pl.when(b + 1 < num_seqs)
    def _():
        issue_half(b + 1, 0, 0,
                   jnp.maximum((ctx_ref[b + 1] + bs - 1) // bs, 1))
        issue_half(b + 1, 1, 1,
                   jnp.maximum((ctx_ref[b + 1] + bs - 1) // bs, 1))

    # drain the final output copy of each half
    for half in range(2):
        pltpu.make_async_copy(
            obuf.at[half], o_hbm.at[b, :, pl.ds(0, R * bs)],
            so.at[half]).wait()


def paged_mqa_logits_dma(
    q, kv_vals, kv_scales, weights, context_lens, block_tables,
    max_model_len, round_pages=64, depth=32,
):
    """Manual-DMA paged MQA logits: grid over sequences, kernel-managed
    page copies, one fat QK dot per ``round_pages`` pages, async output
    chunk writes.  -> [B*next_n, max_model_len] f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, next_n, h, d = q.shape
    nb, bs, _ = kv_vals.shape
    max_blocks = min(block_tables.shape[1], _cdiv(max_model_len, bs))
    R = max(1, min(round_pages, max_blocks))
    # the flat f32 scale chunks are 1-D HBM slices — Mosaic's 1-D f32
    # tile is (1024,), so both the chunk length R*bs and every chunk
    # offset (multiples of it) must be 1024-aligned (a real-chip
    # memref_slice rule; interpret mode does not check it)
    while (R * bs) % 1024:
        R += 1
    del depth                    # fixed at two ping-pong halves (2R)
    n_rounds = 2 * _cdiv(_cdiv(max_blocks, R), 2)   # even (half pairs)
    span = n_rounds * R * bs

    tbl = block_tables[:, :max_blocks].astype(jnp.int32)
    ctx = context_lens.astype(jnp.int32)
    w3 = weights.astype(jnp.float32).reshape(b, next_n, h)
    # pre-gather per-seq scales to a DENSE [B, rounds+2, R*bs] array
    # (one small XLA gather) so the kernel moves ONE scale chunk per
    # round instead of one tiny copy per page; two tail rounds of
    # padding absorb the ping-pong refill's over-issue.
    scg = jnp.take(kv_scales.reshape(nb, bs), tbl, axis=0
                   ).reshape(b, max_blocks * bs)
    scg = jnp.pad(scg, ((0, 0), (0, (n_rounds + 2) * R * bs
                                 - max_blocks * bs)))
    sc2 = scg.reshape(-1)     # flat [B * (rounds+2) * R * bs]
    spec = dict(bs=bs, round=R, next_n=next_n,
                h=h, d=d, n_rounds=n_rounds,
                sc_span=(n_rounds + 2) * R * bs,
                page_bytes=bs * d * kv_vals.dtype.itemsize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, next_n, h, d),
                         lambda bb, *_: (bb, 0, 0, 0)),
            pl.BlockSpec((1, next_n, h), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * R, bs, d), kv_vals.dtype),
            pltpu.VMEM((R * bs,), jnp.float32),
            pltpu.VMEM((R * bs,), jnp.float32),
            pltpu.VMEM((2, next_n, R * bs), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mqa_dma_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, next_n, span), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(ctx, tbl, q, w3, kv_vals, sc2)[0]
    if span < max_model_len:
        out = jnp.concatenate([
            out, jnp.full((b, next_n, max_model_len - span), _NEG,
                          jnp.float32)], axis=-1)
    return out[:, :, :max_model_len].reshape(b * next_n, max_model_len)


def paged_mqa_logits_pallas(
    q: jax.Array,              # [B, next_n, H, D] fp8/bf16
    kv_vals: jax.Array,        # [nb, bs, D] fp8
    kv_scales: jax.Array,      # [nb, bs] f32
    weights: jax.Array,        # [B*next_n, H] f32
    context_lens: jax.Array,   # [B]
    block_tables: jax.Array,   # [B, max_blocks]
    max_model_len: int,
) -> jax.Array:
    """-> [B*next_n, max_model_len] f32 dense indexer logits."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, next_n, h, d = q.shape
    nb, bs, _ = kv_vals.shape
    max_blocks = min(block_tables.shape[1], _cdiv(max_model_len, bs))
    # pages per step: lane dim of the out block must be a multiple of
    # 128 (or the whole row).  Indexer pages are TINY (bs x 128 fp8 =
    # 8 KB at bs 64), so thin steps drown in per-grid-step cost — target
    # ~2048-token steps, capped at 16 page operands (each operand is an
    # index-mapped BlockSpec; dozens of maps per step cost more than
    # they feed).
    p_align = 1
    while (p_align * bs) % 128 and p_align * bs < max_model_len:
        p_align *= 2
    pages = max(p_align, min(max_blocks, 16, max(1, 2048 // bs))
                // p_align * p_align)
    n_chunks = _cdiv(max_blocks, pages)
    span = n_chunks * pages * bs

    tbl = block_tables[:, :max_blocks].astype(jnp.int32)
    ctx = context_lens.astype(jnp.int32)
    w3 = weights.astype(jnp.float32).reshape(b, next_n, h)
    sc3 = kv_scales.astype(jnp.float32).reshape(nb, 1, bs)

    def kv_map_p(p):
        def kv_map(bb, j, ctx, tbl):
            last = jnp.maximum((ctx[bb] + bs - 1) // bs - 1, 0)
            jmax = jnp.maximum((last - p) // pages, 0)
            jc = jnp.where(p <= last, p + pages * jnp.minimum(j, jmax),
                           last)
            return (tbl[bb, jnp.minimum(jc, max_blocks - 1)], 0, 0)
        return kv_map

    def sc_map_p(p):
        inner = kv_map_p(p)

        def sc_map(bb, j, ctx, tbl):
            blk, _, _ = inner(bb, j, ctx, tbl)
            return (blk, 0, 0)
        return sc_map

    spec = dict(pages=pages, bs=bs, next_n=next_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, next_n, h, d), lambda bb, j, *_: (bb, 0, 0, 0)),
            pl.BlockSpec((1, next_n, h), lambda bb, j, *_: (bb, 0, 0)),
        ] + [
            pl.BlockSpec((1, bs, d), kv_map_p(p)) for p in range(pages)
        ] + [
            pl.BlockSpec((1, 1, bs), sc_map_p(p)) for p in range(pages)
        ],
        out_specs=[
            pl.BlockSpec((1, next_n, pages * bs),
                         lambda bb, j, *_: (bb, 0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((pages * bs, d), jnp.bfloat16),   # staged K
            pltpu.VMEM((1, pages * bs), jnp.float32),    # staged scales
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mqa_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, next_n, span), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(ctx, tbl, q, w3, *([kv_vals] * pages), *([sc3] * pages))[0]
    if span < max_model_len:
        out = jnp.concatenate([
            out, jnp.full((b, next_n, max_model_len - span), _NEG,
                          jnp.float32)], axis=-1)
    return out[:, :, :max_model_len].reshape(b * next_n, max_model_len)

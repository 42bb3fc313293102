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
    o_ref = refs[2 + 2 * P]

    b = pl.program_id(0)
    j = pl.program_id(1)
    ctx = ctx_ref[b]
    n_pages = jnp.maximum((ctx + bs - 1) // bs, 1)

    from vllm_xpu_kernels_tpu.kernels.quant_matmul import fp8_upcast_f32

    h, d = q_ref.shape[2], q_ref.shape[3]
    q2 = fp8_upcast_f32(q_ref[0]).astype(jnp.bfloat16).reshape(
        next_n * h, d)                                   # [n*h, d]
    w = w_ref[0].astype(jnp.float32)                     # [next_n, h]
    # speculative query offsets: row n sees kv positions <= ctx-next_n+n
    q_off = (ctx - next_n
             + jax.lax.broadcasted_iota(jnp.int32, (next_n, bs), 0))

    for p in range(P):
        jp = j * P + p

        @pl.when(jp < n_pages)
        def _(p=p, jp=jp):
            k = fp8_upcast_f32(kv_refs[p][0]).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q2, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [n*h, bs]
            s = s.reshape(next_n, h, bs) * sc_refs[p][0]  # [1, bs] bcast
            lg = jax.lax.dot_general(
                w, jax.nn.relu(s), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # [next_n, bs]
            kpos = jp * bs + jax.lax.broadcasted_iota(
                jnp.int32, (next_n, bs), 1)
            mask = (kpos <= q_off) & (kpos < ctx)
            o_ref[0, :, p * bs:(p + 1) * bs] = jnp.where(mask, lg, _NEG)

        @pl.when(jp >= n_pages)
        def _(p=p):
            o_ref[0, :, p * bs:(p + 1) * bs] = jnp.full(
                (next_n, bs), _NEG, jnp.float32)


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
    # 128 (or the whole row); target ~512-token steps for fat pipelines
    p_align = 1
    while (p_align * bs) % 128 and p_align * bs < max_model_len:
        p_align *= 2
    pages = max(p_align, min(max_blocks, max(1, 512 // bs)
                             // p_align * p_align))
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

"""AOT precompilation for the serving path.

The reference instantiates its kernel-variant matrix at BUILD time (216
prefill + 384 decode combos, csrc/xpu/attn/kernel_configs/*.conf +
chunk_prefill_configure.cmake) so serving never JIT-compiles.  The XLA
analogue is ahead-of-time lowering: trace + compile every (batch bucket,
kv bucket) shape the scheduler can emit before the first request, so no
user-visible step ever pays the compile.

``precompile_decode`` returns the compiled executables keyed by bucket;
pair it with ``jax.config.update("jax_compilation_cache_dir", ...)`` to
persist them across processes (the role of the reference's prebuilt
wheel, setup.py:359-530).
"""

from __future__ import annotations

from typing import Optional, Sequence



def decode_buckets(
    batch_sizes: Sequence[int] = (8, 16, 32, 64),
    max_blocks: Sequence[int] = (8, 16, 32),
):
    """The default (batch, max_blocks) shape grid — the analogue of the
    reference's default kernel preset (~13+~17 combos)."""
    return [(b, mb) for b in batch_sizes for mb in max_blocks]


def precompile_decode(
    cfg,
    params,
    kv_caches,
    buckets: Optional[Sequence[tuple]] = None,
    donate_cache: bool = True,
    progress=None,
):
    """AOT-compile the llama decode step for every (batch, max_blocks)
    bucket -> {bucket: jax.stages.Compiled}.

    ``kv_caches`` is the live (k_cache, v_cache) pair — compiled
    executables are specialized to its buffer count/dtype.  Execution:
    ``compiled(params, tok, pos, slots, tbl, kv_lens, kc, vc)``.
    """
    import jax
    import jax.numpy as jnp

    from vllm_xpu_kernels_tpu.models.llama import decode_step

    kc, vc = kv_caches
    bs = cfg.block_size
    out = {}
    for bucket in (buckets or decode_buckets()):
        b, mb = bucket
        max_k = mb * bs

        def fn(p, tok, pos, slots, tbl, kv_lens, kc, vc, _mk=max_k):
            return decode_step(cfg, p, tok, pos, slots, tbl, kv_lens,
                               kc, vc, max_seqlen_k=_mk)

        donate = (7, 8) if donate_cache else ()
        shapes = (
            jax.ShapeDtypeStruct((b,), jnp.int32),       # tok
            jax.ShapeDtypeStruct((b,), jnp.int32),       # pos
            jax.ShapeDtypeStruct((b,), jnp.int32),       # slots
            jax.ShapeDtypeStruct((b, mb), jnp.int32),    # tbl
            jax.ShapeDtypeStruct((b,), jnp.int32),       # kv_lens
        )
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (params, kc, vc))
        ap, akc, avc = abstract
        lowered = jax.jit(fn, donate_argnums=donate).lower(
            ap, *shapes, akc, avc)
        out[bucket] = lowered.compile()
        if progress:
            progress(bucket)
    return out


def pick_bucket(buckets, batch: int, n_blocks: int):
    """Smallest bucket that fits (the scheduler pads up to it)."""
    fit = [bk for bk in buckets if bk[0] >= batch and bk[1] >= n_blocks]
    if not fit:
        raise ValueError(
            f"no precompiled bucket fits batch={batch}, blocks={n_blocks}; "
            f"available: {sorted(buckets)} — add the shape to "
            f"precompile_decode(buckets=...) (the reference raises the "
            f"same actionable error for missing kernel combos, "
            f"csrc/xpu/attn/xe_2/paged_decode_utils.hpp:41-100)")
    return min(fit, key=lambda bk: (bk[0], bk[1]))

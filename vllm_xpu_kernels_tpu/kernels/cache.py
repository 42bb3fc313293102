"""Pallas cache-write kernels.

The decode step's KV row scatter (32 rows x Hkv heads into the fused page
layout) costs ~25 us/layer as an XLA scatter — row-granular scatters
lower to sequential dynamic-update-slices.  This kernel does the write as
per-sequence 8-row page-window read-merge-writes with ALL window reads
issued up front (latency overlapped), the same page-window trick as the
decode kernel's fresh-KV writeback (kernels/flash_attention.py) but as a
standalone op so the surrounding XLA fusion landscape is untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import interpret_mode

_WIN = 8   # page-window rows: multiple of every dtype's sublane packing


def _scatter_kernel(spec, slots_ref, rows_ref, cache_in, cache_out,
                    wbuf, sem_r, sem_w):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = spec["b"]
    bs = spec["bs"]

    def win(sl):
        return cache_in.at[sl // bs, :, pl.ds(sl % bs // _WIN * _WIN, _WIN),
                           :]

    def win_out(sl):
        return cache_out.at[sl // bs, :,
                            pl.ds(sl % bs // _WIN * _WIN, _WIN), :]

    for i in range(b):
        @pl.when(slots_ref[i] >= 0)
        def _(i=i):
            pltpu.make_async_copy(
                win(slots_ref[i]), wbuf.at[i], sem_r.at[i]).start()

    for i in range(b):
        @pl.when(slots_ref[i] >= 0)
        def _(i=i):
            sl = slots_ref[i]
            pltpu.make_async_copy(
                win(sl), wbuf.at[i], sem_r.at[i]).wait()
            base = wbuf[i]
            if spec["f32_sel"]:
                from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
                    fp8_upcast_f32)

                up = (fp8_upcast_f32 if spec["fp8"]
                      else lambda x: x.astype(jnp.float32))
                sel = (jax.lax.broadcasted_iota(jnp.int32, (1, _WIN, 1), 1)
                       == sl % bs % _WIN)
                merged = jnp.where(sel, up(rows_ref[i]), up(base))
                wbuf[i] = merged.astype(wbuf.dtype)
            pltpu.make_async_copy(
                wbuf.at[i], win_out(sl), sem_w.at[i]).start()

    for i in range(b):
        @pl.when(slots_ref[i] >= 0)
        def _(i=i):
            sl = slots_ref[i]
            pltpu.make_async_copy(
                wbuf.at[i], win_out(sl), sem_w.at[i]).wait()


def scatter_fused_rows_pallas(kv_cache, kv_rows, slot_mapping):
    """Fused-layout cache row write [B, H, hs] at ``slot_mapping``
    (negative = skip) via page-window read-merge-write — a drop-in for
    the XLA row scatter (ops.cache.scatter_fused_rows) on decode-sized
    batches.  Returns the (input-output aliased) cache."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, h, bs, hs = kv_cache.shape
    b = kv_rows.shape[0]
    spec = dict(b=b, bs=bs, f32_sel=True,
                fp8=kv_cache.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, h, 1, hs), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((b, h, _WIN, hs), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((b,)),
            pltpu.SemaphoreType.DMA((b,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)],
        input_output_aliases={2: 0},
        interpret=interpret_mode(),
    )(slot_mapping.astype(jnp.int32),
      kv_rows.reshape(b, h, 1, hs).astype(kv_cache.dtype), kv_cache)[0]

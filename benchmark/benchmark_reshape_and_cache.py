"""Dedicated KV-cache scatter benchmark: both reference layouts plus the
TPU-native fused page layout, swept over token counts and cache dtypes.

Role of the reference's benchmark_reshape_and_cache.py and
benchmark_reshape_and_cache_flash.py (num_tokens swept 2^1..2^11,
/root/reference/benchmark/benchmark_reshape_and_cache_flash.py:112-116),
folded into one script because on TPU the layouts are variants of the
same row-scatter op (ops/cache.py):

- ``flash``  — ``[nb, bs, H, hs]`` (the reference's flash layout)
- ``tpu``    — ``[nb, H, bs, hs]`` (what the Pallas attention kernels eat)
- ``fused``  — ``[nb, H, bs, hs_k+hs_v]`` (one row-scatter for K and V —
  the serving default; CLAUDE.md round-2 findings)

Reported as GB/s vs HBM peak; bytes = read K,V + write K,V rows.

Usage: python benchmark/benchmark_reshape_and_cache.py
           [--quick] [--cpu] [--heads H] [--head-size S] [--block-size B]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-size", type=int, default=128)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="single token count per layout")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    print(f"# chip={detect_chip()} peak {p['hbm_gbps']} GB/s")
    h, hs, bs = args.heads, args.head_size, args.block_size
    token_counts = [1024] if args.quick else [2 ** e for e in (5, 8, 11)]
    rng = np.random.default_rng(0)

    for t in token_counts:
        nb = -(-t // bs) + 1
        key = jnp.asarray(rng.standard_normal((t, h, hs)) * 0.5,
                          jnp.bfloat16)
        slots = jnp.asarray(rng.permutation(nb * bs)[:t], jnp.int32)
        # loop-invariant operands (key, slots) ride as jit args via
        # consts= — closures become inline MLIR constants that round-trip
        # through the tunnel compiler (bench_op docstring)
        fb = lambda y, x, cs: y
        for cache_dtype in ("auto", "fp8_e5m2"):
            cdt = jnp.bfloat16 if cache_dtype == "auto" else jnp.float8_e5m2
            wr = 2 if cache_dtype == "auto" else 1
            nbytes = 2 * t * h * hs * (2 + wr)
            scale = jnp.asarray(0.5, jnp.float32)
            ks = None if cache_dtype == "auto" else scale
            cs = (key, slots)

            def step_flash(caches, cs, _d=cache_dtype, _ks=ks):
                kc, vc = caches
                k_, s_ = cs
                return ops.reshape_and_cache_flash(
                    k_, k_, kc, vc, s_, _d, _ks, _ks)

            kc = jnp.zeros((nb, bs, h, hs), cdt)
            sec = bench_op(step_flash, fb, (kc, kc), consts=cs)
            print(report_row(
                f"reshape_and_cache_flash T={t} {cache_dtype}", sec,
                bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))

            def step_tpu(caches, cs, _d=cache_dtype, _ks=ks):
                kc, vc = caches
                k_, s_ = cs
                return ops.reshape_and_cache_tpu(
                    k_, k_, kc, vc, s_, _d, _ks, _ks)

            kc = jnp.zeros((nb, h, bs, hs), cdt)
            sec = bench_op(step_tpu, fb, (kc, kc), consts=cs)
            print(report_row(
                f"reshape_and_cache_tpu   T={t} {cache_dtype}", sec,
                bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))

            def step_fused(cache, cs, _d=cache_dtype, _ks=ks):
                k_, s_ = cs
                return ops.reshape_and_cache_tpu_fused(
                    k_, k_, cache, s_, _d, _ks, _ks)

            kvc = jnp.zeros((nb, h, bs, 2 * hs), cdt)
            sec = bench_op(step_fused, fb, kvc, consts=cs)
            print(report_row(
                f"reshape_and_cache_fused T={t} {cache_dtype}", sec,
                bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

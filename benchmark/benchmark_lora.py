"""LoRA bgmv benchmarks: shrink / expand / expand_slice vs a single-LoRA
dense-matmul roofline comparator.

Covers the role of the reference script benchmark_lora.py (870-975:
torch.mm as the single-lora roofline).  All shapes are weight-bandwidth
bound at serving batch sizes, so GB/s vs HBM peak is the honest metric.

Usage: python benchmark/benchmark_lora.py [--tokens N] [--rank R]
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
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--num-loras", type=int, default=8)
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
    t, h, r, nl = args.tokens, args.hidden, args.rank, args.num_loras
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, h)) * 0.5, jnp.bfloat16)
    lora_a = jnp.asarray(rng.standard_normal((nl, r, h)) * 0.1,
                         jnp.bfloat16)
    lora_b = jnp.asarray(rng.standard_normal((nl, h, r)) * 0.1,
                         jnp.bfloat16)
    mapping = jnp.asarray(rng.integers(0, nl, t), jnp.int32)
    shrunk = jnp.asarray(rng.standard_normal((t, r)), jnp.float32)
    out = jnp.zeros((t, h), jnp.bfloat16)
    # honest traffic for the sort-free dense paths: activations stream
    # once + adapter stacks + outputs (the old t*r*h figure was the
    # GATHER tier's per-token weight copy — 100x the real movement)
    shrink_bytes = t * h * 2 + nl * r * h * 2 + t * r * 4
    expand_bytes = t * r * 4 + nl * r * h * 2 + t * h * (4 + 2 + 2)

    # feedback: fold a scalar of y into the carry (output ranks differ)
    fb = lambda y, x: (x * 0.999
                       + y.astype(jnp.float32).sum() * 1e-9).astype(x.dtype)
    sec = bench_op(
        lambda z: ops.bgmv_shrink(z, lora_a, mapping, 0.5), fb, x)
    print(report_row(f"bgmv_shrink (T={t}, L={nl}, r={r})", sec,
                     bytes_moved=shrink_bytes, peak_gbps=p["hbm_gbps"]))

    sec = bench_op(
        lambda z: ops.bgmv_expand(z.astype(jnp.float32), lora_b, out,
                                  mapping),
        lambda y, x: (x * 0.999 + y[:, :x.shape[1]].astype(jnp.float32)
                      * 1e-3).astype(x.dtype),
        shrunk.astype(jnp.bfloat16))
    print(report_row(f"bgmv_expand (T={t}, L={nl}, r={r})", sec,
                     bytes_moved=expand_bytes, peak_gbps=p["hbm_gbps"]))

    sec = bench_op(
        lambda z: ops.bgmv_expand_slice(
            z.astype(jnp.float32), lora_b[:, : h // 2], out, mapping,
            0, h // 2),
        lambda y, x: (x * 0.999 + y[:, :x.shape[1]].astype(jnp.float32)
                      * 1e-3).astype(x.dtype),
        shrunk.astype(jnp.bfloat16))
    print(report_row(f"bgmv_expand_slice (T={t}, slice={h//2})", sec,
                     bytes_moved=expand_bytes // 2,
                     peak_gbps=p["hbm_gbps"]))

    # single-LoRA dense comparator (reference's torch.mm roofline)
    a0 = lora_a[0]
    sec = bench_op(
        lambda z: jnp.dot(z, a0.T), fb, x)
    print(report_row("single-lora dense (jnp.dot roofline)", sec,
                     bytes_moved=r * h * 2 + t * (h + r) * 2,
                     peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

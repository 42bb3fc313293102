"""Quantized GEMM benchmark sweep (role of reference
benchmark/benchmark_gemm_onednn.py:516-626: latency / TFLOPS / GB/s /
% of roofline per recipe over model shapes).

Usage: python benchmark/benchmark_gemm.py [--model llama-3-8b] [--tp 1]
       [--m 32 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row
from weight_shapes import WEIGHT_SHAPES, tp_divide


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3-8b")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--m", type=int, nargs="+", default=[32, 256])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops
    from vllm_xpu_kernels_tpu.quantization import pack_int4_splitk

    p = preset()
    print(f"# chip={detect_chip()} peaks: {p['bf16_tflops']} TF bf16, "
          f"{p['hbm_gbps']} GB/s")
    shapes = tp_divide(WEIGHT_SHAPES[args.model], args.tp)
    rng = np.random.default_rng(0)

    for name, kn in shapes.items():
        if name == "num_experts":
            continue
        K, N = kn
        for M in args.m:
            a = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
            flops = 2 * M * K * N

            # bf16 dense (weights ride in the carry: closed-over
            # device arrays lower as inline MLIR constants — a full
            # host round-trip per compile over the tunnel)
            wb = jnp.asarray(rng.standard_normal((K, N)) * 0.02,
                             jnp.bfloat16)
            t = bench_op(
                lambda c: jnp.dot(
                    c[0], c[1], preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16),
                lambda y, c: ((y[:, :K] * 1e-3).astype(c[0].dtype), c[1]),
                (a, wb))
            print(report_row(f"{name} [{M}x{K}x{N}] bf16", t, flops,
                             2 * K * N, p["bf16_tflops"], p["hbm_gbps"]))

            # fp8 w8a16 per-channel
            wq = jnp.asarray(rng.standard_normal((K, N)) * 0.02,
                             jnp.float8_e4m3fn)
            s = jnp.ones((N,), jnp.float32)
            t = bench_op(
                lambda c: ops.fp8_gemm_w8a16(c[0], c[1], s),
                lambda y, c: ((y[:, :K] * 1e-3).astype(c[0].dtype), c[1]),
                (a, wq))
            print(report_row(f"{name} [{M}x{K}x{N}] fp8-w8a16", t, flops,
                             K * N, p["bf16_tflops"], p["hbm_gbps"]))

            # int4 w4a16 (g=128)
            if K % 128 == 0:
                w4 = rng.integers(0, 16, (K, N), dtype=np.uint8)
                pk = jnp.asarray(pack_int4_splitk(w4, 128))
                sg = jnp.ones((K // 128, N), jnp.float32)
                t = bench_op(
                    lambda c: ops.int4_gemm_w4a16(
                        c[0], c[1], None, sg, None, 128),
                    lambda y, c: ((y[:, :K] * 1e-3).astype(c[0].dtype),
                                  c[1]),
                    (a, pk))
                print(report_row(f"{name} [{M}x{K}x{N}] int4-w4a16", t,
                                 flops, K * N // 2, p["bf16_tflops"],
                                 p["hbm_gbps"]))


if __name__ == "__main__":
    main()

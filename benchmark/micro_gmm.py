"""Micro-benchmark: grouped_matmul_pallas variants in isolation.

Times ONE grouped GEMM call (mixtral w13 shapes by default) under the
differential fori_loop protocol, sweeping recipe / block sizes, to
attribute fused-MoE time.  Ad-hoc tool, not part of the benchmark suite.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from utils import bench_op


def main():
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.kernels import grouped_matmul as gmm

    rng = np.random.default_rng(0)
    e, d, n = 8, 4096, 28672
    nb = 8
    bm = 32
    r = nb * bm
    eb = jnp.arange(nb, dtype=jnp.int32) % e

    a = jnp.asarray(rng.standard_normal((r, d)) * 0.3, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-128, 128, (e, d // 2, n), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 128, (e, d, n), dtype=np.int8))
    s4 = jnp.full((e, d // 32, n), 0.25, jnp.float32)
    s8 = jnp.full((e, n), 4e-4, jnp.float32)
    a8 = jnp.asarray(rng.integers(-127, 128, (r, d), dtype=np.int8))

    variants = {
        "mxfp4": lambda c: gmm.grouped_matmul_pallas(
            c[0], c[1], eb, scales=s4, quant="mxfp4", group_size=32,
            block_m=bm),
        "int4": lambda c: gmm.grouped_matmul_pallas(
            c[0], c[1], eb, scales=s4, quant="int4", group_size=32,
            block_m=bm),
        "w8a8": lambda c: gmm.grouped_matmul_pallas(
            c[2], c[3], eb, scales=s8, quant="w8a8", block_m=bm),
    }
    which = sys.argv[1:] or list(variants)
    for name in which:
        step = variants[name]
        wb = (wq if name != "w8a8" else w8).size
        sb = (s4 if name != "w8a8" else s8).size * 4

        def fb(y, c):
            # fold the output back so the chained GEMMs are live
            da = (y[:, :d] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            a2 = (c[0] * jnp.bfloat16(0.999) + da).astype(jnp.bfloat16)
            a8_2 = c[2] ^ y[:, :d].astype(jnp.int32).astype(jnp.int8)
            return (a2, c[1], a8_2, c[3])

        t = bench_op(step, fb, (a, wq, a8, w8))
        print(f"{name:8s} {t*1e6:9.1f} us   weights {wb/t/1e9:6.1f} GB/s"
              f"   w+s {(wb+sb)/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()

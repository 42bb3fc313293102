"""Dedicated multimodal (M-RoPE) rotary-embedding benchmark.

Role of the reference's benchmark_multimodal_rotary_embedding.py, with
its per-model configs (/root/reference/benchmark/
benchmark_multimodal_rotary_embedding.py:23-60: Qwen2-VL-7B/72B-style
head 128 with mrope_section [16,24,24], Qwen3-VL-style [24,20,20], and a
head-64 small variant).  The op applies RoPE where the t/h/w position
axes each drive a disjoint slice of the rotary dims
(ops/rope.py multimodal_rotary_embedding).  Bandwidth-bound: read+write
q and k.

Usage: python benchmark/benchmark_mrope.py [--tokens N] [--quick] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row

# (name, head_size, mrope_section (embed-dim units), num_heads, num_kv)
CONFIGS = [
    ("qwen2vl-7b", 128, (16, 24, 24), 28, 4),
    ("qwen2vl-72b", 128, (16, 24, 24), 64, 8),
    ("qwen3vl", 128, (24, 20, 20), 32, 8),
    ("small-head64", 64, (8, 12, 12), 16, 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--quick", action="store_true")
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
    t = args.tokens
    rng = np.random.default_rng(0)
    configs = CONFIGS[:1] if args.quick else CONFIGS

    for name, hs, section, hq, hkv in configs:
        rot = 2 * sum(section)
        assert rot <= hs, (name, rot, hs)
        q = jnp.asarray(rng.standard_normal((t, hq * hs)) * 0.5,
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((t, hkv * hs)) * 0.5,
                        jnp.bfloat16)
        cos_sin = jnp.asarray(
            rng.standard_normal((16384, rot)) * 0.5, jnp.float32)
        pos3 = jnp.asarray(rng.integers(0, 16384, (3, t)), jnp.int32)

        def step(qk, cs, _hs=hs, _sec=section):
            qq, kk = qk
            _p, _cs = cs
            return ops.multimodal_rotary_embedding(
                _p, qq, kk, _hs, _cs, True, _sec)

        # feed both rotated outputs back into the carry so nothing is DCE'd
        def fb(y, x, cs):
            qo, ko = y
            return (qo * 0.999, ko * 0.999)

        nbytes = 2 * t * (hq + hkv) * hs * 2   # read+write q and k (bf16)
        # pos3/cos_sin are loop-invariant: ride as jit args (consts=), not
        # closures (inline MLIR constants round-trip through the tunnel)
        sec = bench_op(step, fb, (q, k), consts=(pos3, cos_sin))
        print(report_row(
            f"mrope {name} (H={hq}/{hkv} hs={hs} sec={section})", sec,
            bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

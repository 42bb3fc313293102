"""Elementwise-op benchmarks: RMS norm (+fused quant epilogues),
activations, RoPE family, KV-cache scatter.

Covers the roles of the reference scripts benchmark_rmsnorm.py,
benchmark_layernorm.py, benchmark_swigluoai_and_mul.py,
benchmark_swiglustep_and_mul.py, benchmark_multimodal_rotary_embedding.py,
benchmark_reshape_and_cache.py, benchmark_reshape_and_cache_flash.py —
all bandwidth-bound kernels reported as GB/s vs chip HBM peak.

Usage: python benchmark/benchmark_elementwise.py [--tokens N] [--hidden D]
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
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=4096)
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
    t, d = args.tokens, args.hidden
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((t, 2 * d)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.bfloat16)
    # feedback: fold a scalar of y into the carry (row shapes vary)
    fb = lambda y, x: (x * 0.999
                       + y.astype(jnp.float32).sum() * 1e-9).astype(x.dtype)

    # ---- norms (read x [+res], write y: 2-3 streams of t*d*2 bytes) ----
    rows = [
        ("rms_norm", lambda z: ops.rms_norm(z, w), x, 2 * t * d * 2),
        ("fused_add_rms_norm",
         lambda z: ops.fused_add_rms_norm(z, res, w)[0], x, 4 * t * d * 2),
        ("rms_norm_dynamic_per_token_quant(fp8)",
         lambda z: ops.rms_norm_dynamic_per_token_quant(z, w)[0].astype(
             jnp.bfloat16), x, t * d * 3),
        ("rms_norm_static_fp8_quant",
         lambda z: ops.rms_norm_static_fp8_quant(
             z, w, jnp.asarray(0.5, jnp.float32)).astype(jnp.bfloat16),
         x, t * d * 3),
    ]
    # ---- gated activations ([t, 2d] -> [t, d]: 3 streams) ----
    for name in ("silu_and_mul", "mul_and_silu", "gelu_and_mul",
                 "gelu_tanh_and_mul", "swigluoai_and_mul",
                 "swiglustep_and_mul"):
        fn = getattr(ops, name)
        rows.append((name, fn, x2, 3 * t * d * 2))

    # ---- RoPE ----
    heads, hs = d // 128, 128
    cos_sin = jnp.asarray(rng.standard_normal((16384, hs)) * 0.5,
                          jnp.float32)
    pos = jnp.asarray(rng.integers(0, 16384, t), jnp.int32)
    rows.append((
        "rotary_embedding(q+k)",
        lambda z: ops.rotary_embedding(pos, z, z, hs, cos_sin)[0],
        x, 4 * t * d * 2))
    pos3 = jnp.asarray(rng.integers(0, 16384, (3, t)), jnp.int32)
    rows.append((
        "multimodal_rotary_embedding",
        lambda z: ops.multimodal_rotary_embedding(
            pos3, z, z, hs, cos_sin, True, (24, 20, 20))[0],
        x, 4 * t * d * 2))

    for name, step, x0, nbytes in rows:
        sec = bench_op(step, fb, x0)
        print(report_row(name, sec, bytes_moved=nbytes,
                         peak_gbps=p["hbm_gbps"]))

    # ---- KV-cache scatter (own feedback: carry the cache) ----
    hkv, bs = 8, 128
    nb = -(-t // bs) + 1
    key = jnp.asarray(rng.standard_normal((t, hkv, hs)) * 0.5, jnp.bfloat16)
    kc = jnp.zeros((nb, bs, hkv, hs), jnp.bfloat16)
    slots = jnp.asarray(rng.permutation(nb * bs)[:t], jnp.int32)
    kv_bytes = 2 * 2 * t * hkv * hs * 2  # read k,v + write k,v slots

    def cache_step(caches):
        kc, vc = caches
        return ops.reshape_and_cache_flash(key, key, kc, vc, slots)

    sec = bench_op(cache_step, lambda y, x: y, (kc, kc))
    print(report_row(f"reshape_and_cache_flash (T={t})", sec,
                     bytes_moved=kv_bytes, peak_gbps=p["hbm_gbps"]))

    kc_t = jnp.zeros((nb, hkv, bs, hs), jnp.bfloat16)

    def cache_step_tpu(caches):
        kc, vc = caches
        return ops.reshape_and_cache_tpu(key, key, kc, vc, slots)

    sec = bench_op(cache_step_tpu, lambda y, x: y, (kc_t, kc_t))
    print(report_row(f"reshape_and_cache_tpu (T={t})", sec,
                     bytes_moved=kv_bytes, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

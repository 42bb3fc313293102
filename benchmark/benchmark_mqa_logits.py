"""DeepSeek-V3.2 sparse-indexer MQA-logits benchmark (varlen + paged).

Covers the role of the reference script benchmark_mqa_logits.py
(csrc/xpu/mqa_logits/xe_2/mqa_logits_xe2.cpp kernels).  The op is an
fp8 Q.K^T with per-head weights — compute-light, bandwidth-bound on the
KV stream.

Usage: python benchmark/benchmark_mqa_logits.py [--batch B] [--ctx N]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
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
    b, n, h, d = args.batch, args.ctx, args.heads, args.dim
    rng = np.random.default_rng(0)

    # ---- varlen (prefill indexer) ----
    tq = 512
    q = jnp.asarray(rng.standard_normal((tq, h, d)) * 0.3,
                    jnp.float8_e4m3fn)
    kv = jnp.asarray(rng.standard_normal((n, d)) * 0.3, jnp.float8_e4m3fn)
    kv_scales = jnp.ones((n,), jnp.float32)
    weights = jnp.asarray(rng.standard_normal((tq, h)) * 0.1, jnp.float32)
    ks = jnp.zeros((tq,), jnp.int32)
    ke = jnp.full((tq,), n, jnp.int32)

    def step(x):
        return ops.fp8_mqa_logits(x, kv, kv_scales, weights, ks, ke)

    def fb(y, x):
        upd = (x.astype(jnp.float32) * 0.999
               + y[:, :d].astype(jnp.float32)[:, None, :] * 1e-3)
        return upd.astype(x.dtype)
    sec = bench_op(step, fb, q)
    nbytes = tq * n * 4 + n * d + tq * h * d  # logits out + kv + q
    print(report_row(f"fp8_mqa_logits (Tq={tq}, Tkv={n})", sec,
                     bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))

    # ---- paged (decode indexer) ----
    bs = 256   # serving-recommended indexer page (fatter pages amortize
    # per-page DMA issue; see kernels/mqa_logits.py)
    nb = b * (-(-n // bs)) + 1
    packed = np.zeros((nb, bs, 1, d + 4), np.uint8)
    packed[..., :d] = rng.integers(0, 127, (nb, bs, 1, d))
    packed[..., d:] = np.frombuffer(
        np.full((nb * bs,), 1.0, np.float32).tobytes(),
        np.uint8).reshape(nb, bs, 1, 4)
    kv_cache = jnp.asarray(packed)
    qd = jnp.asarray(rng.standard_normal((b, 1, h, d)) * 0.3,
                     jnp.float8_e4m3fn)
    wts = jnp.asarray(rng.standard_normal((b, h)) * 0.1, jnp.float32)
    ctx_lens = jnp.full((b,), n, jnp.int32)
    tbl = jnp.asarray(
        np.arange(1, nb).reshape(b, -1), jnp.int32)

    def pstep(x):
        return ops.fp8_paged_mqa_logits(x, kv_cache, wts, ctx_lens, tbl, n)

    def pfb(y, x):
        upd = (x.astype(jnp.float32) * 0.999
               + y.reshape(b, 1, 1, -1)[..., :d].astype(jnp.float32)
               * 1e-3)
        return upd.astype(x.dtype)
    sec = bench_op(pstep, pfb, qd)
    nbytes = b * n * (d + 4)  # paged KV stream dominates
    print(report_row(
        f"fp8_paged_mqa_logits packed-parity (B={b}, ctx={n})", sec,
        bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))
    # NATIVE structured cache (the serving path: models/deepseek feeds
    # the (values, scales) pair that indexer_k_quant_and_cache maintains
    # — no per-call byte-unpack of the packed-parity layout, which costs
    # a full extra KV read+write+bitcast relayout per call and was the
    # difference between 37 and ~290 GB/s at 32k ctx on v5e)
    vals = jnp.asarray(
        rng.standard_normal((nb, bs, d)) * 0.3, jnp.float8_e4m3fn)
    scl = jnp.ones((nb, bs, 1), jnp.float32)

    def nstep(x):
        return ops.fp8_paged_mqa_logits(
            x, (vals, scl), wts, ctx_lens, tbl, n)

    sec = bench_op(nstep, pfb, qd)
    print(report_row(
        f"fp8_paged_mqa_logits native (B={b}, ctx={n})", sec,
        bytes_moved=nbytes, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

"""Sampler / routing benchmarks: MoE gating top-k, grouped top-k,
top-k/top-p sampling, per-row top-k.

Covers the roles of the reference scripts benchmark_topk.py,
benchmark_grouped_topk.py, benchmark_topk_topp.py (and the
top_k_per_row partner ops from csrc/topk_per_row.cpp).

Usage: python benchmark/benchmark_sampler.py [--tokens N] [--vocab V]
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
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--experts", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=128256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    print(f"# chip={detect_chip()} peak {p['hbm_gbps']} GB/s")
    t, e, v, b = args.tokens, args.experts, args.vocab, args.batch
    rng = np.random.default_rng(0)
    gates = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)
    fbg = lambda y, x: x * 0.999 + y[0].sum() * 1e-6

    rows = [
        ("topk_softmax (k=8)",
         lambda g: ops.topk_softmax(g, 8, renormalize=True), gates,
         t * e * 4),
        ("topk_sigmoid (k=8, bias)",
         lambda g: ops.topk_sigmoid(g, 8, renormalize=True, bias=bias),
         gates, t * e * 4),
        ("grouped_topk (k=8, 8 groups, 4 lim)",
         lambda g: ops.grouped_topk(
             g, 8, True, 8, 4, scoring_func="sigmoid",
             e_score_correction_bias=bias), gates, t * e * 4),
    ]
    for name, step, x0, nbytes in rows:
        sec = bench_op(step, fbg, x0)
        print(report_row(name, sec, bytes_moved=nbytes,
                         peak_gbps=p["hbm_gbps"]))

    # ---- vocab-size sampling ----
    logits = jnp.asarray(rng.standard_normal((b, v)), jnp.float32)
    key = jax.random.PRNGKey(0)
    ks = jnp.full((b,), 50, jnp.int32)
    ps = jnp.full((b,), 0.9, jnp.float32)

    def samp(lg):
        ids, lp = ops.topk_topp_sampler(lg, key, k=ks, p=ps)
        return ids

    fb = lambda y, x: x * 0.9999 + y[:, None].astype(jnp.float32) * 1e-9
    sec = bench_op(samp, fb, logits)
    print(report_row(f"topk_topp_sampler (B={b}, V={v})", sec,
                     bytes_moved=b * v * 4, peak_gbps=p["hbm_gbps"]))

    seq_lens = jnp.full((b,), 4096, jnp.int32)
    lg_rows = jnp.asarray(rng.standard_normal((b, 4096)), jnp.float32)

    def tkpr(lg):
        return ops.top_k_per_row_decode(lg, 1, seq_lens, 2048)

    fb2 = lambda y, x: x * 0.9999 + y.astype(jnp.float32).sum() * 1e-9
    sec = bench_op(tkpr, fb2, lg_rows)
    print(report_row(f"top_k_per_row_decode (B={b}, 4096->2048)", sec,
                     bytes_moved=b * 4096 * 4, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

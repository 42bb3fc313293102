"""GDN (gated delta net) attention benchmark — Qwen3-Next linear
attention at serving shapes.

Covers the role of the reference script benchmark_gdn_attn.py:438-442
(prefill/decode configs reported vs peak).  The chunked WY-transform
pipeline is matmul-bound at prefill, bandwidth-bound at decode.

Usage: python benchmark/benchmark_gdn.py [--mode prefill|decode]
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
    ap.add_argument("--mode", default="prefill",
                    choices=["prefill", "decode"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    print(f"# chip={detect_chip()} peak {p['bf16_tflops']} TFLOPS "
          f"/ {p['hbm_gbps']} GB/s")
    # Qwen3-Next-ish linear-attention head config (TP-sharded)
    nk, nv, hk, hv, w = 4, 8, 128, 128, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    b = args.batch
    sl = args.seq_len if args.mode == "prefill" else 1
    seq_lens = [sl] * b
    t_total = sum(seq_lens)
    rng = np.random.default_rng(0)

    qkvz = jnp.asarray(rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))) * 0.5, jnp.bfloat16)
    ba = jnp.asarray(rng.standard_normal((t_total, nk * 2 * rep)),
                     jnp.bfloat16)
    conv_state = jnp.asarray(
        rng.standard_normal((b + 1, w - 1, c)), jnp.float32)
    ssm_state = jnp.asarray(
        rng.standard_normal((b + 1, nv, hv, hk)) * 0.3, jnp.float32)
    conv_w = jnp.asarray(rng.standard_normal((c, w)) * 0.3, jnp.float32)
    conv_b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    A_log = jnp.asarray(rng.standard_normal(nv) * 0.3, jnp.float32)
    dt_bias = jnp.asarray(rng.standard_normal(nv) * 0.3, jnp.float32)
    qsl = jnp.asarray(
        np.concatenate([[0], np.cumsum(seq_lens)]), jnp.int32)
    sidx = jnp.arange(b, dtype=jnp.int32)
    has_init = jnp.ones((b,), bool)

    def step(carry):
        qkvz, cs, ss = carry
        out, z, cs2, ss2 = ops.gdn_attention(
            qkvz, ba, cs, ss, conv_w, conv_b, A_log, dt_bias,
            qsl, sidx, has_init,
            num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
            max_seqlen=sl)
        return out, cs2, ss2

    def fb(y, carry):
        out, cs2, ss2 = y
        qkvz0 = carry[0]
        mixed = (qkvz0.astype(jnp.float32) * 0.999).at[
            :, : nk * 2 * hk].add(
            out.reshape(t_total, -1)[:, : nk * 2 * hk].astype(jnp.float32)
            * 1e-3)
        return mixed.astype(qkvz0.dtype), cs2, ss2

    sec = bench_op(step, fb, (qkvz, conv_state, ssm_state))
    # chunked delta rule FLOPs ~ 6 * T * nv * hv * hk per chunk-matmul set
    flops = 10 * t_total * nv * hv * hk
    state_bytes = b * nv * hv * hk * 4 * 2
    io_bytes = t_total * (qkvz.shape[1] + ba.shape[1]) * 2 + state_bytes
    print(report_row(
        f"gdn_attention {args.mode} (B={b}, T={t_total})", sec,
        flops=flops if args.mode == "prefill" else 0,
        bytes_moved=io_bytes,
        peak_tflops=p["bf16_tflops"], peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

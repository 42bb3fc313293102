"""Flash attention benchmark (role of reference
benchmark/benchmark_cutlass_flash_attn_decode.py:272-360 and
benchmark_cutlass_flash_attn_varlen.py:324-329: decode configs 32x512,
32x4096, mixed 128..16384, reported vs peak bandwidth).

Usage: python benchmark/benchmark_flash_attn.py [--mode decode|prefill]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row

DECODE_CONFIGS = [
    ("32x512", [512] * 32),
    ("32x4096", [4096] * 32),
    ("8xmixed", [128, 256, 1024, 2048, 4096, 8192, 12288, 16384]),
    ("skewed", [16384] + [128] * 31),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="decode",
                    choices=["decode", "prefill", "mla-decode"])
    ap.add_argument("--heads", type=int, nargs=2, default=[32, 8])
    ap.add_argument("--head-size", type=int, default=128)
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    print(f"# chip={detect_chip()} peak {p['hbm_gbps']} GB/s")
    hq, hkv = args.heads
    d, bs = args.head_size, args.block_size
    rng = np.random.default_rng(0)

    if args.mode == "mla-decode":
        # DeepSeek-V3 absorbed-latent decode (reference MLA contract
        # "up to 576/512", chunk_prefill_kernel.hpp:70 +
        # test_mla_decode.py): ONE latent KV head, d_qk 576 / d_vo 512,
        # 128 q heads pre-divided by TP=8 -> 16 per chip.
        # bs 64 is the reference MLA test page; fatter pages amortize
        # per-page DMA issue on the fused path (--block-size to sweep)
        hq, hkv, dq, dv, bs_m = 16, 1, 576, 512, (bs or 64)
        B, kv = 32, 4096
        maxb = -(-kv // bs_m)
        nb = B * maxb + 1
        kc = jnp.asarray(rng.standard_normal((nb, bs_m, hkv, dq)) * 0.5,
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((nb, bs_m, hkv, dv)) * 0.5,
                         jnp.bfloat16)
        tbl = jnp.asarray(np.arange(1, B * maxb + 1).reshape(B, maxb),
                          jnp.int32)
        used = jnp.full((B,), kv, jnp.int32)
        cu = jnp.arange(B + 1, dtype=jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, hq, dq)) * 0.5,
                        jnp.bfloat16)

        def step(c):
            return ops.flash_attn_varlen_func(
                c[0], c[1], c[2], 1, cu, maxb * bs_m, seqused_k=used,
                block_table=tbl, causal=True, kv_layout="bshd")

        def fb(y, c):
            pad = jnp.pad(y, ((0, 0), (0, 0), (0, dq - dv)))
            return ((c[0] * 0.999 + pad * 1e-3).astype(c[0].dtype),
                    c[1], c[2])
        t = bench_op(step, fb, (q, kc, vc))
        kv_bytes = B * kv * hkv * (dq + dv) * 2
        print(report_row(f"mla-decode 576/512 split bshd (B={B}, kv={kv})",
                         t, bytes_moved=kv_bytes, peak_gbps=p["hbm_gbps"]))

        # padded fused pages [K(576) | V(512) | zeros] in 1152 lanes:
        # one DMA per page on the dma kernel's padded-q path
        wpad = 1152
        fused = np.zeros((nb, hkv, bs_m, wpad), np.float32)
        fused[..., :dq] = np.asarray(kc, np.float32).transpose(0, 2, 1, 3)
        fused[..., dq:dq + dv] = np.asarray(vc, np.float32).transpose(
            0, 2, 1, 3)
        fj = jnp.asarray(fused, jnp.bfloat16)

        def stepf(x, cs):
            return ops.flash_attn_varlen_func(
                x, cs, None, 1, cu, maxb * bs_m, seqused_k=used,
                block_table=tbl, causal=True, kv_layout="fused",
                v_head_dim=dv)

        def fbf(y, x, cs):
            pad = jnp.pad(y, ((0, 0), (0, 0), (0, dq - dv)))
            return (x * 0.999 + pad * 1e-3).astype(x.dtype)
        t = bench_op(stepf, fbf, q, consts=fj)
        print(report_row(
            f"mla-decode 576/512 fused pages (B={B}, kv={kv})", t,
            bytes_moved=kv_bytes, peak_gbps=p["hbm_gbps"]))
        return

    for name, kv_lens in DECODE_CONFIGS:
        B = len(kv_lens)
        maxb = max(-(-kv // bs) for kv in kv_lens)
        nb = sum(-(-kv // bs) for kv in kv_lens) + 1
        kc = jnp.asarray(rng.standard_normal((nb, hkv, bs, d)) * 0.5,
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((nb, hkv, bs, d)) * 0.5,
                         jnp.bfloat16)
        tbl = np.zeros((B, maxb), np.int32)
        nxt = 1
        for i, kv in enumerate(kv_lens):
            nblk = -(-kv // bs)
            tbl[i, :nblk] = np.arange(nxt, nxt + nblk)
            nxt += nblk
        tblj = jnp.asarray(tbl)
        used = jnp.asarray(kv_lens, jnp.int32)
        cu = jnp.arange(B + 1, dtype=jnp.int32)

        # caches ride in the carry: closed-over device arrays lower as
        # inline MLIR constants (a full host round-trip per compile)
        if args.mode == "decode":
            q = jnp.asarray(rng.standard_normal((B, hq, d)) * 0.5,
                            jnp.bfloat16)
            step = lambda c: ops.flash_attn_varlen_func(
                c[0], c[1], c[2], 1, cu, maxb * bs, seqused_k=used,
                block_table=tblj, causal=True, kv_layout="bhsd")
            fb = lambda y, c: ((c[0] * 0.999 + y * 1e-3).astype(
                c[0].dtype), c[1], c[2])
            t = bench_op(step, fb, (q, kc, vc))
            kv_bytes = sum(kv_lens) * hkv * d * 2 * 2
            print(report_row(f"decode {name} (B={B})", t,
                             bytes_moved=kv_bytes, peak_gbps=p["hbm_gbps"]))
        else:
            q_lens = [min(kv, 1024) for kv in kv_lens]
            tq = sum(q_lens)
            q = jnp.asarray(rng.standard_normal((tq, hq, d)) * 0.5,
                            jnp.bfloat16)
            cuq = jnp.asarray(
                np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32))
            step = lambda c: ops.flash_attn_varlen_func(
                c[0], c[1], c[2], max(q_lens), cuq, maxb * bs,
                seqused_k=used, block_table=tblj, causal=True,
                kv_layout="bhsd")
            fb = lambda y, c: ((c[0] * 0.999 + y * 1e-3).astype(
                c[0].dtype), c[1], c[2])
            t = bench_op(step, fb, (q, kc, vc))
            flops = sum(2 * 2 * ql * kv * hq * d
                        for ql, kv in zip(q_lens, kv_lens))
            print(report_row(f"prefill {name}", t, flops=flops,
                             peak_tflops=p["bf16_tflops"]))


if __name__ == "__main__":
    main()

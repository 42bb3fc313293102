"""End-to-end prefill / TTFT benchmark: Llama-3-8B FP8, batch of prompts
through prefill_step (time to first token = one full prefill + sampling).

Reports p50/p90 TTFT over repeated runs (BASELINE.json metric: "p50 TTFT").

Usage: python benchmark/benchmark_ttft.py [--batch 4] [--prompt-len 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--quant", default="fp8")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, init_kv_cache, prefill_step)
    from vllm_xpu_kernels_tpu.models.runtime import (
        BlockManager, build_prefill_batch)

    if args.small:
        cfg = LlamaConfig(
            hidden_size=512, num_layers=4, num_q_heads=8, num_kv_heads=4,
            head_dim=64, intermediate_size=1024, vocab_size=2048,
            max_position=2048, quant=args.quant, block_size=16)
        args.batch, args.prompt_len, args.iters = 2, 64, 3
    else:
        import os as _os

        # gu256: silu(g)*u fused into GEMM1's epilogue — the [T, 2I]
        # bf16 intermediate (~470 MB/layer at 4x1024) never lands in HBM
        gu = (_os.environ.get("VXK_GU256", "1") == "1"
              and args.quant in ("w8a8", "fp8-int8"))
        cfg = LlamaConfig(quant=args.quant, block_size=128,
                          max_position=16384, gu256=gu)

    bs = cfg.block_size
    blocks_per_seq = -(-args.prompt_len // bs)
    num_blocks = args.batch * blocks_per_seq + 1
    params = init_params(cfg, jax.random.PRNGKey(0))
    kc, vc = init_kv_cache(cfg, num_blocks)

    mgr = BlockManager(num_blocks, bs)
    prompts = {i: np.arange(args.prompt_len) % cfg.vocab_size
               for i in range(args.batch)}
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(mgr, prompts)
    max_q = -(-max_q // 8) * 8

    # serving prefill only samples each sequence's LAST row — slice
    # before the lm_head (logits_rows): the full-row int8 head GEMM is
    # ~4.3 TFLOP (~12 ms) of waste at 4x1024 (r5 trace finding)
    last_rows = jnp.asarray(np.asarray(cu_q[1:]) - 1, jnp.int32)
    step = jax.jit(
        lambda p, t, pos, cu, sl, tb, kvl, kc, vc, lr: prefill_step(
            cfg, p, t, pos, cu, sl, tb, kvl, kc, vc,
            max_seqlen_q=max_q, max_seqlen_k=max_k,
            fresh_prefill=True, logits_rows=lr)[0],
        donate_argnums=())
    argv = (params, jnp.asarray(token_ids), jnp.asarray(positions),
            jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
            jnp.asarray(kv_lens), kc, vc, last_rows)
    logits = step(*argv)
    tok = jnp.argmax(logits, axis=-1)
    _ = np.asarray(tok)   # full pipeline incl. first sampled token

    from utils import profile_trace

    times = []
    with profile_trace(args.trace):
        for _ in range(args.iters):
            t0 = time.perf_counter()
            logits = step(*argv)
            tok = jnp.argmax(logits, axis=-1)
            _ = np.asarray(tok)
            times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    p90 = times[min(len(times) - 1, int(len(times) * 0.9))]
    tokens = args.batch * args.prompt_len
    # prefill compute roofline: GEMM flops dominate
    e, l_, i = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    gemm_flops = 2 * tokens * l_ * (
        e * (hq + 2 * hkv) * d + hq * d * e + 3 * e * i)
    attn_flops = sum(2 * 2 * len(pr) ** 2 * hq * d // 2
                     for pr in prompts.values()) * l_
    tf = (gemm_flops + attn_flops) / p50 / 1e12
    print(f"# chip={detect_chip()} batch={args.batch} "
          f"prompt={args.prompt_len} quant={cfg.quant}")
    # w8a8 GEMMs run on the MXU's int8 mode (2x the bf16 rate)
    peak_key = "int8_tops" if cfg.quant == "w8a8" else "bf16_tflops"
    peak = preset()[peak_key]
    print(f"p50 TTFT: {p50*1e3:.1f} ms   p90: {p90*1e3:.1f} ms   "
          f"prefill: {tokens/p50:,.0f} tok/s  {tf:.1f} TFLOPS "
          f"({100*tf/peak:.1f}% of {peak_key.split('_')[0]} peak)")


if __name__ == "__main__":
    main()

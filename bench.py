"""End-to-end decode benchmark: Llama-3-8B 8-bit continuous decode on
one chip, paged KV cache.  Default recipe: w8a8 int8 (native MXU int8
matmul — the fastest 8-bit path on v5e; --quant fp8/int8 for the
weight-only recipes).

Prints ONE JSON line:
  {"metric": "llama3_8b_fp8_decode", "value": <tokens/s/chip>,
   "unit": "tok/s", "vs_baseline": <fraction of HBM roofline>}

Methodology mirrors the reference's roofline-relative reporting
(reference: benchmark/presets.py, benchmark_gemm_onednn.py:516-626 — no
absolute numbers are published, every kernel reports % of hardware peak).
Roofline for batched decode = weight bytes + KV bytes touched per step over
HBM bandwidth.

Scaled-down config via --small (CI / CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


HBM_GBPS = {
    # chip -> HBM bandwidth GB/s (public specs; v5e: 819 GB/s)
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 50.0,
}


def _chip_kind():
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k in ("v5e", "v5p", "v6e", "v4"):
        if k in kind.replace(" ", ""):
            return k
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    return "cpu" if d.platform == "cpu" else "v5e"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny config smoke run")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv-len", type=int, default=1024)
    # 128 steps in ONE device dispatch: the axon tunnel costs ~25-100 ms
    # of dispatch+readback per jit call (CLAUDE.md timing protocol) — at
    # 32 steps that fixed cost read as ~1.1 ms/step (6%) of fake decode
    # time.  A production server loops on-device for far longer; 128
    # amortizes the measurement artifact without hiding real per-step
    # work (every step still does the full weight+KV stream).
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--quant", default="w8a8",
                    choices=["fp8", "int8", "w8a8", "w4a8", "fp8-int8"])
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "e5m2", "e4m3"],
                    help="KV-cache dtype (fp8 halves KV bytes; e5m2 has "
                         "the fast native upcast path on v5e)")
    ap.add_argument("--block-size", type=int, default=None,
                    help="KV-cache page size in tokens (default: 128 for "
                         "bf16 KV, 256 for fp8 KV — fp8 decode is "
                         "upcast-bound, so fatter pages that halve DMA "
                         "issues win; bf16 is DMA-bound and pays the "
                         "fatter page's masked-tail padding bytes)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, init_kv_cache, decode_step)
    from vllm_xpu_kernels_tpu.models.runtime import (
        BlockManager, build_decode_batch)

    if args.small:
        cfg = LlamaConfig(
            hidden_size=512, num_layers=4, num_q_heads=8, num_kv_heads=4,
            head_dim=64, intermediate_size=1024, vocab_size=2048,
            max_position=2048, quant="fp8", block_size=16)
        args.batch, args.kv_len, args.steps = 4, 64, 3
    else:
        if args.block_size is None:
            args.block_size = 128 if args.kv_dtype == "bf16" else 256
        elif args.block_size <= 0:
            ap.error("--block-size must be a positive number of tokens")
        # gu256 (silu(g)*u fused into GEMM1's epilogue): prefill-optimal
        # (TTFT 283.4 -> 270.9 ms) and decode-neutral once the act quant
        # became ONE Pallas pass (1742.3 plain vs 1740.8 gu256 back to
        # back; the earlier -55 tok/s was the un-fused XLA act quant's 2
        # extra kernels/layer in a core-time-bound step) — default ON,
        # VXK_GU256=0 reverts
        gu = (os.environ.get("VXK_GU256", "1") == "1"
              and args.quant in ("w8a8", "fp8-int8"))
        cfg = LlamaConfig(quant=args.quant, block_size=args.block_size,
                          max_position=16384, gu256=gu)

    bs = cfg.block_size
    blocks_per_seq = -(-(args.kv_len + args.steps + 1) // bs)
    num_blocks = args.batch * blocks_per_seq + 1
    params = init_params(cfg, jax.random.PRNGKey(0))
    kv_dt = {"bf16": jnp.bfloat16, "e5m2": jnp.float8_e5m2,
             "e4m3": jnp.float8_e4m3fn}[args.kv_dtype]
    kc, vc = init_kv_cache(cfg, num_blocks, kv_dtype=kv_dt)
    kv_scale = (jnp.asarray(1.0, jnp.float32)
                if args.kv_dtype != "bf16" else None)

    # continuous-batching state: B sequences mid-generation
    mgr = BlockManager(num_blocks, bs)
    seq_ids = list(range(args.batch))
    for sid in seq_ids:
        mgr.allocate(sid, args.kv_len)
    max_blocks = blocks_per_seq
    max_k = max_blocks * bs

    # Pre-plan S steps of block-manager state on host (positions, slots,
    # kv_lens evolve deterministically), then run the whole generation loop
    # device-side under one jit: decode -> argmax -> next token.  One
    # dispatch for S steps amortizes host/tunnel overhead exactly like a
    # production on-device sampling loop.
    steps_plan = [build_decode_batch(mgr, seq_ids,
                                     np.zeros(args.batch, np.int64),
                                     max_blocks=max_blocks)
                  for _ in range(args.steps)]
    pos_s = jnp.asarray(np.stack([b.positions for b in steps_plan]))
    slot_s = jnp.asarray(np.stack([b.slot_mapping for b in steps_plan]))
    kvl_s = jnp.asarray(np.stack([b.kv_lens for b in steps_plan]))
    tbl = jnp.asarray(steps_plan[0].block_table)

    # head_mode="argmax" fuses the lm_head GEMM + greedy argmax in one
    # kernel — the [B, V] f32 logits (32 MB at 8B batch 32) never round-
    # trip HBM.  Measured +6 tok/s (1765.7 -> 1772.0, r5); default ON
    # for int8-head recipes, VXK_FUSED_ARGMAX=0 disables.
    fused_argmax = (os.environ.get("VXK_FUSED_ARGMAX", "1") == "1"
                    and cfg.quant in ("w8a8", "w4a8", "fp8-int8")
                    and not args.small)

    def multi_step(p, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc):
        def body(carry, xs):
            tok, kc, vc = carry
            pos, slots, kvl = xs
            out, kc, vc = decode_step(
                cfg, p, tok, pos, slots, tbl, kvl, kc, vc,
                max_seqlen_k=max_k, k_scale=kv_scale, v_scale=kv_scale,
                head_mode="argmax" if fused_argmax else "logits")
            nxt = (out if fused_argmax
                   else jnp.argmax(out, axis=-1).astype(jnp.int32))
            return (nxt, kc, vc), None
        (tok, kc, vc), _ = jax.lax.scan(
            body, (tok0, kc, vc), (pos_s, slot_s, kvl_s))
        return tok, kc, vc

    run = jax.jit(multi_step, donate_argnums=(6, 7))
    tok0 = jnp.zeros((args.batch,), jnp.int32)

    tok, kc, vc = run(params, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc)
    _ = np.asarray(tok)  # force full execution (compile + warmup)

    from benchmark.utils import profile_trace

    with profile_trace(args.trace):
        t0 = time.perf_counter()
        tok, kc, vc = run(params, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc)
        _ = np.asarray(tok)  # device->host readback flushes the tunnel
        dt = time.perf_counter() - t0
    tok_s = args.batch * args.steps / dt

    # ---- roofline --------------------------------------------------------
    e, l_, i = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    wbytes_layer = (e * (hq + 2 * hkv) * d + hq * d * e + 3 * e * i)
    wpb = {"fp8": 1, "int8": 1, "w8a8": 1, "w4a8": 0.5,
           "fp8-int8": 1}.get(cfg.quant, 2)
    wbytes = l_ * wbytes_layer * wpb
    # logits head: int8 when pre-quantized (lm_head_q), else bf16
    wbytes += cfg.vocab_size * e * (
        1 if cfg.quant in ("w8a8", "w4a8", "fp8-int8") else 2)
    kvb = 1 if args.kv_dtype != "bf16" else 2
    kv_bytes = (np.minimum(args.kv_len + args.steps, max_k) * kvb * hkv * d
                * 2 * l_ * args.batch)  # k+v, whole batch
    step_bytes = wbytes + kv_bytes
    bw = HBM_GBPS[_chip_kind()] * 1e9
    roofline_tok_s = args.batch / (step_bytes / bw)
    frac = tok_s / roofline_tok_s

    print(json.dumps({
        "metric": (f"llama3_8b_{args.quant}_decode"
                   + ("" if args.kv_dtype == "bf16"
                      else f"_kv{args.kv_dtype}") if not args.small
                   else "llama_small_fp8_decode"),
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()

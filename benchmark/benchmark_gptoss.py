"""End-to-end GPT-OSS-20B decode benchmark: MXFP4 experts (the released
checkpoint recipe — the only one that fits a 16 GB chip), bf16 attention
with sinks + alternating sliding windows, paged KV, continuous batching.

Same methodology as bench.py: pre-plan S block-manager steps on host,
run the whole generate loop device-side under one jit (decode -> argmax
-> feed back), read back one token vector, report tokens/s against the
HBM roofline (all-expert weight stream + attention weights + KV bytes).

CPU smoke: ``python benchmark/benchmark_gptoss.py --small --cpu``.

Memory note (16 GB v5e): the full 24-layer model's packed weights
(~12.2 GB with bf16 embed + UE8M0 byte scales) plus the step program's
~3.5 GB HLO temps exceed one chip's 15.75 GB — run ``--layers 16``
(measured 944.7 tok/s, 0.74 of the all-expert-stream roofline, round
4; 8 layers: 1521 tok/s).  A real 24-layer deployment shards the
experts (EP) or layers (PP) across chips — both engine tiers exist
(parallel/moe.py, parallel/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--kv-len", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = full 24)")
    ap.add_argument("--attn-quant", default="none",
                    choices=["none", "w8a8", "w4a8", "int8", "fp8"],
                    help="quantize attention projections + logits head")
    ap.add_argument("--quant", default="mxfp4",
                    choices=["mxfp4", "mxfp4-w8a8", "none"],
                    help="expert-stack recipe: mxfp4 (released ckpt), "
                         "mxfp4-w8a8 (int8 transcode riding the native "
                         "s8 grouped kernel — BASELINE.md r5), none")
    ap.add_argument("--trace", default=None, metavar="DIR")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models import gpt_oss as G
    from vllm_xpu_kernels_tpu.models.llama import init_kv_cache
    from vllm_xpu_kernels_tpu.models.runtime import (BlockManager,
                                                     build_decode_batch)

    if args.small:
        cfg = G.GptOssConfig(
            hidden_size=256, num_layers=4, num_q_heads=8, num_kv_heads=2,
            head_dim=64, intermediate_size=256, vocab_size=2048,
            num_experts=8, top_k=4, sliding_window=64, max_position=2048,
            block_size=16, quant=args.quant, attn_quant=args.attn_quant)
        args.batch, args.kv_len, args.steps = 4, 48, 3
    else:
        cfg = G.GptOssConfig(
            quant=args.quant,
            attn_quant=args.attn_quant,
            num_layers=args.layers or 24,
            max_position=16384,
        )

    bs = cfg.block_size
    blocks_per_seq = -(-(args.kv_len + args.steps + 1) // bs)
    num_blocks = args.batch * blocks_per_seq + 1
    params = G.init_params(cfg, jax.random.PRNGKey(0))
    kc, vc = init_kv_cache(cfg, num_blocks)

    mgr = BlockManager(num_blocks, bs)
    seq_ids = list(range(args.batch))
    for sid in seq_ids:
        mgr.allocate(sid, args.kv_len)
    max_blocks = blocks_per_seq
    max_k = max_blocks * bs

    plan = [build_decode_batch(mgr, seq_ids,
                               np.zeros(args.batch, np.int64),
                               max_blocks=max_blocks)
            for _ in range(args.steps)]
    pos_s = jnp.asarray(np.stack([b.positions for b in plan]))
    slot_s = jnp.asarray(np.stack([b.slot_mapping for b in plan]))
    kvl_s = jnp.asarray(np.stack([b.kv_lens for b in plan]))
    tbl = jnp.asarray(plan[0].block_table)

    def multi_step(p, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc):
        def body(carry, xs):
            tok, kc, vc = carry
            pos, slots, kvl = xs
            logits, kc, vc = G.decode_step(
                cfg, p, tok, pos, slots, tbl, kvl, kc, vc,
                max_seqlen_k=max_k)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, kc, vc), None

        (tok, kc, vc), _ = jax.lax.scan(
            body, (tok0, kc, vc), (pos_s, slot_s, kvl_s))
        return tok, kc, vc

    run = jax.jit(multi_step, donate_argnums=(6, 7))
    tok0 = jnp.zeros((args.batch,), jnp.int32)
    tok, kc, vc = run(params, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc)
    _ = np.asarray(tok)

    from utils import profile_trace

    with profile_trace(args.trace):
        t0 = time.perf_counter()
        tok, kc, vc = run(params, tok0, pos_s, slot_s, kvl_s, tbl, kc, vc)
        _ = np.asarray(tok)
        dt = time.perf_counter() - t0
    tok_s = args.batch * args.steps / dt

    # roofline: all-expert mxfp4 stream (codes 0.5 B/param + f32 scale
    # per 32) + bf16 attention/lm_head weights + bf16 KV bytes
    e, l_, i = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    exp_params = cfg.num_experts * (e * 2 * i + i * e)
    if cfg.quant == "mxfp4-w8a8":
        exp_bytes = exp_params          # int8 codes, tiny [E, N] scales
    elif cfg.quant == "none":
        exp_bytes = exp_params * 2
    else:
        exp_bytes = exp_params // 2 + exp_params // 32 * 4
    apb = {"fp8": 1, "int8": 1, "w8a8": 1, "w4a8": 0.5}.get(
        cfg.attn_quant, 2)
    attn_bytes = ((e * (hq + 2 * hkv) * d + hq * d * e) * apb
                  + e * cfg.num_experts * 2)
    head_b = 1 if cfg.attn_quant in ("w8a8", "w4a8") else 2
    wbytes = l_ * (exp_bytes + attn_bytes) + cfg.vocab_size * e * head_b
    kv_bytes = (np.minimum(args.kv_len + args.steps, max_k) * 2 * hkv * d
                * 2 * l_ * args.batch)
    # sliding layers touch at most window+page KV
    kv_bytes_local = (np.minimum(cfg.sliding_window + bs, max_k) * 2 * hkv
                      * d * 2 * args.batch)
    kv_bytes = kv_bytes // 2 + (l_ // 2) * kv_bytes_local
    step_bytes = wbytes + kv_bytes
    bw = preset()["hbm_gbps"] * 1e9
    roofline_tok_s = args.batch / (step_bytes / bw)
    frac = tok_s / roofline_tok_s

    print(json.dumps({
        "metric": ((f"gptoss20b_{cfg.quant}_decode" if not args.small
                    else f"gptoss_small_{cfg.quant}_decode")
                   + ("" if cfg.attn_quant == "none"
                      else f"_attn_{cfg.attn_quant}")),
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(frac, 4),
        "chip": detect_chip(),
    }))


if __name__ == "__main__":
    main()

"""Quantization perplexity-delta harness (north-star numerics metric:
"<= 0.1 perplexity delta at equal bit-width on Llama-3-8B").

Teacher-forced NLL of a token stream through ``prefill_step``, comparing a
quantized recipe against the bf16 model with the SAME weights: the quant
tree is derived from the bf16 tree by quantize->pack (the loader's
quantize-on-load path), so the delta isolates quantization error through
the full engine (fused norm/act quant epilogues, quant GEMMs, attention,
KV cache) rather than weight-init noise.

With ``--hf-dir`` it evaluates a real checkpoint (e.g. Llama-3-8B) on a
text token file; without one it uses a random-weight model and synthetic
token streams — still a faithful quant-error measurement (the logits
diverge only through quant noise), just not a language-modeling number.

Usage: python benchmark/benchmark_ppl.py [--quant w8a8] [--small]
       [--hf-dir PATH --tokens tokens.npy]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def nll_stream(cfg, params, tokens, seq_len, prefill_step, jnp, jax):
    """Mean teacher-forced negative log-likelihood (nats/token) of
    ``tokens`` split into ``seq_len`` windows, batched per prefill."""
    from vllm_xpu_kernels_tpu.models.runtime import (
        BlockManager, build_prefill_batch)

    n_seqs = len(tokens) // seq_len
    bs = cfg.block_size
    blocks_per_seq = -(-seq_len // bs)
    total_nll, total_tok = 0.0, 0

    @jax.jit
    def logprobs(p, t, pos, cu, sl, tb, kvl, kc, vc):
        logits = prefill_step(
            cfg, p, t, pos, cu, sl, tb, kvl, kc, vc,
            max_seqlen_q=-(-seq_len // 8) * 8,
            max_seqlen_k=blocks_per_seq * bs, fresh_prefill=True)[0]
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        # NLL of token[i+1] under logits[i]
        nxt = jnp.concatenate([t[1:], t[:1]])
        picked = jnp.take_along_axis(
            logits.astype(jnp.float32), nxt[:, None], axis=-1)[:, 0]
        return lse - picked                           # [T] per-token nll

    from vllm_xpu_kernels_tpu.models import init_kv_cache
    import jax.numpy as _jnp

    for si in range(n_seqs):
        seq = tokens[si * seq_len:(si + 1) * seq_len]
        mgr = BlockManager(blocks_per_seq + 1, bs)
        (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
         max_q, max_k) = build_prefill_batch(mgr, {0: seq})
        kc, vc = init_kv_cache(cfg, blocks_per_seq + 1)
        nll = np.asarray(logprobs(
            params, _jnp.asarray(token_ids), _jnp.asarray(positions),
            _jnp.asarray(cu_q), _jnp.asarray(slots), _jnp.asarray(tbl),
            _jnp.asarray(kv_lens), kc, vc), np.float32)
        total_nll += float(nll[: seq_len - 1].sum())  # last has no target
        total_tok += seq_len - 1
    return total_nll / total_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="w8a8",
                    choices=["fp8", "int8", "w8a8", "w4a8", "mxfp4", "fp8-int8"])
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--n-tokens", type=int, default=2048)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--layers", type=int, default=0,
                    help="truncate the model to N layers (a full-depth "
                         "bf16 8B reference exceeds one v5e's HBM; the "
                         "per-layer quant error compounds the same way)")
    ap.add_argument("--hf-dir", default=None,
                    help="HF checkpoint dir (safetensors); default: "
                         "random-weight model")
    ap.add_argument("--tokens", default=None,
                    help=".npy int token file to evaluate (with --hf-dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, prefill_step)
    from vllm_xpu_kernels_tpu.models.llama import quantize_params

    if args.hf_dir:
        from vllm_xpu_kernels_tpu.models.loader import (
            load_llama_params, read_hf_config)
        cfg = read_hf_config(args.hf_dir)
        if args.layers:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, num_layers=args.layers)
        params_bf16 = load_llama_params(cfg, args.hf_dir, quant="none")
    elif args.small:
        cfg = LlamaConfig(
            hidden_size=256, num_layers=2, num_q_heads=4, num_kv_heads=2,
            head_dim=64, intermediate_size=512, vocab_size=512,
            max_position=2048, quant="none", block_size=16)
        args.seq_len, args.n_tokens = 64, 256
        params_bf16 = init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg = LlamaConfig(quant="none", block_size=128, max_position=16384,
                          num_layers=args.layers or 32)
        params_bf16 = init_params(cfg, jax.random.PRNGKey(0))

    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int64)[: args.n_tokens]
    else:
        tokens = (np.random.default_rng(0)
                  .integers(0, cfg.vocab_size, args.n_tokens)
                  .astype(np.int64))

    nll_ref = nll_stream(cfg, params_bf16, tokens, args.seq_len,
                         prefill_step, jnp, jax)

    import dataclasses
    cfg_q = dataclasses.replace(cfg, quant=args.quant)
    params_q = quantize_params(cfg_q, params_bf16)
    nll_q = nll_stream(cfg_q, params_q, tokens, args.seq_len,
                       prefill_step, jnp, jax)

    out = {
        "metric": f"ppl_delta_{args.quant}",
        "ppl_bf16": float(np.exp(nll_ref)),
        "ppl_quant": float(np.exp(nll_q)),
        "value": float(np.exp(nll_q) - np.exp(nll_ref)),
        "unit": "ppl",
        "nll_bf16": nll_ref,
        "nll_quant": nll_q,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Environment-variable registry (reference: tools/envs.py + the scattered
runtime envs — VLLM_XPU_FUSED_MOE_USE_REF fused_moe_interface.py:18,
force-xe-default grouped_gemm_interface.cpp:22, XPU_KERNEL_TEST_SCOPE
tests/conftest.py:9-27, XPUMEM_DEBUG_LOG_METADATA mem_alloc.cpp:58-70).

One typed table; every env this engine reads is declared here."""

from __future__ import annotations

import os
from typing import Any, Callable

_REGISTRY: dict[str, tuple[Callable[[], Any], str]] = {}


def _register(name: str, caster, default, doc: str):
    def get():
        raw = os.environ.get(name)
        return default if raw is None else caster(raw)
    _REGISTRY[name] = (get, doc)
    return get


def _bool(v: str) -> bool:
    return v.lower() in ("1", "true", "yes", "on")


VXK_FORCE_REF = _register(
    "VXK_FORCE_REF", _bool, False,
    "Route every op to the pure-jnp reference implementation "
    "(analogue of VLLM_XPU_FUSED_MOE_USE_REF).")
VXK_FORCE_PALLAS = _register(
    "VXK_FORCE_PALLAS", _bool, False,
    "Force the Pallas kernel tier even off-TPU (interpret mode; the "
    "reference's simulator flow).")
VXK_TEST_SCOPE = _register(
    "VXK_TEST_SCOPE", str, "ci",
    "Test parametrization scope: full | ci | mini "
    "(reference: XPU_KERNEL_TEST_SCOPE, docs/test_scope_design.md).")
VXK_TEST_TPU = _register(
    "VXK_TEST_TPU", _bool, False,
    "Run the test suite against the real TPU instead of the virtual "
    "8-device CPU mesh.")
VXK_DECODE_PAGES_PER_STEP = _register(
    "VXK_DECODE_PAGES_PER_STEP", int, 0,
    "Override KV pages per decode-kernel grid step (0 = auto VMEM-capped; "
    "the tuning knob for kernels/flash_attention.paged_decode).")

VXK_DECODE_IMPL = _register(
    "VXK_DECODE_IMPL", str, "dma",
    "Paged-decode kernel variant: 'dma' (grid over sequences, "
    "kernel-managed multi-buffered page DMAs) or 'pipelined' (grid over "
    "(seq, page-group), BlockSpec-pipelined page operands).")
VXK_DECODE_DMA_DEPTH = _register(
    "VXK_DECODE_DMA_DEPTH", int, 4,
    "Prefetch depth (KV pages in flight) for the 'dma' decode kernel.")
VXK_DECODE_STAGE = _register(
    "VXK_DECODE_STAGE", int, 0,
    "Pages per staged online-softmax fold in the 'dma' decode kernel "
    "(0 = auto: per-page register folds).")
VXK_MXFP4_NATIVE = _register(
    "VXK_MXFP4_NATIVE", _bool, False,
    "mxfp4 grouped GEMM dequant via the chip's native e2m1 upcast "
    "(bitcast + astype, row-interleaved) instead of the halfword "
    "bit-assembly.  Default OFF: measured 31 GB/s on v5e (the Mosaic "
    "e2m1->bf16 cast is scalar-slow, like the e4m3 cast) vs ~200 GB/s "
    "for the bit-assembly — kept as an opt-in probe for future chips "
    "with native fp4 datapaths.")
VXK_MQA_IMPL = _register(
    "VXK_MQA_IMPL", str, "dma",
    "Paged MQA-logits kernel variant: 'dma' (grid over sequences, "
    "kernel-managed page copies + fat staged dots + async output "
    "chunks) or 'blockspec' (operand-pipelined pages — step-cost-bound "
    "at the indexer's ~8 KB pages: 16-24 GB/s vs the dma design).")
VXK_CACHE_WINDOW_SCATTER = _register(
    "VXK_CACHE_WINDOW_SCATTER", _bool, False,
    "Decode KV cache writes via the Pallas page-window read-merge-write "
    "kernel instead of the XLA row scatter.  Default OFF: measured "
    "SLOWER on v5e 8B decode (1714 -> 1586 tok/s — the per-sequence "
    "wait/merge/write chain costs more than XLA's 25 us scatter); kept "
    "as an opt-in probe for configs with pathological scatters.")
VXK_E4M3_PAIRS = _register(
    "VXK_E4M3_PAIRS", _bool, False,
    "w8a16 fp8 GEMM: upcast e4m3 weights as bf16 halfword PAIRS in i32 "
    "lanes (2 values/lane-op) instead of the one-per-lane f32 bit "
    "trick; tile sigma order folds into an activation column "
    "permutation.  Default OFF: measured SLOWER in situ on v5e 8B fp8 "
    "decode (921 -> 757 tok/s; ~790 with the permutation hacked out — "
    "the halfword interleave concat relayouts eat the lane-density "
    "win).  Exact and kept as an opt-in probe.")
VXK_ATTN_OUT_QUANT = _register(
    "VXK_ATTN_OUT_QUANT", _bool, False,
    "Fuse the o-projection's per-token int8 activation quant into the "
    "decode attention epilogue (int8 recipes without LoRA).  Default "
    "off: the in-kernel scalar amax reduce measured SLOWER than XLA's "
    "standalone fused quant pass on v5e (1651 vs 1714 tok/s, 8B w8a8).")

VXK_PREFILL_PAGES_PER_STEP = _register(
    "VXK_PREFILL_PAGES_PER_STEP", int, 0,
    "Override KV tiles per prefill-kernel grid step (0 = auto "
    "VMEM-capped; tuning knob for kernels/flash_attention.chunk_prefill "
    "— wider steps amortize the staged online-softmax update).")

VXK_DECODE_FRESH_KV = _register(
    "VXK_DECODE_FRESH_KV", _bool, False,
    "Decode attention consumes the current token's K/V as a direct "
    "input instead of reading it back from the cache; the kernel also "
    "writes the cache row itself (page-window writeback), removing the "
    "XLA scatter entirely.  STILL measured slower on v5e 8B w8a8 "
    "(1714 -> ~1550) across three designs — in-kernel per-seq fold, "
    "external batched LSE merge, and scatter-free writeback: the 0.8 ms "
    "scatter saving is eaten by defused elementwise chains and extra "
    "launches (traced r3).  Kept as an opt-in for configs where the "
    "scatter truly dominates (huge pages / tiny models).")

VXK_ATTN_EXP2 = _register(
    "VXK_ATTN_EXP2", _bool, True,
    "Run the attention online softmax in base 2 (fold log2e into the QK "
    "scale and use the VPU's native pow2 instead of exp).  Numerically "
    "equivalent; disable only for debugging.")

VXK_PREFILL_BLOCK_Q = _register(
    "VXK_PREFILL_BLOCK_Q", int, 0,
    "Override the prefill attention q-tile rows (0 = default 256).  "
    "Wider tiles amortize the staged online-softmax update further but "
    "shrink the per-step KV page budget under the same VMEM cap.")

VXK_E4M3_PLANES = _register(
    "VXK_E4M3_PLANES", _bool, False,
    "fp8 (e4m3) GEMM weights upcast via the INTERLEAVE-FREE halfword-"
    "plane assembly (kernels/quant_matmul.e4m3_planes_to_bf16): plane "
    "row order folds into an activation/weight row permutation instead "
    "of the in-lane re-interleave that made VXK_E4M3_PAIRS lose.")

VXK_EP_A2A_CF = _register(
    "VXK_EP_A2A_CF", float, 1.25,
    "Capacity factor for the EP all-to-all dispatch's default bucket "
    "size ceil(cf*K*T_local/ep_size) (parallel/moe.ep_fused_moe).  "
    "Raise for skewed routers (fewer drops, more ICI bytes); the "
    "dropped-slot count is returned via return_dropped=True.")

VXK_TP_OVERLAP = _register(
    "VXK_TP_OVERLAP", int, 0,
    "Chunk count for overlapped row-parallel TP matmuls in the model "
    "layer (models/llama._linear): >1 splits each reduce_out GEMM's N "
    "dimension into that many independent (GEMM -> psum) pairs on "
    "prefill-sized batches (>= 256 rows), giving XLA's latency-hiding "
    "scheduler chunk i's psum to fly under chunk i+1's GEMM "
    "(parallel/overlap.py; docs/overlap_design.md).  0/1 = off "
    "(default: XLA's all-reduce combiner re-merges sub-threshold "
    "chunks, so overlap pays only at prefill sizes on real ICI).")

VXK_GU256 = _register(
    "VXK_GU256", _bool, True,
    "Benchmark-harness switch for LlamaConfig(gu256=True): store wgu "
    "256-col gate/up-interleaved and fuse silu(g)*u into the GEMM1 "
    "epilogue (ops.int8_gemm_w8a8_silu_mul).  Prefill-optimal (TTFT "
    "283.4 -> 270.9 ms) and decode-neutral (1740.8 vs 1742.3 plain) "
    "once the act quant runs as one Pallas pass — BASELINE.md r5 races.")

VXK_FUSED_ARGMAX = _register(
    "VXK_FUSED_ARGMAX", _bool, True,
    "Greedy decode emits token ids from the fused int8 lm_head+argmax "
    "kernel (decode_step(head_mode='argmax')) instead of materializing "
    "[B, V] f32 logits.  +6 tok/s measured; 0 reverts to logits+argmax.")

VXK_DEBUG_LOG = _register(
    "VXK_DEBUG_LOG", _bool, False,
    "Verbose engine logging (analogue of XPUMEM_DEBUG_LOG_METADATA).")


def environment_variables() -> dict[str, str]:
    """name -> docstring for every registered env."""
    return {k: doc for k, (_, doc) in _REGISTRY.items()}


def get(name: str):
    return _REGISTRY[name][0]()

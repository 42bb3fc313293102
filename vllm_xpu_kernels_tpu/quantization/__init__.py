"""Weight-format conversion utilities (checkpoint layout -> TPU kernel
layout) — the role of the reference's
vllm_xpu_kernels/quantization/_quantize_convert.py (GPTQ/AWQ unpack /
shuffle / repack for the oneDNN weight-only GEMM layout).

Our kernels consume the engine's own "split-K" int4 packing (see
kernels/quant_matmul.py); these helpers convert the standard public
checkpoint formats into it.
"""

from vllm_xpu_kernels_tpu.quantization.repack import (  # noqa: F401
    pack_int4_splitk,
    unpack_int4_splitk_np,
    gptq_unpack_int32,
    gptq_unpack_zp,
    gptq_convert_idx,
    gptq_repack_for_tpu,
    awq_unpack_int32,
    awq_repack_for_tpu,
    pack_fp4_splitk,
)

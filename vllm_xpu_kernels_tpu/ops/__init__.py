"""Functional op layer — TPU-native equivalents of the reference's
torch.ops._C / ._moe_C / ._xpu_C / ._vllm_fa2_C surface.

Convention: the reference's in-place ops (``Tensor!``) become pure functions
returning outputs; callers at jit boundaries use donation for true in-place
buffers.  Op names and argument meanings match the reference schemas
(csrc/torch_bindings.cpp, csrc/moe/torch_bindings.cpp,
csrc/xpu/torch_bindings.cpp) one-for-one so a reference user can map calls
mechanically.
"""

from vllm_xpu_kernels_tpu.ops.activation import (  # noqa: F401
    silu_and_mul,
    mul_and_silu,
    gelu_and_mul,
    gelu_tanh_and_mul,
    fatrelu_and_mul,
    swigluoai_and_mul,
    swiglustep_and_mul,
    relu2_no_mul,
    gelu_fast,
    gelu_new,
    gelu_quick,
    silu_and_mul_quant,
    silu_and_mul_per_block_quant,
    silu_and_mul_per_token_quant,
    silu_and_mul_mxfp4_quant,
)
from vllm_xpu_kernels_tpu.ops.layernorm import (  # noqa: F401
    rms_norm,
    fused_add_rms_norm,
    rms_norm_static_fp8_quant,
    fused_add_rms_norm_static_fp8_quant,
    rms_norm_dynamic_per_token_quant,
    rms_norm_per_block_quant,
    rms_norm_mxfp4_quant,
)
from vllm_xpu_kernels_tpu.ops.rope import (  # noqa: F401
    rotary_embedding,
    fused_qk_norm_rope,
    deepseek_scaling_rope,
    multimodal_rotary_embedding,
    apply_rotary_emb,
)
from vllm_xpu_kernels_tpu.ops.cache import (  # noqa: F401
    reshape_and_cache,
    reshape_and_cache_flash,
    reshape_and_cache_tpu,
    reshape_and_cache_tpu_fused,
    reshape_and_cache_tpu_prefill,
    reshape_and_cache_tpu_prefill_fused,
    concat_and_cache_mla,
    gather_cache,
    gather_and_maybe_dequant_cache,
    swap_blocks,
    swap_blocks_batch,
    indexer_k_quant_and_cache,
    cp_gather_indexer_k_quant_cache,
)
from vllm_xpu_kernels_tpu.ops.attention import (  # noqa: F401
    flash_attn_varlen_func,
    merge_attn_states,
    build_decode_split_plan,
)
from vllm_xpu_kernels_tpu.ops.gemm import (  # noqa: F401
    fp8_gemm,
    fp8_gemm_w8a16,
    int8_gemm_w8a8,
    int8_gemm_w8a8_silu_mul,
    int4_gemm_w4a16,
    int4_gemm_w4a8,
    fp4_gemm,
)
from vllm_xpu_kernels_tpu.ops.moe import (  # noqa: F401
    topk_softmax,
    topk_sigmoid,
    grouped_topk,
    moe_align_block_size,
    batched_moe_align_block_size,
    moe_sum,
    init_expert_map,
    remap_hidden_states,
    fused_moe_prologue,
    moe_gather,
    grouped_gemm,
    tpu_fused_moe,
)
from vllm_xpu_kernels_tpu.ops.quant import (  # noqa: F401
    static_scaled_fp8_quant,
    dynamic_scaled_fp8_quant,
    dynamic_per_token_scaled_fp8_quant,
    dynamic_per_token_scaled_int8_quant,
    per_token_group_fp8_quant,
    per_token_group_quant_mxfp4,
    convert_fp8,
)
from vllm_xpu_kernels_tpu.ops.sampler import (  # noqa: F401
    apply_top_k_top_p,
    topk_topp_sampler,
    exponential_2d,
    top_k_per_row_prefill,
    top_k_per_row_decode,
)
from vllm_xpu_kernels_tpu.ops.lora import (  # noqa: F401
    bgmv_shrink,
    bgmv_expand,
    bgmv_expand_slice,
    moe_lora_align_block_size,
)
from vllm_xpu_kernels_tpu.ops.mqa_logits import (  # noqa: F401
    fp8_mqa_logits,
    fp8_paged_mqa_logits,
)
from vllm_xpu_kernels_tpu.ops.gdn import (  # noqa: F401
    gdn_attention,
)

"""Flagship model definitions for end-to-end serving benchmarks.

The reference is a kernel plugin — vLLM owns the models.  Per the north
star this engine goes further: model layers built entirely from the op
surface (norm → rope → quant GEMM → paged attention → cache write →
activation), TP-aware via shard_map.
"""

from vllm_xpu_kernels_tpu.models.llama import (  # noqa: F401
    LlamaConfig,
    init_params,
    init_kv_cache,
    decode_step,
    prefill_step,
)
from vllm_xpu_kernels_tpu.models import mixtral  # noqa: F401
from vllm_xpu_kernels_tpu.models import gpt_oss  # noqa: F401
from vllm_xpu_kernels_tpu.models import deepseek  # noqa: F401
from vllm_xpu_kernels_tpu.models import qwen3_next  # noqa: F401
from vllm_xpu_kernels_tpu.models import loader  # noqa: F401
from vllm_xpu_kernels_tpu.models import precompile  # noqa: F401
from vllm_xpu_kernels_tpu.models import spec_decode  # noqa: F401
from vllm_xpu_kernels_tpu.models import lora  # noqa: F401
from vllm_xpu_kernels_tpu.models import scheduler  # noqa: F401
from vllm_xpu_kernels_tpu.models.configs import (  # noqa: F401
    get_model_config,
    list_models,
)
from vllm_xpu_kernels_tpu.models.scheduler import (  # noqa: F401
    Request,
    Scheduler,
    serve,
)

"""Distributed layer: device meshes + TP/EP/DP/CP sharding over ICI.

The reference is a single-device kernel library — vLLM above it owns the
process groups and oneCCL collectives (SURVEY.md §2.17).  Here the
distribution story is first-class and TPU-native: a `jax.sharding.Mesh`
with named axes, `shard_map`-wrapped model steps that call the kernel ops
on per-device shards, and XLA collectives (`psum`, `all_gather`,
`ppermute`, `all_to_all`) riding ICI.
"""

from vllm_xpu_kernels_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_hybrid_mesh,
    initialize_multihost,
    host_local_replica_groups,
    AXIS_DP,
    AXIS_TP,
    AXIS_EP,
    AXIS_DCN,
    tp_psum,
    shard_leading,
    replicate,
)
from vllm_xpu_kernels_tpu.parallel.context import (  # noqa: F401
    cp_paged_decode,
    ring_attention,
)
from vllm_xpu_kernels_tpu.parallel.moe import (  # noqa: F401
    ep_fused_moe,
)
from vllm_xpu_kernels_tpu.parallel.overlap import (  # noqa: F401
    allgather_matmul_overlapped,
    row_parallel_matmul_overlapped,
)
from vllm_xpu_kernels_tpu.parallel.pipeline import (  # noqa: F401
    AXIS_PP,
    gpipe_apply,
    one_f_one_b_grads,
    stack_stage_params,
)

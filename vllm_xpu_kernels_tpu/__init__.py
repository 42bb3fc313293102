"""vllm_xpu_kernels_tpu — a TPU-native quantized-inference kernel engine.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
``vllm-xpu-kernels`` plugin library (reference: SYCL/CUTLASS/oneDNN kernels
for Intel XPUs, registered into the torch dispatcher; see
``/root/reference/csrc/torch_bindings.cpp`` for the op contract).

Architecture (TPU-first, NOT a port):

- **ops/**       functional op layer.  The reference's in-place torch ops
  (``Tensor!`` schema args) become pure functions returning new arrays;
  in-place behaviour is recovered via XLA buffer donation at jit boundaries.
- **kernels/**   Pallas TPU kernels (the "native" tier replacing
  SYCL/CUTLASS-TLA/oneDNN device code).  Every kernel has a pure-jnp
  reference twin used for fallback, interpret-mode testing and CPU runs.
- **registry.py** central op table — the analogue of the reference's
  torch-library registration (csrc/core/registration.h) plus its
  ``*_AVAILABLE`` flags and graceful fallback behaviour.
- **parallel/**  TP/EP/CP sharding over a `jax.sharding.Mesh` — the layer
  the reference delegates to vLLM+oneCCL, here built on XLA collectives.
- **models/**    flagship model definitions used for end-to-end benchmarks.
"""

from vllm_xpu_kernels_tpu.registry import (  # noqa: F401
    list_ops,
    get_op,
    OpImpl,
)
from vllm_xpu_kernels_tpu import ops  # noqa: F401

__version__ = "0.1.0"

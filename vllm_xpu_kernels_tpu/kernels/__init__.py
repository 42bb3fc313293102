"""Pallas TPU kernels — the "native" tier of the engine.

This package replaces the reference's three device-code stacks (plain SYCL
kernels, CUTLASS-SYCL "TLA" template kernels, and oneDNN primitives; see
SURVEY.md §1 L2) with Mosaic-compiled Pallas kernels.  Every kernel is
shape-specialized at trace time by XLA's jit cache — the TPU analogue of the
reference's build-time `.conf` kernel-variant codegen
(reference: csrc/xpu/attn/kernel_configs/*.conf).
"""

"""Central op registry — the TPU-native analogue of the reference's torch
dispatcher registration (reference: csrc/core/registration.h,
csrc/torch_bindings.cpp).

The reference registers each op into ``torch.ops._C/_moe_C/_xpu_C`` with a
device-keyed impl; consumers discover availability via import-time flags
(e.g. ``FA2_AVAILABLE``, vllm_xpu_kernels/flash_attn_interface.py:9-13) and
get a graceful pure-torch fallback when a kernel variant wasn't compiled
(flash_attn_interface.py:448-470).

Here each op has up to two impls:

- ``pallas``: the Pallas TPU kernel (compiled by Mosaic on TPU; runs in
  interpreter mode elsewhere when forced).
- ``ref``: a pure-jnp reference with identical semantics, used on CPU, for
  testing, and as the fallback for unsupported configs.

Selection: TPU platform -> pallas; otherwise ref; overridable with
``VXK_FORCE_REF=1`` (analogue of VLLM_XPU_FUSED_MOE_USE_REF,
fused_moe_interface.py:18) and ``VXK_FORCE_PALLAS=1`` (interpret mode off
TPU, the analogue of the reference's "mini scope on simulator" flow).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Any, Callable, Optional

logger = logging.getLogger("vllm_xpu_kernels_tpu")

_REGISTRY: dict[str, "OpImpl"] = {}


@dataclasses.dataclass
class OpImpl:
    name: str
    family: str
    fn: Callable[..., Any]                 # dispatching wrapper
    pallas_fn: Optional[Callable] = None
    ref_fn: Optional[Callable] = None
    doc: str = ""


def _platform() -> str:
    import jax

    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    # axon tunnels expose the TPU as its own platform name; treat anything
    # that is not cpu/gpu as a TPU-like accelerator.
    return _platform() not in ("cpu", "gpu", "cuda", "rocm")


def force_ref() -> bool:
    return os.environ.get("VXK_FORCE_REF", "0") == "1"


def force_pallas() -> bool:
    return os.environ.get("VXK_FORCE_PALLAS", "0") == "1"


def use_pallas() -> bool:
    """Impl selection for the current platform + env overrides."""
    if force_ref():
        return False
    if force_pallas():
        return True
    return on_tpu()


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (true fake backend —
    the role of the reference's "mini" simulator test scope,
    docs/test_scope_design.md)."""
    return not on_tpu()


def register_op(
    name: str,
    family: str,
    *,
    pallas_fn: Optional[Callable] = None,
    ref_fn: Optional[Callable] = None,
):
    """Register ``name`` and return a dispatching wrapper.

    Used as a decorator on the public op function; the decorated function is
    the *dispatcher* if it takes over, otherwise we synthesize one that picks
    pallas vs ref per-call.
    """

    def deco(fn: Callable) -> Callable:
        impl = OpImpl(
            name=name,
            family=family,
            fn=fn,
            pallas_fn=pallas_fn,
            ref_fn=ref_fn,
            doc=(fn.__doc__ or "").strip().split("\n")[0],
        )
        if name in _REGISTRY:
            raise ValueError(f"duplicate op registration: {name}")
        _REGISTRY[name] = impl
        return fn

    return deco


def get_op(name: str) -> OpImpl:
    return _REGISTRY[name]


def list_ops(family: Optional[str] = None) -> list[str]:
    if family is None:
        return sorted(_REGISTRY)
    return sorted(n for n, i in _REGISTRY.items() if i.family == family)


def dispatch(pallas_fn: Callable, ref_fn: Callable):
    """Return pallas_fn or ref_fn per current selection rules."""
    return pallas_fn if use_pallas() else ref_fn


def mosaic_safe_dtype(dtype):
    """Mosaic has no float16 type at all; Pallas paths run f16 ops in
    bf16 and cast back at the boundary."""
    import jax.numpy as jnp

    return jnp.bfloat16 if jnp.dtype(dtype) == jnp.float16 else dtype


def mosaic_safe(x):
    import jax.numpy as jnp

    if x is not None and hasattr(x, "dtype") and x.dtype == jnp.float16:
        return x.astype(jnp.bfloat16)
    return x

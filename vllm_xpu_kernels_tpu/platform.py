"""Hardware platform info + roofline presets.

The reference ships per-SKU roofline presets (benchmark/presets.py:5-21 —
Intel Arc B60: 98 TF bf16 / 456 GB/s; B70: 182 TF / 608 GB/s) and reports
every kernel as latency / TFLOPS / GB/s / % of those peaks, plus runtime
arch queries is_pvc/is_bmg (csrc/xpu/utils.cpp:5-23).  This module is the
TPU equivalent: per-generation peaks and a `device_kind()` query used for
kernel tuning tables.
"""

from __future__ import annotations

import dataclasses
import functools


@dataclasses.dataclass(frozen=True)
class Roofline:
    name: str
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float
    hbm_gib: float
    vmem_mib: float = 128.0
    ici_gbps_per_link: float = 0.0


# Public TPU spec sheet numbers (cloud.google.com/tpu docs).
ROOFLINES = {
    "v4": Roofline("v4", 275.0, 275.0, 1228.0, 32.0, ici_gbps_per_link=50.0),
    "v5e": Roofline("v5e", 197.0, 394.0, 819.0, 16.0, ici_gbps_per_link=50.0),
    "v5p": Roofline("v5p", 459.0, 918.0, 2765.0, 95.0, ici_gbps_per_link=100.0),
    "v6e": Roofline("v6e", 918.0, 1836.0, 1640.0, 32.0, ici_gbps_per_link=100.0),
    "cpu": Roofline("cpu", 1.0, 2.0, 50.0, 64.0),
}


@functools.lru_cache(maxsize=None)
def device_kind() -> str:
    import jax

    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover
        return "cpu"
    kind = getattr(d, "device_kind", "") or ""
    kind = kind.lower()
    for key in ("v6e", "v5p", "v5e", "v5 lite", "v4"):
        if key in kind:
            return "v5e" if key == "v5 lite" else key
    if d.platform == "cpu":
        return "cpu"
    return "v5e"  # conservative default for unknown TPU kinds


def roofline() -> Roofline:
    return ROOFLINES.get(device_kind(), ROOFLINES["v5e"])


# Runtime arch queries — the dispatch predicates kernels key tuning tables
# on (reference: is_pvc/is_bmg/is_bmg_g21/is_bmg_g31, csrc/xpu/utils.cpp:5-23).
def is_v4() -> bool:
    return device_kind() == "v4"


def is_v5e() -> bool:
    return device_kind() == "v5e"


def is_v5p() -> bool:
    return device_kind() == "v5p"


def is_v6e() -> bool:
    return device_kind() == "v6e"


def get_backend_version() -> str:
    """Runtime stack version string (reference: get_onednn_version,
    csrc/xpu/torch_bindings.cpp)."""
    import jax
    import jaxlib

    return f"jax={jax.__version__} jaxlib={jaxlib.__version__}"


def pct_of_peak_flops(tflops: float) -> float:
    return 100.0 * tflops / roofline().bf16_tflops


def pct_of_peak_bw(gbps: float) -> float:
    return 100.0 * gbps / roofline().hbm_gbps

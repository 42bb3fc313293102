# TPU hardware roofline presets — the reference reports every kernel as
# latency / TFLOPS / GB/s relative to these peaks (reference:
# benchmark/presets.py:5-21, B60: 98 TF bf16 / 456 GB/s, B70: 182 / 608).
# Values are public chip specs.

PRESETS = {
    "v5e": {"bf16_tflops": 197.0, "int8_tops": 394.0, "hbm_gbps": 819.0},
    "v5p": {"bf16_tflops": 459.0, "int8_tops": 918.0, "hbm_gbps": 2765.0},
    "v6e": {"bf16_tflops": 918.0, "int8_tops": 1836.0, "hbm_gbps": 1640.0},
    "v4": {"bf16_tflops": 275.0, "int8_tops": 275.0, "hbm_gbps": 1228.0},
    "cpu": {"bf16_tflops": 1.0, "int8_tops": 2.0, "hbm_gbps": 50.0},
}


def detect_chip():
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower().replace(" ", "")
    for k in ("v5e", "v5p", "v6e", "v4"):
        if k in kind:
            return k
    if "v5lite" in kind:
        return "v5e"
    return "cpu" if d.platform == "cpu" else "v5e"


def preset():
    return PRESETS[detect_chip()]

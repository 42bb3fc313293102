from vllm_xpu_kernels_tpu.utils.quant_math import (  # noqa: F401
    FP4_E2M1_MAX,
    FP8_E4M3_MAX,
    FP8_E5M2_MAX,
    fp8_max_value,
    min_scaling_factor,
    ue8m0_round,
    fp4_e2m1_encode,
    fp4_e2m1_decode,
    fp4_pack2,
    fp4_unpack2,
    quant_fp8,
)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

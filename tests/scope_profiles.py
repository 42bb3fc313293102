"""Per-model test-scope profiles — the reference's ondemand scope system
(reference: tests/test_scope_profiles.py, 790 LoC; design
docs/test_scope_design.md, scope resolution tests/conftest.py:9-80).

``VXK_TEST_SCOPE=ondemand:<profile>`` narrows parametrized values to ONE
model family's shapes: a kernel change aimed at DeepSeek MLA decode runs
the attention suite only at its head sizes, a GPT-OSS change only at
sink + sliding-window + mxfp4 configs, etc.  Profiles map *keys*
(declared at the parametrize site via ``scoped(..., key="...")``) to
replacement value lists; keys a profile doesn't name keep their ci-scope
values, so every profile still runs a coherent end-to-end suite.

Keys mirror the suite's parametrize axes:
- ``head_size``    attention head sizes ([64, 128, 256] in full scope)
- ``block_size``   KV page sizes
- ``window``       sliding-window configs (left, right)
- ``gemm_mnk``     dense GEMM (M, N, K) shapes
- ``quant``        model quant recipes exercised by loader/model tests
- ``ew_shapes``    elementwise (tokens, hidden) shapes (norm/act/quant)

Shape provenance: HF configs the reference's get_model_config pulls
(reference tests/utils.py:342-462), with the same TP pre-division.
"""

PROFILES = {
    # Llama-3-8B: d=128, 32/8 heads, 4096 hidden, 14336 intermediate
    "llama3": {
        "head_size": [128],
        "block_size": [16, 64],
        "window": [(-1, -1)],
        "gemm_mnk": [(1, 768, 512), (64, 768, 512), (33, 512, 896)],
        "quant": ["w8a8", "w4a8", "fp8"],
        "ew_shapes": [(7, 4096), (256, 4096)],
    },
    # Qwen2-7B: d=128, 28/4 heads, qkv bias
    "qwen2": {
        "head_size": [128],
        "quant": ["w8a8"],
        "ew_shapes": [(13, 3584)],
    },
    # Qwen3-Next: GDN layers + gated attention, d=256 full attention
    "qwen3next": {
        "head_size": [256],
        "quant": ["w8a8"],
        "ew_shapes": [(9, 2048)],
    },
    # DeepSeek V3/R1: MLA (qk 192/576, v 128/512) + sparse indexer.
    # 576 covers the absorbed-latent decode shape (reference
    # chunk_prefill_kernel.hpp:70 "up to 576/512"); the rectangular
    # 576/512 pairs are always-on in test_flash_attn.py::test_decode_mla
    # / test_prefill_mla_chunked.
    "deepseek": {
        "head_size": [64, 192, 576],
        "block_size": [16, 64],
        "quant": ["fp8", "w8a8"],
        "ew_shapes": [(17, 7168)],
    },
    # GPT-OSS: d=64, sinks + alternating sliding windows, mxfp4 MoE
    "gptoss": {
        "head_size": [64],
        "window": [(127, -1), (64, 64)],
        "quant": ["mxfp4"],
        "gemm_mnk": [(1, 768, 512), (64, 768, 512)],
        "ew_shapes": [(11, 2880)],
    },
    # Mixtral 8x7B: llama attention + 8-expert MoE
    "mixtral": {
        "head_size": [128],
        "quant": ["w8a8", "fp8"],
        "ew_shapes": [(5, 4096)],
    },
}


def profile_values(profile: str, key: str):
    """-> replacement values for ``key`` under ``profile``, or None
    (meaning: keep the ci-scope values).  Unknown profile names raise
    with the known list — the reference's actionable-error UX."""
    if profile not in PROFILES:
        raise KeyError(
            f"unknown test-scope profile '{profile}' "
            f"(known: {sorted(PROFILES)}); set "
            f"VXK_TEST_SCOPE=ondemand:<profile>")
    return PROFILES[profile].get(key)

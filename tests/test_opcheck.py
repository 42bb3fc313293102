"""Registry-wide op contract sweep — the role of the reference's
``opcheck()`` schema/consistency harness (reference tests/utils.py:22-80,
which runs torch's test_schema / test_faketensor on every op).

For EVERY op in the registry this asserts, on one canonical shape set:

  golden tier (VXK_FORCE_REF) == kernel tier (VXK_FORCE_PALLAS, Pallas
  interpret mode off-TPU)

and that newly registered ops cannot silently skip the sweep: an op with
no case here and no exemption fails ``test_every_op_has_case``.
Per-family suites keep the deep parametrization; this file guarantees
breadth."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.registry import _REGISTRY

RNG = np.random.default_rng(1234)


def r(shape, dtype=jnp.float32, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, dtype)


def rpos(shape, dtype=jnp.float32, scale=1.0):
    return jnp.asarray(np.abs(RNG.standard_normal(shape)) * scale + 0.01,
                       dtype)


def _rope_cache(max_pos=64, rot=32):
    inv = 1.0 / (10000.0 ** (np.arange(0, rot, 2) / rot))
    f = np.outer(np.arange(max_pos), inv)
    return jnp.asarray(np.concatenate([np.cos(f), np.sin(f)], -1),
                       jnp.float32)


# ---------------------------------------------------------------------------
# canonical case per op: name -> builder() -> (args, kwargs, tol)
# ---------------------------------------------------------------------------

T, E, H, HS, NB, BS = 16, 256, 4, 64, 8, 16
TOL = dict(rtol=2e-2, atol=2e-2)
EXACT = dict(rtol=0.0, atol=0.0)


def _gated_case(**kw):
    return lambda: ((r((T, 2 * E), jnp.bfloat16),), kw, TOL)


def _unary_case():
    return lambda: ((r((T, E), jnp.bfloat16),), {}, TOL)


def _slots(n=T, cap=NB * BS):
    s = RNG.permutation(cap)[:n].astype(np.int32)
    s[0] = -1   # padding slot must be skipped
    return jnp.asarray(s)


def _qkv_case():
    hq, hkv = 4, 2
    qkv = r((T, (hq + 2 * hkv) * HS), jnp.bfloat16)
    pos = jnp.asarray(RNG.integers(0, 64, (T,)), jnp.int32)
    return ((qkv, hq, hkv, hkv, HS, 1e-6, r((HS,), jnp.bfloat16, 0.1) + 1,
             r((HS,), jnp.bfloat16, 0.1) + 1, _rope_cache(rot=HS), True,
             pos), {}, TOL)


def _flash_case():
    q = r((3, 4, HS), jnp.bfloat16, 0.5)
    kc = r((NB, BS, 2, HS), jnp.bfloat16, 0.5)
    vc = r((NB, BS, 2, HS), jnp.bfloat16, 0.5)
    cu_q = jnp.asarray([0, 1, 2, 3], jnp.int32)
    used = jnp.asarray([31, 17, 5], jnp.int32)
    tbl = jnp.asarray(RNG.permutation(NB)[:6].reshape(3, 2), jnp.int32)
    return ((q, kc, vc, 1, cu_q, 2 * BS), dict(
        seqused_k=used, block_table=tbl, causal=True), TOL)


def _merge_case():
    o1, o2 = r((T, H, HS)), r((T, H, HS))
    l1, l2 = r((H, T)), r((H, T))
    return ((o1, l1, o2, l2), {}, TOL)


def _grouped_gemm_case():
    a = r((24, 32), jnp.bfloat16)
    b = r((4, 32, 48), jnp.bfloat16)
    rows = jnp.asarray([8, 0, 12, 4], jnp.int32)
    return ((a, b, rows), {}, TOL)


def _fused_moe_case():
    x = r((6, 32), jnp.bfloat16, 0.5)
    w13 = r((4, 32, 32), jnp.bfloat16, 0.5)
    w2 = r((4, 16, 32), jnp.bfloat16, 0.5)
    gates = jax.nn.softmax(r((6, 4)), axis=-1)
    tw, ti = jax.lax.top_k(gates, 2)
    return ((x, w13, w2, tw, ti.astype(jnp.int32)), {}, TOL)


def _gdn_case():
    nk, nv, hk, hv, w = 2, 4, 16, 32, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    L = 8
    qkvz = r((2 * L, nk * (2 * hk + 2 * rep * hv)), jnp.float32, 0.3)
    ba = r((2 * L, nk * 2 * rep), jnp.float32, 0.3)
    conv_state = r((4, w - 1, c), jnp.float32, 0.3)
    ssm_state = r((4, nv, hv, hk), jnp.float32, 0.3)
    conv_w = r((c, w), jnp.float32, 0.3)
    a_log = r((nv,), scale=0.3)
    dt_bias = r((nv,), scale=0.3)
    qsl = jnp.asarray([0, L, 2 * L], jnp.int32)
    sidx = jnp.asarray([0, 1], jnp.int32)
    his = jnp.asarray([True, False])
    return ((qkvz, ba, conv_state, ssm_state, conv_w, None, a_log, dt_bias,
             qsl, sidx, his),
            dict(num_k_heads=nk, num_v_heads=nv, head_k_dim=hk,
                 head_v_dim=hv, max_seqlen=L),
            dict(rtol=4e-2, atol=4e-2))


def _mqa_case():
    hq, d = 4, 32
    q = r((T, hq, d), jnp.float8_e4m3fn, 0.3)
    kv = r((24, d), jnp.float8_e4m3fn, 0.3)
    ks = rpos((24,))
    w = rpos((T, hq))
    cu_ks = jnp.asarray([0] * T, jnp.int32)
    cu_ke = jnp.asarray(np.linspace(4, 24, T).astype(np.int32))
    return ((q, kv, ks, w, cu_ks, cu_ke), {}, dict(rtol=5e-2, atol=5e-2))


def _paged_mqa_case():
    # packed byte cache layout per tests/test_lora_mqa.py (reference
    # kv_cache_cast_to_fp8): per page bs*d fp8-K bytes then bs f32 scales
    hq, d, B = 4, 64, 2
    q = jnp.asarray(RNG.standard_normal((B, 1, hq, d)), jnp.bfloat16)
    kvf = RNG.standard_normal((NB, BS, d)).astype(np.float32)
    amax = np.abs(kvf).max(-1, keepdims=True).clip(1e-4)
    sf = (amax / 448.0).astype(np.float32)
    kv_q = np.asarray(jnp.asarray(kvf / sf, jnp.float8_e4m3fn))
    packed = np.zeros((NB, BS * (d + 4)), np.uint8)
    packed[:, : BS * d] = kv_q.view(np.uint8).reshape(NB, BS * d)
    packed[:, BS * d:] = sf.reshape(NB, BS).view(np.uint8).reshape(
        NB, BS * 4)
    packed = packed.reshape(NB, BS, 1, d + 4)
    w = rpos((B * 1, hq))
    ctx = jnp.asarray([30, 17], jnp.int32)
    tbl = jnp.asarray(RNG.permutation(NB)[:B * 2].reshape(B, 2), jnp.int32)
    return ((q, jnp.asarray(packed), w, ctx, tbl, 2 * BS), {},
            dict(rtol=5e-2, atol=5e-2))


def _topk_per_row_prefill_case():
    logits = r((12, 96))
    starts = jnp.zeros((12,), jnp.int32)
    ends = jnp.asarray(np.linspace(8, 96, 12).astype(np.int32))
    return ((logits, starts, ends, 8), {}, EXACT)


CASES = {
    # --- activation -------------------------------------------------------
    "silu_and_mul": _gated_case(),
    "mul_and_silu": _gated_case(),
    "gelu_and_mul": _gated_case(),
    "gelu_tanh_and_mul": _gated_case(),
    "fatrelu_and_mul": _gated_case(threshold=0.1),
    "swigluoai_and_mul": _gated_case(),
    "swiglustep_and_mul": _gated_case(),
    "relu2_no_mul": _unary_case(),
    "gelu_fast": _unary_case(),
    "gelu_new": _unary_case(),
    "gelu_quick": _unary_case(),
    "silu_and_mul_quant": lambda: (
        (r((T, 2 * E), jnp.bfloat16), jnp.asarray(0.05, jnp.float32)),
        {}, TOL),
    "silu_and_mul_per_block_quant": lambda: (
        (r((T, 2 * E), jnp.bfloat16), 64), {}, TOL),
    "silu_and_mul_per_token_quant": lambda: (
        (r((T, 2 * E), jnp.bfloat16),), {}, TOL),
    "silu_and_mul_mxfp4_quant": lambda: (
        (r((T, 2 * E), jnp.bfloat16),), {}, TOL),
    # --- layernorm ---------------------------------------------------------
    "rms_norm": lambda: (
        (r((T, E), jnp.bfloat16), r((E,), jnp.bfloat16, 0.2) + 1), {}, TOL),
    "fused_add_rms_norm": lambda: (
        (r((T, E), jnp.bfloat16), r((T, E), jnp.bfloat16),
         r((E,), jnp.bfloat16, 0.2) + 1), {}, TOL),
    "rms_norm_static_fp8_quant": lambda: (
        (r((T, E), jnp.bfloat16), r((E,), jnp.bfloat16, 0.2) + 1,
         jnp.asarray(0.05, jnp.float32)), {}, TOL),
    "fused_add_rms_norm_static_fp8_quant": lambda: (
        (r((T, E), jnp.bfloat16), r((T, E), jnp.bfloat16),
         r((E,), jnp.bfloat16, 0.2) + 1, jnp.asarray(0.05, jnp.float32)),
        {}, TOL),
    "rms_norm_dynamic_per_token_quant": lambda: (
        (r((T, E), jnp.bfloat16), r((E,), jnp.bfloat16, 0.2) + 1),
        dict(quant_dtype=jnp.int8, residual=r((T, E), jnp.bfloat16)), TOL),
    "rms_norm_per_block_quant": lambda: (
        (r((T, E), jnp.bfloat16), r((E,), jnp.bfloat16, 0.2) + 1),
        dict(group_size=64), TOL),
    "rms_norm_mxfp4_quant": lambda: (
        (r((T, E), jnp.bfloat16), r((E,), jnp.bfloat16, 0.2) + 1), {}, TOL),
    # --- quant -------------------------------------------------------------
    "static_scaled_fp8_quant": lambda: (
        (r((T, E), jnp.bfloat16), jnp.asarray(0.05, jnp.float32)), {}, TOL),
    "dynamic_scaled_fp8_quant": lambda: ((r((T, E), jnp.bfloat16),), {}, TOL),
    "dynamic_per_token_scaled_fp8_quant": lambda: (
        (r((T, E), jnp.bfloat16),), {}, TOL),
    "dynamic_per_token_scaled_int8_quant": lambda: (
        (r((T, E), jnp.bfloat16),), {}, TOL),
    "per_token_group_fp8_quant": lambda: (
        (r((T, E), jnp.bfloat16), 64), {}, TOL),
    "per_token_group_quant_mxfp4": lambda: (
        (r((T, E), jnp.bfloat16),), {}, TOL),
    "convert_fp8": lambda: (
        (r((T, E), jnp.bfloat16),), dict(scale=0.1), TOL),
    # --- rope --------------------------------------------------------------
    "rotary_embedding": lambda: (
        (jnp.asarray(RNG.integers(0, 64, (T,)), jnp.int32),
         r((T, 4 * HS), jnp.bfloat16), r((T, 2 * HS), jnp.bfloat16), HS,
         _rope_cache(rot=HS)), {}, TOL),
    "fused_qk_norm_rope": _qkv_case,
    "deepseek_scaling_rope": lambda: (
        (jnp.asarray(RNG.integers(0, 64, (T,)), jnp.int32),
         r((T, 4, HS), jnp.bfloat16), r((T, 1, HS), jnp.bfloat16),
         _rope_cache(rot=HS), HS), {}, TOL),
    "multimodal_rotary_embedding": lambda: (
        (jnp.asarray(RNG.integers(0, 32, (3, T)), jnp.int32),
         r((T, 4 * HS), jnp.bfloat16), r((T, 2 * HS), jnp.bfloat16), HS,
         _rope_cache(rot=HS), True, (8, 12, 12)), {}, TOL),
    "apply_rotary_emb": lambda: (
        (r((T, 4, HS), jnp.bfloat16),
         jnp.asarray(RNG.standard_normal((T, HS // 2)), jnp.float32),
         jnp.asarray(RNG.standard_normal((T, HS // 2)), jnp.float32)),
        {}, TOL),
    # --- cache -------------------------------------------------------------
    "reshape_and_cache": lambda: (
        (r((T, H, HS)), r((T, H, HS)),
         jnp.zeros((NB, H, HS // 8, BS, 8)), jnp.zeros((NB, H, HS, BS)),
         _slots()), {}, TOL),
    "reshape_and_cache_flash": lambda: (
        (r((T, H, HS), jnp.bfloat16), r((T, H, HS), jnp.bfloat16),
         jnp.zeros((NB, BS, H, HS), jnp.bfloat16),
         jnp.zeros((NB, BS, H, HS), jnp.bfloat16), _slots()), {}, TOL),
    "reshape_and_cache_tpu": lambda: (
        (r((T, H, HS), jnp.bfloat16), r((T, H, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, HS), jnp.bfloat16), _slots()), {}, TOL),
    "reshape_and_cache_tpu_fused": lambda: (
        (r((T, H, HS), jnp.bfloat16), r((T, H, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, 2 * HS), jnp.bfloat16), _slots()), {}, TOL),
    "reshape_and_cache_tpu_prefill": lambda: (
        (r((20, H, HS), jnp.bfloat16), r((20, H, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, HS), jnp.bfloat16),
         jnp.asarray([[0, 1], [2, 3]], jnp.int32),
         jnp.asarray([0, 12, 20], jnp.int32), 12), {}, TOL),
    "reshape_and_cache_tpu_prefill_fused": lambda: (
        (r((20, H, HS), jnp.bfloat16), r((20, H, HS), jnp.bfloat16),
         jnp.zeros((NB, H, BS, 2 * HS), jnp.bfloat16),
         jnp.asarray([[0, 1], [2, 3]], jnp.int32),
         jnp.asarray([0, 12, 20], jnp.int32), 12), {}, TOL),
    "concat_and_cache_mla": lambda: (
        (r((T, 32), jnp.bfloat16), r((T, 16), jnp.bfloat16),
         jnp.zeros((NB, BS, 48), jnp.bfloat16), _slots()), {}, TOL),
    "gather_cache": lambda: (
        (r((NB, BS, 32)), jnp.asarray([[0, 2], [1, 3]], jnp.int32),
         jnp.asarray([0, 20, 29], jnp.int32), 29), {}, TOL),
    "gather_and_maybe_dequant_cache": lambda: (
        (r((NB, BS, 32), jnp.float8_e4m3fn, 5.0),
         jnp.asarray([[0, 2], [1, 3]], jnp.int32),
         jnp.asarray([0, 10, 25], jnp.int32),
         jnp.asarray([0] * 10 + [1] * 15, jnp.int32), 25, "fp8",
         jnp.asarray([0.02], jnp.float32)), {}, TOL),
    "indexer_k_quant_and_cache": lambda: (
        (r((T, 128), jnp.bfloat16),
         jnp.zeros((NB, BS, 128), jnp.float8_e4m3fn),
         jnp.zeros((NB, BS, 4), jnp.float32),
         jnp.asarray(RNG.permutation(NB * BS)[:T].astype(np.int32)), 32),
        {}, TOL),
    "cp_gather_indexer_k_quant_cache": lambda: (
        (r((NB, BS, 128), jnp.float8_e4m3fn, 5.0),
         rpos((NB, BS, 4)),
         jnp.asarray([[0, 2], [1, 3]], jnp.int32),
         jnp.asarray([0, 20, 29], jnp.int32), 29), {}, TOL),
    "swap_blocks": lambda: (
        (r((NB, BS, 8)), jnp.zeros((NB, BS, 8)),
         jnp.asarray([[0, 3], [2, 5]], jnp.int32)), {}, TOL),
    "swap_blocks_batch": lambda: (
        ([r((NB, BS, 8))], [jnp.zeros((NB, BS, 8))],
         [jnp.asarray([[0, 3]], jnp.int32)]), {}, TOL),
    # --- gemm --------------------------------------------------------------
    "fp8_gemm": lambda: (
        (r((8, 64), jnp.float8_e4m3fn, 8.0), r((64, 32), jnp.float8_e4m3fn,
                                               8.0)),
        dict(A_scale=jnp.asarray(0.03), B_scale=rpos((32,), scale=0.02),
             bias=r((32,))), dict(rtol=5e-2, atol=5e-2)),
    "fp8_gemm_w8a16": lambda: (
        (r((8, 64), jnp.bfloat16), r((64, 32), jnp.float8_e4m3fn, 8.0)),
        dict(B_scale=rpos((32,), scale=0.02)), dict(rtol=5e-2, atol=5e-2)),
    "int8_gemm_w8a8": lambda: (
        (jnp.asarray(RNG.integers(-127, 127, (8, 64)), jnp.int8),
         jnp.asarray(RNG.integers(-127, 127, (64, 32)), jnp.int8)),
        dict(A_scale=rpos((8,), scale=0.02), B_scale=rpos((32,), scale=0.02),
             bias=r((32,))), dict(rtol=5e-3, atol=5e-3)),
    "int8_gemm_w8a8_silu_mul": lambda: (
        (jnp.asarray(RNG.integers(-127, 127, (8, 64)), jnp.int8),
         jnp.asarray(RNG.integers(-127, 127, (64, 1024)), jnp.int8)),
        dict(A_scale=rpos((8,), scale=0.02),
             B_scale=rpos((1024,), scale=0.02),
             out_dtype=jnp.float32), dict(rtol=2e-2, atol=2e-2)),
    "int4_gemm_w4a16": lambda: (
        (r((8, 64), jnp.bfloat16),
         jnp.asarray(RNG.integers(0, 255, (32, 32)), jnp.uint8).astype(
             jnp.int8),
         r((32,)), rpos((2, 32), scale=0.05), None, 32),
        {}, dict(rtol=5e-2, atol=5e-2)),
    "int4_gemm_w4a8": lambda: (
        (jnp.asarray(RNG.integers(-127, 127, (8, 64)), jnp.int8),
         rpos((8,), scale=0.02), None,
         jnp.asarray(RNG.integers(0, 255, (32, 32)), jnp.uint8).astype(
             jnp.int8),
         rpos((2, 32), scale=0.05), None, 32),
        {}, dict(rtol=5e-2, atol=5e-2)),
    "fp4_gemm": lambda: (
        (jnp.asarray(RNG.integers(0, 255, (8, 32)), jnp.uint8),
         jnp.asarray(RNG.integers(0, 255, (32, 32)), jnp.uint8).astype(
             jnp.int8),
         jnp.exp2(jnp.asarray(RNG.integers(-3, 3, (8, 2)), jnp.float32)),
         jnp.exp2(jnp.asarray(RNG.integers(-3, 3, (2, 32)), jnp.float32))),
        {}, dict(rtol=5e-2, atol=5e-2)),
    # --- attention ----------------------------------------------------------
    "flash_attn_varlen_func": _flash_case,
    "merge_attn_states": _merge_case,
    # --- moe ----------------------------------------------------------------
    "topk_softmax": lambda: ((r((T, 8)), 2), dict(renormalize=True), TOL),
    "topk_sigmoid": lambda: ((r((T, 8)), 2), dict(renormalize=True), TOL),
    "grouped_topk": lambda: ((r((T, 16)), 4, True, 4, 2), {}, TOL),
    "moe_align_block_size": lambda: (
        (jnp.asarray(RNG.integers(0, 8, (T, 2)), jnp.int32), 8, 4), {},
        EXACT),
    "batched_moe_align_block_size": lambda: (
        (8, 4, jnp.asarray([3, 0, 5, 2], jnp.int32)), {}, EXACT),
    "moe_lora_align_block_size": lambda: (
        (jnp.asarray(RNG.integers(0, 8, (T, 2)), jnp.int32),
         jnp.asarray(RNG.integers(0, 2, (T,)), jnp.int32), 8, 2, 4), {},
        EXACT),
    "moe_sum": lambda: ((r((T, 2, E), jnp.bfloat16),), {}, TOL),
    "init_expert_map": lambda: ((4, 1, 3), {}, EXACT),
    "fused_moe_prologue": lambda: (
        (r((T, 32), jnp.bfloat16),
         jnp.asarray(RNG.integers(0, 8, (T, 2)), jnp.int32), 8), {}, TOL),
    "remap_hidden_states": lambda: (
        (r((T, 32), jnp.bfloat16),
         jnp.asarray(RNG.integers(0, 8, (T, 2)), jnp.int32), 8, 8), {}, TOL),
    "moe_gather": lambda: (
        (r((2 * T, 32), jnp.bfloat16), rpos((T, 2)),
         jnp.asarray(RNG.permutation(2 * T), jnp.int32), 8), {}, TOL),
    "grouped_gemm": _grouped_gemm_case,
    "tpu_fused_moe": _fused_moe_case,
    # --- sampler ------------------------------------------------------------
    "apply_top_k_top_p": lambda: (
        (r((4, 128), scale=3.0),), dict(
            k=jnp.asarray([5, 13, 128, 1], jnp.int32),
            p=jnp.asarray([0.9, 0.5, 1.0, 0.3], jnp.float32),
            window=128), TOL),
    "top_k_per_row_prefill": _topk_per_row_prefill_case,
    "top_k_per_row_decode": lambda: (
        (r((8, 96), scale=3.0), 2,
         jnp.asarray([40, 80, 96, 17], jnp.int32), 8), {}, EXACT),
    "topk_topp_sampler": lambda: (
        (r((4, 128), scale=3.0), jax.random.PRNGKey(7)), dict(
            k=jnp.asarray([5, 13, 128, 1], jnp.int32),
            p=jnp.asarray([0.9, 0.5, 1.0, 0.3], jnp.float32),
            seeds=jnp.asarray([1, 2, 3, 4], jnp.uint32), window=128), EXACT),
    "exponential_2d": lambda: (
        ((32, 64), jnp.asarray([3, 1], jnp.uint32)), dict(lambd=2.0), TOL),
    # --- lora ---------------------------------------------------------------
    "bgmv_shrink": lambda: (
        (r((T, E), jnp.bfloat16), r((3, 8, E), jnp.bfloat16, 0.1),
         jnp.asarray(RNG.integers(-1, 3, (T,)), jnp.int32), 0.5), {}, TOL),
    "bgmv_expand": lambda: (
        (r((T, 8), jnp.bfloat16), r((3, E, 8), jnp.bfloat16, 0.1),
         r((T, E), jnp.bfloat16),
         jnp.asarray(RNG.integers(-1, 3, (T,)), jnp.int32)), {}, TOL),
    "bgmv_expand_slice": lambda: (
        (r((T, 8), jnp.bfloat16), r((3, E // 2, 8), jnp.bfloat16, 0.1),
         r((T, E), jnp.bfloat16),
         jnp.asarray(RNG.integers(-1, 3, (T,)), jnp.int32), E // 2, E // 2),
        {}, TOL),
    # --- gdn / mqa ----------------------------------------------------------
    "gdn_attention": _gdn_case,
    "fp8_mqa_logits": _mqa_case,
    "fp8_paged_mqa_logits": _paged_mqa_case,
}

# Ops whose two tiers cannot be compared on a canonical case, with the
# reason (keep this list empty unless there is a true blocker).
EXEMPT: dict[str, str] = {}


def test_every_op_has_case():
    missing = sorted(set(_REGISTRY) - set(CASES) - set(EXEMPT))
    assert not missing, (
        f"registered ops with no opcheck case (add to tests/test_opcheck.py "
        f"CASES or EXEMPT with a reason): {missing}")
    stale = sorted((set(CASES) | set(EXEMPT)) - set(_REGISTRY))
    assert not stale, f"opcheck cases for unregistered ops: {stale}"


def _leaves(out):
    return [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")]


def _run_tier(name, tier, args, kwargs):
    prev = {k: os.environ.pop(k, None)
            for k in ("VXK_FORCE_REF", "VXK_FORCE_PALLAS")}
    os.environ["VXK_FORCE_REF" if tier == "ref" else "VXK_FORCE_PALLAS"] = "1"
    try:
        return _REGISTRY[name].fn(*args, **kwargs)
    finally:
        for k in ("VXK_FORCE_REF", "VXK_FORCE_PALLAS"):
            os.environ.pop(k, None)
            if prev.get(k) is not None:
                os.environ[k] = prev[k]


@pytest.mark.parametrize("name", sorted(CASES))
def test_tier_contract(name):
    args, kwargs, tol = CASES[name]()
    ref = _run_tier(name, "ref", args, kwargs)
    pal = _run_tier(name, "pallas", args, kwargs)
    rl, pl_ = _leaves(ref), _leaves(pal)
    assert len(rl) == len(pl_), (
        f"{name}: tier output trees differ ({len(rl)} vs {len(pl_)} leaves)")
    for i, (a, b) in enumerate(zip(rl, pl_)):
        assert a.shape == b.shape, (
            f"{name} leaf {i}: shape {a.shape} vs {b.shape}")
        assert a.dtype == b.dtype, (
            f"{name} leaf {i}: dtype {a.dtype} vs {b.dtype}")
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        np.testing.assert_allclose(
            af, bf, rtol=tol["rtol"], atol=tol["atol"],
            err_msg=f"{name} leaf {i} mismatch between tiers")

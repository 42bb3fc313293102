"""Quantized dense GEMM tests (mirrors reference tests/test_fp8_gemm_onednn.py,
test_int4_gemm_onednn.py, test_fp4_gemm_onednn.py goldens: dequantize-then-
matmul in float, recipe-dependent tolerances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.quantization import (
    gptq_repack_for_tpu,
    pack_int4_splitk,
    pack_fp4_splitk,
)
from vllm_xpu_kernels_tpu.utils import quant_math as qm

from tests.conftest import scoped
from tests.utils import assert_allclose, keys, rand

MNK = scoped(
    [(1, 128, 256), (8, 512, 512), (64, 256, 1024), (33, 384, 768)],
    ci=[(1, 128, 256), (64, 256, 1024), (33, 384, 768)],
    mini=[(8, 128, 256)],
    key="gemm_mnk",
)
OUT_DTYPES = [jnp.bfloat16, jnp.float16]


def _fp8_quant_np(x, scale):
    q = np.clip(x / scale, -qm.FP8_E4M3_MAX, qm.FP8_E4M3_MAX)
    return jnp.asarray(q, jnp.float8_e4m3fn)


@pytest.mark.parametrize("mnk", MNK)
@pytest.mark.parametrize("out_dtype", OUT_DTYPES)
def test_fp8_gemm_per_tensor(mnk, out_dtype):
    m, n, k = mnk
    k1, k2 = keys(0, 2)
    a = np.asarray(rand(k1, (m, k), jnp.float32, 0.1), np.float32)
    b = np.asarray(rand(k2, (n, k), jnp.float32, 0.1), np.float32).T
    sa, sb = 0.02, 0.03
    aq, bq = _fp8_quant_np(a, sa), _fp8_quant_np(b, sb)
    golden = (np.asarray(aq, np.float32) * sa) @ (np.asarray(bq, np.float32) * sb)
    out = ops.fp8_gemm(aq, bq, out_dtype, jnp.float32(sa), jnp.float32(sb))
    assert out.dtype == out_dtype
    assert_allclose(out, golden, rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("mnk", MNK)
def test_fp8_gemm_per_token_channel(mnk):
    m, n, k = mnk
    k1, k2 = keys(1, 2)
    a = np.asarray(rand(k1, (m, k), jnp.float32), np.float32)
    b = np.asarray(rand(k2, (k, n), jnp.float32), np.float32)
    sa = np.abs(a).max(1, keepdims=True) / qm.FP8_E4M3_MAX + 1e-8
    sb = np.abs(b).max(0, keepdims=True) / qm.FP8_E4M3_MAX + 1e-8
    aq, bq = _fp8_quant_np(a, sa), _fp8_quant_np(b, sb)
    golden = (np.asarray(aq, np.float32) * sa) @ (np.asarray(bq, np.float32) * sb)
    out = ops.fp8_gemm(
        aq, bq, jnp.bfloat16,
        jnp.asarray(sa[:, 0]), jnp.asarray(sb[0]))
    assert_allclose(out, golden, rtol=6e-2, atol=6e-2)


def test_fp8_gemm_batched():
    k1, k2 = keys(2, 2)
    a = np.asarray(rand(k1, (2, 5, 256), jnp.float32), np.float32)
    b = np.asarray(rand(k2, (256, 128), jnp.float32), np.float32)
    aq, bq = _fp8_quant_np(a, 0.02), _fp8_quant_np(b, 0.02)
    golden = np.einsum(
        "bmk,kn->bmn",
        np.asarray(aq, np.float32) * 0.02,
        np.asarray(bq, np.float32) * 0.02,
    )
    out = ops.fp8_gemm(aq, bq, jnp.float32, jnp.float32(0.02), jnp.float32(0.02))
    assert out.shape == (2, 5, 128)
    assert_allclose(out, golden, rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("mnk", scoped([(8, 256, 512), (32, 384, 1024)],
                                       ci=[(8, 256, 512)]))
@pytest.mark.parametrize("gk,gn", [(128, 128), (128, 256)])
def test_fp8_gemm_per_block(mnk, gk, gn, impl):
    """DeepSeek-style block-fp8: A per-token-group, B [K/gk, N/gn] blocks."""
    m, n, k = mnk
    gn = min(gn, n)
    if n % gn:
        gn = 128          # block grid must tile N exactly
    k1, k2, k3, k4 = keys(3, 4)
    aq = rand(k1, (m, k), jnp.float8_e4m3fn)
    bq = rand(k2, (k, n), jnp.float8_e4m3fn)
    sa = np.abs(np.asarray(rand(k3, (m, k // gk), jnp.float32))) + 0.5
    sb = np.abs(np.asarray(rand(k4, (k // gk, n // gn), jnp.float32))) + 0.5
    a_dq = np.asarray(aq, np.float32) * np.repeat(sa, gk, 1)
    b_dq = np.asarray(bq, np.float32) * np.repeat(np.repeat(sb, gk, 0), gn, 1)
    golden = a_dq @ b_dq
    out = ops.fp8_gemm(aq, bq, jnp.float32, jnp.asarray(sa), jnp.asarray(sb))
    assert_allclose(out, golden, rtol=2e-2, atol=2e-2 * np.abs(golden).max())


@pytest.mark.parametrize("mnk", MNK)
@pytest.mark.parametrize("scale_kind", ["tensor", "channel", "group"])
def test_fp8_gemm_w8a16(mnk, scale_kind, impl):
    m, n, k = mnk
    k1, k2 = keys(4, 2)
    a = rand(k1, (m, k), jnp.bfloat16, 0.3)
    bq = rand(k2, (k, n), jnp.float8_e4m3fn)
    if scale_kind == "tensor":
        sb = jnp.float32(0.05)
        b_dq = np.asarray(bq, np.float32) * 0.05
    elif scale_kind == "channel":
        sb = jnp.abs(rand(k2, (n,), jnp.float32)) + 0.01
        b_dq = np.asarray(bq, np.float32) * np.asarray(sb)[None, :]
    else:
        g = 128
        sb = jnp.abs(rand(k2, (k // g, n), jnp.float32)) + 0.01
        b_dq = np.asarray(bq, np.float32) * np.repeat(np.asarray(sb), g, 0)
    golden = np.asarray(a, np.float32) @ b_dq
    out = ops.fp8_gemm_w8a16(a, bq, sb)
    assert out.dtype == a.dtype
    assert_allclose(out, golden, rtol=5e-2, atol=5e-2 * max(1, np.abs(golden).max()))


@pytest.mark.parametrize("mnk", scoped([(8, 256, 512), (33, 512, 1024)],
                                       ci=[(8, 256, 512), (33, 512, 1024)]))
@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("act_order", [False, True])
def test_int4_gemm_w4a16(mnk, sym, act_order, impl):
    m, n, k = mnk
    g = 128
    rng = np.random.default_rng(42)
    w4 = rng.integers(0, 16, (k, n), dtype=np.uint8)
    scales = (rng.random((k // g, n), np.float32) + 0.1).astype(np.float32)
    zp = None if sym else rng.integers(0, 16, (k // g, n), dtype=np.uint8)
    # emulate a GPTQ checkpoint: pack K-major nibbles into int32 words
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    qweight = (
        (w4.reshape(k // 8, 8, n).astype(np.uint32) << shifts[None, :, None])
        .sum(1).astype(np.int32))
    qzeros = None
    if zp is not None:
        qzeros = (
            (zp.reshape(k // g, n // 8, 8).astype(np.uint32)
             << shifts[None, None, :]).sum(2).astype(np.int32))
    g_idx = None
    if act_order:
        g_idx = rng.permutation(np.repeat(np.arange(k // g), g)).astype(np.int32)
    packed, zp_codes, perm = gptq_repack_for_tpu(qweight, qzeros, g, g_idx)

    a = rand(keys(5, 1)[0], (m, k), jnp.float16, 0.3)
    zp_f = 8.0 if sym else zp.astype(np.float32)
    if act_order:
        w_rows = w4[perm].astype(np.float32)
        zp_rows = zp_f if sym else np.repeat(zp_f, g, 0)[np.arange(k)]
        w_dq = (w_rows - zp_rows) * np.repeat(scales, g, 0)
        golden = np.asarray(a, np.float32)[:, perm] @ w_dq
    else:
        w_dq = (w4.astype(np.float32)
                - (zp_f if sym else np.repeat(zp_f, g, 0))) * np.repeat(scales, g, 0)
        golden = np.asarray(a, np.float32) @ w_dq
    out = ops.int4_gemm_w4a16(
        a, jnp.asarray(packed), None, jnp.asarray(scales),
        None if sym else jnp.asarray(zp_codes), g,
        None if perm is None else jnp.asarray(perm))
    assert_allclose(out, golden, rtol=2e-2, atol=2e-2 * max(1, np.abs(golden).max()))


@pytest.mark.parametrize("sym", [True, False])
def test_int4_gemm_w4a8(sym, impl, m=16):
    n, k = 256, 512
    g = 128
    rng = np.random.default_rng(7)
    w4 = rng.integers(0, 16, (k, n), dtype=np.uint8)
    scales = (rng.random((k // g, n), np.float32) * 0.05 + 0.01)
    packed = pack_int4_splitk(w4, g)
    w_dq = (w4.astype(np.float32) - 8.0) * np.repeat(scales, g, 0)

    a = np.asarray(rand(keys(6, 1)[0], (m, k), jnp.float32), np.float32)
    # per-token int8 quant (asym uses uint8 range like the reference,
    # _quantize_convert.py dynamic_per_token_quant_ref)
    if sym:
        sa = np.abs(a).max(1, keepdims=True) / 127.0
        za = np.zeros((m, 1), np.int32)
        aq = np.clip(np.round(a / sa), -128, 127).astype(np.int8)
    else:
        lo, hi = a.min(1, keepdims=True), a.max(1, keepdims=True)
        sa = (hi - lo) / 255.0
        za = np.round(-lo / sa).astype(np.int32)
        aq = np.clip(np.round(a / sa + za), 0, 255).astype(np.uint8)
    a_dq = (aq.astype(np.float32) - za) * sa
    golden = a_dq @ w_dq
    out = ops.int4_gemm_w4a8(
        jnp.asarray(aq), jnp.asarray(sa[:, 0]),
        None if sym else jnp.asarray(za[:, 0]),
        jnp.asarray(packed), jnp.asarray(scales), None, g,
        out_dtype=jnp.float32)
    assert_allclose(out, golden, rtol=2e-2, atol=2e-2 * max(1, np.abs(golden).max()))


@pytest.mark.parametrize("mnk", scoped([(8, 128, 256), (32, 256, 512)],
                                       ci=[(8, 128, 256)]))
def test_fp4_gemm(mnk, impl):
    m, n, k = mnk
    g = 32
    k1, k2 = keys(7, 2)
    a = np.asarray(rand(k1, (m, k), jnp.float32), np.float32)
    b = np.asarray(rand(k2, (k, n), jnp.float32), np.float32)
    aq, sa = ops.per_token_group_quant_mxfp4(jnp.asarray(a), g)
    b_codes = np.asarray(qm.fp4_e2m1_encode(jnp.asarray(b.T)), np.uint8).T
    sb = np.ones((k // g, n), np.float32) * 0.5
    packed_b = pack_fp4_splitk(b_codes, g)
    from vllm_xpu_kernels_tpu.ops.quant import mxfp4_dequant

    a_dq = np.asarray(mxfp4_dequant(aq, sa, g), np.float32)
    b_dq = (np.asarray(qm.fp4_e2m1_decode(jnp.asarray(b_codes)), np.float32)
            * np.repeat(sb, g, 0))
    golden = a_dq @ b_dq
    out = ops.fp4_gemm(aq, jnp.asarray(packed_b), sa, jnp.asarray(sb),
                       jnp.float32)
    assert_allclose(out, golden, rtol=2e-2, atol=2e-2 * max(1, np.abs(golden).max()))


@pytest.mark.parametrize("mnk", MNK)
def test_int8_gemm_w8a8_exact(mnk, impl):
    """The native int8 MXU contraction is exact: s32 accumulation must
    equal numpy int math, and scaled output must match the float golden."""
    m, n, k = mnk
    rng = np.random.default_rng(42)
    a = rng.integers(-127, 128, (m, k), dtype=np.int8)
    b = rng.integers(-127, 128, (k, n), dtype=np.int8)
    sa = rng.random(m, dtype=np.float32) * 0.01 + 0.001
    sb = rng.random(n, dtype=np.float32) * 0.01 + 0.001
    bias = rng.standard_normal(n, dtype=np.float32)

    golden_i32 = a.astype(np.int64) @ b.astype(np.int64)
    out = ops.int8_gemm_w8a8(jnp.asarray(a), jnp.asarray(b),
                             out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), golden_i32.astype(np.float32))

    golden = golden_i32 * sa[:, None] * sb[None, :] + bias[None, :]
    out_s = ops.int8_gemm_w8a8(
        jnp.asarray(a), jnp.asarray(b), A_scale=jnp.asarray(sa),
        B_scale=jnp.asarray(sb), bias=jnp.asarray(bias),
        out_dtype=jnp.float32)
    assert_allclose(out_s, golden.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_int8_gemm_w8a8_batched(impl):
    rng = np.random.default_rng(3)
    a = rng.integers(-127, 128, (2, 5, 128), dtype=np.int8)
    b = rng.integers(-127, 128, (128, 256), dtype=np.int8)
    out = ops.int8_gemm_w8a8(jnp.asarray(a), jnp.asarray(b),
                             out_dtype=jnp.float32)
    golden = a.reshape(10, 128).astype(np.int64) @ b.astype(np.int64)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(10, 256), golden.astype(np.float32))


def test_dynamic_per_token_int8_quant_roundtrip():
    x = np.asarray(rand(keys(11, 1)[0], (16, 256), jnp.float32), np.float32)
    q, s = ops.dynamic_per_token_scaled_int8_quant(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (16,)
    deq = np.asarray(q, np.int32) * np.asarray(s)[:, None]
    assert_allclose(deq, x, rtol=2e-2, atol=np.abs(x).max() / 100)


def test_fp8_gemm_w8a16_large_m_routing(impl):
    """M >= 512 routes through dequant-once + XLA matmul; result matches
    the fused small-M kernel path bit-for-near (same e4m3 dequant)."""
    rng = np.random.default_rng(9)
    k1, = keys(21, 1)
    a_small = np.asarray(rand(k1, (8, 256), jnp.float32, 0.2), np.float32)
    a_big = np.tile(a_small, (80, 1))          # 640 rows
    b = _fp8_quant_np(
        rng.standard_normal((256, 384)).astype(np.float32) * 0.1, 0.02)
    s = np.full((384,), 0.02, np.float32)
    out_small = ops.fp8_gemm_w8a16(
        jnp.asarray(a_small, jnp.bfloat16), b, jnp.asarray(s))
    out_big = ops.fp8_gemm_w8a16(
        jnp.asarray(a_big, jnp.bfloat16), b, jnp.asarray(s))
    assert_allclose(np.asarray(out_big, np.float32)[:8],
                    np.asarray(out_small, np.float32),
                    rtol=1e-2, atol=1e-2)


def test_int4_gemm_w4a16_large_m_routing(impl):
    """M >= 512 dequant-once path matches the fused-kernel small-M path
    (asymmetric zero-points and group scales included)."""
    rng = np.random.default_rng(13)
    g = 32
    codes = rng.integers(0, 16, (128, 256), dtype=np.uint8)
    zp = rng.integers(4, 12, (128 // g, 256), dtype=np.uint8)
    s = (rng.random((128 // g, 256)).astype(np.float32) * 0.1 + 0.02)
    packed = jnp.asarray(pack_int4_splitk(codes, g))
    a_small = np.asarray(rand(keys(31, 1)[0], (8, 128), jnp.float32, 0.3),
                         np.float32)
    a_big = np.tile(a_small, (80, 1))
    out_s = ops.int4_gemm_w4a16(
        jnp.asarray(a_small, jnp.bfloat16), packed, None,
        jnp.asarray(s), jnp.asarray(zp), g)
    out_b = ops.int4_gemm_w4a16(
        jnp.asarray(a_big, jnp.bfloat16), packed, None,
        jnp.asarray(s), jnp.asarray(zp), g)
    assert_allclose(np.asarray(out_b, np.float32)[:8],
                    np.asarray(out_s, np.float32), rtol=2e-2, atol=2e-2)


def test_int4_gemm_w4a8_prefill_route(impl):
    """M >= 512 takes the dequant-once bf16-GEMM routing."""
    test_int4_gemm_w4a8(True, impl, m=512)


@pytest.mark.parametrize("mode", ["VXK_E4M3_PAIRS", "VXK_E4M3_PLANES"])
def test_fp8_w8a16_pair_decode_variants(mode, monkeypatch):
    """The opt-in e4m3 halfword-pair decode paths (interleaved sigma
    order and the interleave-free planes order) match the default
    bit-trick path bit-for-bit up to f32 dot accumulation order.  Both
    LOSE to the byte bit-trick in-GEMM on v5e (369 vs 318/138 GB/s —
    docs/quant_recipes.md ceiling table); kept as documented probes."""
    monkeypatch.setenv("VXK_FORCE_PALLAS", "1")
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((16, 256)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(np.clip(rng.standard_normal((256, 128)) * 8,
                            -448, 448), jnp.float8_e4m3fn)
    s = jnp.asarray(rng.random(128).astype(np.float32) * 0.1 + 0.01)
    base = np.asarray(ops.fp8_gemm_w8a16(a, w, s), np.float32)
    monkeypatch.setenv(mode, "1")
    got = np.asarray(ops.fp8_gemm_w8a16(a, w, s), np.float32)
    assert_allclose(got, base, rtol=1e-3,
                    atol=1e-3 * max(1.0, np.abs(base).max()))


def test_fp8_planes_preperm_matches():
    """b_preperm contract: weight rows pre-permuted at load by
    e4m3_planes_block_perm(K, bk) make the in-kernel planes decode emit
    natural K order with zero runtime reorder."""
    from vllm_xpu_kernels_tpu.kernels import quant_matmul as qmm

    rng = np.random.default_rng(12)
    M, K, N = 16, 1024, 128
    a = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(np.clip(rng.standard_normal((K, N)) * 8, -448, 448),
                    jnp.float8_e4m3fn)
    base = np.asarray(qmm.quant_matmul_pallas(
        a, w, a_kind="dense", b_kind="fp8", out_dtype=jnp.float32))
    bk = 512 if K % 512 == 0 else K
    inv = np.argsort(qmm.e4m3_planes_block_perm(K, bk))
    wp = w[jnp.asarray(inv)]
    got = np.asarray(qmm.quant_matmul_pallas(
        a, wp, a_kind="dense", b_kind="fp8", out_dtype=jnp.float32,
        b_preperm=True))
    assert_allclose(got, base, rtol=1e-3,
                    atol=1e-3 * max(1.0, np.abs(base).max()))


def test_int8_gemm_w8a8_silu_mul(impl):
    """Gated-act-epilogue GEMM over the gu256 layout == dequantized
    GEMM + silu_and_mul on the plain [gate | up] layout, both tiers;
    output columns come out in PLAIN order."""
    from vllm_xpu_kernels_tpu import ops
    from vllm_xpu_kernels_tpu.kernels.quant_matmul import gu256_perm

    rng = np.random.default_rng(17)
    M, K, inter = 24, 128, 512
    N = 2 * inter
    a = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, N)).astype(np.int8)
    a_s = (rng.random(M) * 0.02 + 0.005).astype(np.float32)
    b_s = (rng.random(N) * 0.02 + 0.005).astype(np.float32)
    # plain-layout golden
    f = (a.astype(np.float64) @ w.astype(np.float64)
         ) * a_s[:, None] * b_s[None, :]
    gate, up = f[:, :inter], f[:, inter:]
    golden = gate / (1 + np.exp(-gate)) * up
    perm = gu256_perm(inter)
    out = ops.int8_gemm_w8a8_silu_mul(
        jnp.asarray(a), jnp.asarray(w[:, perm]), jnp.asarray(a_s),
        jnp.asarray(b_s[perm]), out_dtype=jnp.float32)
    assert_allclose(out, golden.astype(np.float32), rtol=2e-2,
                    atol=2e-2 * max(1.0, np.abs(golden).max()))


def test_int8_lm_head_argmax(impl):
    """Fused lm_head+argmax == argmax of the scaled logits (ties to the
    lowest index), incl. a non-128-multiple vocab tail."""
    from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
        int8_lm_head_argmax_pallas)
    from vllm_xpu_kernels_tpu.registry import use_pallas

    if not use_pallas():
        return  # kernel-only helper (the op layer falls back itself)
    rng = np.random.default_rng(23)
    M, K, V = 12, 256, 777
    a = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, V)).astype(np.int8)
    b_s = (rng.random(V) * 0.02 + 0.005).astype(np.float32)
    ids = np.asarray(int8_lm_head_argmax_pallas(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(b_s), block_n=256))
    logits = (a.astype(np.int64) @ w.astype(np.int64)
              ).astype(np.float64) * b_s[None, :]
    np.testing.assert_array_equal(ids, logits.argmax(-1))

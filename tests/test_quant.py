"""Quant op tests (mirrors reference tests/test_fp8_quant.py and
tests/test_mxfp4_quant.py + tests/ops/mx_utils.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.ops.quant import mxfp4_dequant
from vllm_xpu_kernels_tpu.utils import quant_math as qm

from tests.conftest import scoped
from tests.utils import assert_allclose, keys, rand

FP8_MAX = 448.0
MIN_SF = 1.0 / (448.0 * 512.0)

SHAPES = scoped(
    [(1, 128), (17, 256), (83, 1024), (256, 4096)],
    ci=[(17, 256), (83, 1024)],
    mini=[(17, 256)],
)


@pytest.mark.parametrize("shape", SHAPES)
def test_static_scaled_fp8_quant_per_tensor(shape):
    (k,) = keys(0, 1)
    x = rand(k, shape, jnp.bfloat16, scale=3.0)
    scale = jnp.asarray(0.05, jnp.float32)
    q = ops.static_scaled_fp8_quant(x, scale)
    golden = np.clip(np.asarray(x, np.float32) / 0.05, -FP8_MAX, FP8_MAX)
    assert q.dtype == jnp.float8_e4m3fn
    assert_allclose(q, golden, rtol=0.08, atol=0.2)


def test_static_scaled_fp8_quant_grouped():
    (k,) = keys(1, 1)
    x = rand(k, (16, 256), jnp.float32, scale=3.0)
    # per-token via 1D scale + group_shape
    s_tok = jnp.linspace(0.01, 0.1, 16)
    q = ops.static_scaled_fp8_quant(x, s_tok, group_shape=(1, -1))
    golden = np.clip(
        np.asarray(x) / np.asarray(s_tok)[:, None], -FP8_MAX, FP8_MAX
    )
    assert_allclose(q, golden, rtol=0.08, atol=0.2)
    # 2D blocked scale
    s_blk = jnp.full((4, 2), 0.07, jnp.float32)
    q2 = ops.static_scaled_fp8_quant(x, s_blk)
    golden2 = np.clip(np.asarray(x) / 0.07, -FP8_MAX, FP8_MAX)
    assert_allclose(q2, golden2, rtol=0.08, atol=0.2)


@pytest.mark.parametrize("shape", SHAPES)
def test_dynamic_scaled_fp8_quant(shape):
    (k,) = keys(2, 1)
    x = rand(k, shape, jnp.bfloat16, scale=2.0)
    q, s = ops.dynamic_scaled_fp8_quant(x)
    xf = np.asarray(x, np.float32)
    s_golden = max(np.abs(xf).max() / FP8_MAX, MIN_SF)
    np.testing.assert_allclose(np.asarray(s)[0], s_golden, rtol=1e-6)
    assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s)[0], xf, rtol=0.08, atol=0.1
    )


@pytest.mark.parametrize("use_ub", [False, True])
def test_dynamic_per_token_scaled_fp8_quant(use_ub):
    (k,) = keys(3, 1)
    x = rand(k, (31, 512), jnp.float16, scale=2.0)
    ub = jnp.asarray([1.5], jnp.float32) if use_ub else None
    q, s = ops.dynamic_per_token_scaled_fp8_quant(x, scale_ub=ub)
    xf = np.asarray(x, np.float32)
    absmax = np.abs(xf).max(-1)
    if use_ub:
        absmax = np.minimum(absmax, 1.5)
    s_golden = np.maximum(absmax / FP8_MAX, MIN_SF)
    np.testing.assert_allclose(np.asarray(s), s_golden, rtol=1e-6)


@pytest.mark.parametrize("group_size", [64, 128])
@pytest.mark.parametrize("ue8m0", [False, True])
@pytest.mark.parametrize("col_major", [False, True])
def test_per_token_group_fp8_quant(group_size, ue8m0, col_major):
    (k,) = keys(4, 1)
    x = rand(k, (23, 512), jnp.bfloat16, scale=2.0)
    q, s = ops.per_token_group_fp8_quant(
        x, group_size, scale_ue8m0=ue8m0, column_major_scales=col_major
    )
    ng = 512 // group_size
    sn = np.asarray(s)
    if col_major:
        assert s.shape == (ng, 23)
        sn = sn.T
    else:
        assert s.shape == (23, ng)
    xf = np.asarray(x, np.float32).reshape(23, ng, group_size)
    absmax = np.maximum(np.abs(xf).max(-1), 1e-10)
    s_golden = np.maximum(absmax / FP8_MAX, MIN_SF)
    if ue8m0:
        s_golden = np.exp2(np.ceil(np.log2(np.maximum(s_golden, 1e-10))))
        np.testing.assert_array_equal(sn, 2.0 ** np.round(np.log2(sn)))
    np.testing.assert_allclose(sn, s_golden, rtol=1e-6)
    deq = np.asarray(q, np.float32).reshape(23, ng, group_size) * sn[..., None]
    assert_allclose(deq, xf, rtol=0.1, atol=0.1)


def test_mxfp4_quant_roundtrip():
    (k,) = keys(5, 1)
    x = rand(k, (16, 256), jnp.bfloat16, scale=2.0)
    q, s = ops.per_token_group_quant_mxfp4(x)
    assert q.shape == (16, 128) and q.dtype == jnp.uint8
    assert s.shape == (16, 8) and s.dtype == jnp.float32
    sn = np.asarray(s)
    # scale = 2^ceil(log2(absmax/6))
    xf = np.asarray(x, np.float32).reshape(16, 8, 32)
    absmax = np.maximum(np.abs(xf).max(-1), 1e-10)
    s_golden = np.exp2(np.ceil(np.log2(np.maximum(absmax / 6.0, 1e-10))))
    np.testing.assert_allclose(sn, s_golden, rtol=1e-6)
    deq = np.asarray(mxfp4_dequant(q, s), np.float32)
    # worst-case e2m1 abs error within a group is scale (gap 2.0 at top)
    err = np.abs(deq - xf.reshape(16, 256))
    bound = np.repeat(sn, 32, axis=1) * 1.0 + 1e-6
    assert np.all(err <= bound)


def test_fp4_e2m1_encode_exact():
    # all 16 codes round-trip exactly
    vals = np.array(
        [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
        np.float32,
    )
    codes = qm.fp4_e2m1_encode(jnp.asarray(vals))
    dec = np.asarray(qm.fp4_e2m1_decode(codes))
    np.testing.assert_array_equal(dec, vals)
    # midpoints round toward smaller magnitude (strict > thresholds,
    # mxfp4_quant.h:17-28)
    mids = jnp.asarray([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0])
    dec_m = np.asarray(qm.fp4_e2m1_decode(qm.fp4_e2m1_encode(mids)))
    np.testing.assert_array_equal(dec_m, [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0])


def test_convert_fp8_roundtrip():
    (k,) = keys(6, 1)
    x = rand(k, (8, 128), jnp.float32)
    q = ops.convert_fp8(x, scale=0.1)
    back = ops.convert_fp8(q, scale=0.1)
    assert_allclose(back, x, rtol=0.1, atol=0.05)


@pytest.mark.parametrize("shape", [(3, 64), (1, 128), (9, 384), (40, 131)])
def test_dynamic_per_token_int8_quant_edges(shape, impl):
    """Per-token int8 quant at edge shapes: the Pallas single-pass tier
    (round 5 — amax+quantize in one kernel, the decode-launch-count fix)
    must agree with the jnp math, including the non-128-multiple-column
    fallback and single-row inputs."""
    rng = np.random.default_rng(31)
    x = rng.standard_normal(shape).astype(np.float32) * 3
    q, s = ops.dynamic_per_token_scaled_int8_quant(
        jnp.asarray(x, jnp.bfloat16))
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    absmax = np.abs(xb).max(-1)
    s_ref = np.maximum(absmax / 127.0, 1e-10)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-6)
    # match the op's reciprocal-multiply (x * (1/s)) in f32; the chip's
    # mult/round can still differ from numpy by one ULP at round-half
    # boundaries, so allow |Δcode| <= 1 on a vanishing fraction
    inv = (1.0 / s_ref.astype(np.float32)).astype(np.float32)
    q_ref = np.clip(np.round(xb.astype(np.float32) * inv[:, None]),
                    -127, 127)
    dq_codes = np.abs(np.asarray(q, np.int32) - q_ref.astype(np.int32))
    assert dq_codes.max() <= 1
    assert (dq_codes > 0).mean() < 1e-3
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    assert np.abs(deq - xb).max() <= s_ref.max() * 0.51

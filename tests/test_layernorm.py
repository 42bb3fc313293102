"""RMS norm family tests (mirrors reference tests/test_layernorm.py and
tests/test_fused_norm_quant.py goldens)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.ops.quant import mxfp4_dequant

from tests.conftest import scoped
from tests.utils import assert_allclose, keys, rand

SHAPES = scoped(
    [(7, 512), (83, 2048), (1, 128), (130, 5120)],
    ci=[(7, 512), (83, 2048)],
    mini=[(7, 512)],
    key="ew_shapes",
)
DTYPES = [jnp.bfloat16, jnp.float16]
EPS = 1e-6


def np_rms_norm(x, w, eps=EPS):
    xf = x.astype(np.float32)
    inv = 1.0 / np.sqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return xf * inv * w.astype(np.float32)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_rms_norm(shape, dtype):
    k1, k2 = keys(0, 2)
    x = rand(k1, shape, dtype)
    w = rand(k2, (shape[-1],), dtype, scale=0.5)
    y = ops.rms_norm(x, w, EPS)
    golden = np_rms_norm(np.asarray(x, np.float32), np.asarray(w, np.float32))
    assert y.dtype == dtype
    assert_allclose(y, golden, rtol=2e-2, atol=2e-2)


def test_rms_norm_3d_4d():
    k1, k2 = keys(1, 2)
    w = rand(k2, (64,), jnp.bfloat16, scale=0.5)
    for shape in [(4, 8, 64), (2, 3, 8, 64)]:
        x = rand(k1, shape, jnp.bfloat16)
        y = ops.rms_norm(x, w, EPS)
        golden = np_rms_norm(np.asarray(x, np.float32), np.asarray(w, np.float32))
        assert y.shape == shape
        assert_allclose(y, golden, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_fused_add_rms_norm(shape, dtype):
    k1, k2, k3 = keys(2, 3)
    x = rand(k1, shape, dtype)
    r = rand(k2, shape, dtype)
    w = rand(k3, (shape[-1],), dtype, scale=0.5)
    y, new_r = ops.fused_add_rms_norm(x, r, w, EPS)
    z = (np.asarray(x, np.float32) + np.asarray(r, np.float32)).astype(
        np.asarray(x).dtype
    )
    assert_allclose(new_r, z, rtol=1e-3, atol=1e-3)
    golden = np_rms_norm(z.astype(np.float32), np.asarray(w, np.float32))
    assert_allclose(y, golden, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("quant_dtype", [jnp.float8_e4m3fn, jnp.int8])
@pytest.mark.parametrize("with_residual", [False, True])
def test_rms_norm_dynamic_per_token_quant(quant_dtype, with_residual):
    k1, k2, k3 = keys(3, 3)
    shape = (33, 1024)
    x = rand(k1, shape, jnp.bfloat16)
    w = rand(k3, (shape[-1],), jnp.bfloat16, scale=0.5)
    res = rand(k2, shape, jnp.bfloat16) if with_residual else None
    out = ops.rms_norm_dynamic_per_token_quant(
        x, w, EPS, quant_dtype=quant_dtype, residual=res
    )
    q, s = out[0], out[1]
    xf = np.asarray(x, np.float32)
    if with_residual:
        z = (xf + np.asarray(res, np.float32)).astype(np.float32)
        normed = np_rms_norm(z, np.asarray(w, np.float32))
    else:
        normed = np_rms_norm(xf, np.asarray(w, np.float32))
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    tol = 0.03 if quant_dtype == jnp.int8 else 0.12
    assert_allclose(deq, normed, rtol=tol, atol=tol)


@pytest.mark.parametrize("ue8m0", [False, True])
def test_rms_norm_per_block_quant(ue8m0):
    k1, k2 = keys(4, 2)
    x = rand(k1, (16, 512), jnp.bfloat16)
    w = rand(k2, (512,), jnp.bfloat16, scale=0.5)
    q, s = ops.rms_norm_per_block_quant(
        x, w, EPS, group_size=128, scale_ue8m0=ue8m0
    )
    assert q.shape == (16, 512) and s.shape == (16, 4)
    normed = np_rms_norm(np.asarray(x, np.float32), np.asarray(w, np.float32))
    deq = np.repeat(np.asarray(s), 128, 1) * np.asarray(q, np.float32)
    assert_allclose(deq, normed, rtol=0.15, atol=0.15)


def test_rms_norm_mxfp4_quant():
    k1, k2 = keys(5, 2)
    x = rand(k1, (8, 256), jnp.bfloat16)
    w = rand(k2, (256,), jnp.bfloat16, scale=0.5)
    q, s = ops.rms_norm_mxfp4_quant(x, w, EPS)
    assert q.shape == (8, 128) and s.shape == (8, 8)
    normed = np_rms_norm(np.asarray(x, np.float32), np.asarray(w, np.float32))
    deq = np.asarray(mxfp4_dequant(q, s))
    err = np.abs(deq - normed)
    bound = np.repeat(np.asarray(s), 32, 1) + 1e-5
    assert np.all(err <= bound)


def test_rms_norm_static_fp8_quant():
    k1, k2, k3 = keys(6, 3)
    x = rand(k1, (16, 512), jnp.bfloat16)
    r = rand(k2, (16, 512), jnp.bfloat16)
    w = rand(k3, (512,), jnp.bfloat16, scale=0.5)
    scale = jnp.asarray([0.01], jnp.float32)
    q = ops.rms_norm_static_fp8_quant(x, w, scale, EPS)
    normed = np_rms_norm(np.asarray(x, np.float32), np.asarray(w, np.float32))
    golden = np.clip(normed / 0.01, -448, 448)
    assert_allclose(q, golden, rtol=0.1, atol=1.0)

    q2, new_r = ops.fused_add_rms_norm_static_fp8_quant(x, r, w, scale, EPS)
    z = (np.asarray(x, np.float32) + np.asarray(r, np.float32))
    assert_allclose(new_r, z, rtol=1e-2, atol=1e-2)

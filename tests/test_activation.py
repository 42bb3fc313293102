"""Activation op tests vs numpy goldens.

Mirrors reference tests/test_activation.py, test_swigluoai_and_mul.py,
test_swiglustep_and_mul.py, test_fused_quant_activation.py,
test_fused_silu_mul_block_quant.py, test_fused_silu_mul_mxfp4_quant.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.ops.quant import mxfp4_dequant

from tests.conftest import scoped
from tests.utils import assert_allclose, keys, rand

SHAPES = scoped(
    [(7, 512), (83, 2048), (1, 128), (256, 11264)],
    ci=[(7, 512), (83, 2048)],
    mini=[(7, 512)],
    key="ew_shapes",
)
DTYPES = scoped([jnp.bfloat16, jnp.float16, jnp.float32], ci=[jnp.bfloat16, jnp.float32])


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_gelu_erf(x):
    from scipy.special import erf  # available via scipy? fall back

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


GATED_GOLDEN = {
    "silu_and_mul": lambda g, u: np_silu(g) * u,
    "mul_and_silu": lambda g, u: g * np_silu(u),
    "gelu_tanh_and_mul": lambda g, u: 0.5
    * g
    * (1.0 + np.tanh(0.7978845608028654 * g * (1.0 + 0.044715 * g * g)))
    * u,
}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op_name", sorted(GATED_GOLDEN))
def test_gated_activations(shape, dtype, op_name):
    (k,) = keys(0, 1)
    x = rand(k, (shape[0], 2 * shape[1]), dtype)
    out = getattr(ops, op_name)(x)
    xf = np.asarray(x, np.float32)
    g, u = xf[:, : shape[1]], xf[:, shape[1] :]
    golden = GATED_GOLDEN[op_name](g, u)
    rtol, atol = (2e-2, 2e-2) if dtype != jnp.float32 else (1e-2, 1e-4)
    assert out.dtype == dtype and out.shape == (shape[0], shape[1])
    assert_allclose(out, golden, rtol=rtol, atol=atol)


def test_gelu_and_mul():
    (k,) = keys(1, 1)
    x = rand(k, (16, 256), jnp.float32)
    out = ops.gelu_and_mul(x)
    xf = np.asarray(x, np.float32)
    g, u = xf[:, :128], xf[:, 128:]
    try:
        from scipy.special import erf
        golden = g * 0.5 * (1.0 + erf(g / np.sqrt(2.0))) * u
    except ImportError:
        import math
        golden = g * 0.5 * (1.0 + np.vectorize(math.erf)(g / np.sqrt(2.0))) * u
    assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", DTYPES)
def test_swigluoai_and_mul(dtype):
    (k,) = keys(2, 1)
    x = rand(k, (33, 512), dtype, scale=4.0)
    out = ops.swigluoai_and_mul(x, alpha=1.702, limit=7.0)
    xf = np.asarray(x, np.float32)
    gate = np.minimum(xf[:, 0::2], 7.0)
    up = np.clip(xf[:, 1::2], -7.0, 7.0)
    golden = (up + 1.0) * gate / (1.0 + np.exp(-gate * 1.702))
    tol = 3e-2 if dtype != jnp.float32 else 1e-5
    assert_allclose(out, golden, rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_swiglustep_and_mul(dtype):
    (k,) = keys(3, 1)
    x = rand(k, (33, 512), dtype, scale=4.0)
    out = ops.swiglustep_and_mul(x, limit=7.0)
    xf = np.asarray(x, np.float32)
    g = np.minimum(np_silu(xf[:, :256]), 7.0)
    u = np.clip(xf[:, 256:], -7.0, 7.0)
    tol = 3e-2 if dtype != jnp.float32 else 1e-5
    assert_allclose(out, g * u, rtol=tol, atol=tol)


def test_unary_activations():
    (k,) = keys(4, 1)
    x = rand(k, (16, 384), jnp.float32, scale=2.0)
    xf = np.asarray(x, np.float32)
    assert_allclose(
        ops.gelu_quick(x), xf / (1.0 + np.exp(-1.702 * xf)), rtol=1e-5, atol=1e-5
    )
    assert_allclose(
        ops.relu2_no_mul(x), np.maximum(xf, 0) ** 2, rtol=1e-5, atol=1e-5
    )
    gf = 0.5 * xf * (1.0 + np.tanh(0.79788456 * (xf + 0.044715 * xf**3)))
    assert_allclose(ops.gelu_new(x), gf, rtol=1e-4, atol=1e-4)
    assert_allclose(
        ops.gelu_fast(x),
        0.5 * xf * (1.0 + np.tanh(xf * 0.79788456 * (1.0 + 0.044715 * xf * xf))),
        rtol=1e-4,
        atol=1e-4,
    )
    assert_allclose(
        ops.fatrelu_and_mul(jnp.concatenate([x, x], -1), threshold=0.5),
        np.where(xf > 0.5, xf, 0.0) * xf,
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_silu_and_mul_quant_static(dtype):
    (k,) = keys(5, 1)
    x = rand(k, (32, 1024), dtype)
    scale = jnp.asarray([0.02], jnp.float32)
    q = ops.silu_and_mul_quant(x, scale)
    assert q.dtype == jnp.float8_e4m3fn
    xf = np.asarray(x, np.float32)
    golden = np_silu(xf[:, :512]) * xf[:, 512:] / 0.02
    golden = np.clip(golden, -448, 448)
    assert_allclose(q, golden, rtol=0.15, atol=0.3)


@pytest.mark.parametrize("quant_dtype", [jnp.float8_e4m3fn, jnp.int8])
@pytest.mark.parametrize("ue8m0", [False, True])
def test_silu_and_mul_per_block_quant(quant_dtype, ue8m0):
    if quant_dtype == jnp.int8 and ue8m0:
        pytest.skip("ue8m0 is fp8-only")
    (k,) = keys(6, 1)
    x = rand(k, (16, 512), jnp.bfloat16)
    q, s = ops.silu_and_mul_per_block_quant(
        x, group_size=128, quant_dtype=quant_dtype, scale_ue8m0=ue8m0
    )
    assert q.shape == (16, 256) and s.shape == (16, 2)
    deq = np.asarray(q, np.float32).reshape(16, 2, 128) * np.asarray(s)[:, :, None]
    xf = np.asarray(x, np.float32)
    golden = np_silu(xf[:, :256]) * xf[:, 256:]
    # quant error bounded by one step per group
    err = np.abs(deq.reshape(16, 256) - golden)
    step = np.repeat(np.asarray(s), 128, axis=1) * (
        1.0 if quant_dtype == jnp.int8 else 60.0
    )
    assert np.all(err <= step + 1e-3)
    # transposed scales
    _, st = ops.silu_and_mul_per_block_quant(
        x, group_size=128, quant_dtype=quant_dtype, scale_ue8m0=ue8m0,
        is_scale_transposed=True,
    )
    np.testing.assert_array_equal(np.asarray(st), np.asarray(s).T)


def test_silu_and_mul_mxfp4_quant():
    (k,) = keys(7, 1)
    x = rand(k, (8, 256), jnp.bfloat16)
    q, s = ops.silu_and_mul_mxfp4_quant(x)
    assert q.shape == (8, 64) and q.dtype == jnp.uint8
    assert s.shape == (8, 4)
    # scales are powers of two
    sn = np.asarray(s)
    np.testing.assert_array_equal(sn, 2.0 ** np.round(np.log2(sn)))
    deq = np.asarray(mxfp4_dequant(q, s))
    xf = np.asarray(x, np.float32)
    golden = np_silu(xf[:, :128]) * xf[:, 128:]
    # mxfp4 is 4-bit: abs error within a group bounded by the scale (the
    # largest e2m1 gap is 2.0, so err <= scale * 1.0 after RNE)
    err = np.abs(deq - golden)
    bound = np.repeat(sn, 32, axis=1) * 1.0 + 1e-3
    assert np.all(err <= bound)


def test_silu_and_mul_per_token_quant(impl):
    """Fused silu+mul + dynamic per-token int8 == silu_and_mul followed
    by dynamic_per_token_scaled_int8_quant (both impl tiers)."""
    (k,) = keys(9, 1)
    x = rand(k, (24, 512), jnp.bfloat16)
    q, s = ops.silu_and_mul_per_token_quant(x)
    assert q.shape == (24, 256) and q.dtype == jnp.int8
    assert s.shape == (24,)
    ref = np.asarray(ops.silu_and_mul(x), np.float32)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    absmax = np.abs(ref).max(axis=1)
    # int8 quantization error <= scale/2, plus bf16 rounding of the
    # golden (silu_and_mul returns bf16; the kernel quantizes f32 values)
    bound = (absmax / 127.0 / 2 + 1e-6)[:, None] + np.abs(ref) * 2.0 ** -7
    assert np.all(np.abs(deq - ref) <= bound)

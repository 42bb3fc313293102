"""Shared test utilities (analogue of reference tests/utils.py:22-89).

Seeded random inputs + fp8-aware allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np


def rand(key, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def keys(seed, n):
    return jax.random.split(jax.random.PRNGKey(seed), n)


def to_f32(x):
    return np.asarray(x, dtype=np.float32) if not isinstance(
        x, np.ndarray
    ) else x.astype(np.float32)


def assert_allclose(a, b, rtol=1e-2, atol=1e-2, msg=""):
    """fp8-capable allclose: compares in float32 (reference tests/utils.py
    opcheck allclose behaviour)."""
    an = np.asarray(jax.device_get(a)).astype(np.float32)
    bn = np.asarray(jax.device_get(b)).astype(np.float32)
    np.testing.assert_allclose(an, bn, rtol=rtol, atol=atol, err_msg=msg)


def quant_allclose(q_a, q_b, max_mismatch_frac=0.005):
    """Quantized outputs may differ by 1 ulp on rounding boundaries between
    impls; allow a tiny fraction of off-by-one-code mismatches."""
    a = np.asarray(jax.device_get(q_a)).astype(np.float32)
    b = np.asarray(jax.device_get(q_b)).astype(np.float32)
    mism = np.mean(a != b)
    assert mism <= max_mismatch_frac, f"quant mismatch frac {mism}"

"""Parametrized cache-write matrix (the breadth of reference
tests/test_cache.py, 1116 LoC: num_tokens × heads × head_size ×
block_size × dtype × kv_cache_dtype sweeps for the reshape_and_cache
family + the MLA concat variant).

One shared golden checker (slot placement + fp8 round-trip + padding
drop + untouched-slot preservation) swept over every cache-write op and
the reference's shape axes; the per-op deep tests stay in
test_cache.py.  Scope-trimmed like the reference's CI system."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.conftest import scoped

TOKENS = scoped([3, 24, 42], ci=[24], key="num_tokens")
HEADS = scoped([1, 4, 8], ci=[4], key="heads")
HEAD_SIZES = scoped([32, 64, 80, 120, 128, 256], ci=[64, 80, 120],
                    key="head_size")
BLOCK_SIZES = scoped([8, 16, 32], ci=[16], key="block_size")
DTYPES = scoped(["bfloat16", "float16", "float32"], ci=["bfloat16"],
                key="dtype")
KV_CACHE_DTYPES = ["auto", "fp8", "fp8_e5m2"]

_NB = 8


def _mk(seed, t, h, hs, dtype):
    rng = np.random.default_rng(seed)
    key = jnp.asarray(rng.standard_normal((t, h, hs)) * 0.5, dtype)
    val = jnp.asarray(rng.standard_normal((t, h, hs)) * 0.5, dtype)
    return rng, key, val


def _slots(rng, t, bs):
    s = rng.permutation(_NB * bs)[:t].astype(np.int64)
    s[0] = -1
    return s


def _check_rows(slots, got_rows, want_rows, kv_cache_dtype, scale, bs):
    """got_rows/want_rows: [T, ...] f32 arrays indexed by token."""
    for i, s in enumerate(slots):
        if s < 0:
            continue
        if kv_cache_dtype == "auto":
            np.testing.assert_allclose(got_rows[i], want_rows[i],
                                       rtol=2e-2, atol=2e-2)
        else:
            np.testing.assert_allclose(got_rows[i] * scale, want_rows[i],
                                       rtol=0.15, atol=0.06)


@pytest.mark.parametrize("num_tokens", TOKENS)
@pytest.mark.parametrize("heads", HEADS)
@pytest.mark.parametrize("head_size", HEAD_SIZES)
@pytest.mark.parametrize("block_size", BLOCK_SIZES)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("kv_cache_dtype", KV_CACHE_DTYPES)
@pytest.mark.parametrize("layout", ["flash", "tpu", "fused", "legacy"])
def test_reshape_and_cache_matrix(num_tokens, heads, head_size,
                                  block_size, dtype, kv_cache_dtype,
                                  layout):
    if layout == "legacy" and kv_cache_dtype != "auto":
        pytest.skip("legacy layout: fp8 covered by the flash/tpu axes")
    t, h, hs, bs = num_tokens, heads, head_size, block_size
    dt = jnp.dtype(dtype)
    cache_dt = (dt if kv_cache_dtype == "auto"
                else (jnp.float8_e4m3fn if kv_cache_dtype == "fp8"
                      else jnp.float8_e5m2))
    rng, key, val = _mk(hash((t, h, hs, bs, layout)) % 2**31, t, h, hs, dt)
    slots = _slots(rng, t, bs)
    scale = jnp.asarray([0.01], jnp.float32)

    if layout == "flash":
        kc = jnp.zeros((_NB, bs, h, hs), cache_dt)
        vc = jnp.zeros((_NB, bs, h, hs), cache_dt)
        kc, vc = ops.reshape_and_cache_flash(
            key, val, kc, vc, jnp.asarray(slots), kv_cache_dtype,
            scale, scale)
        kr = np.asarray(kc, np.float32).reshape(_NB * bs, h, hs)
        vr = np.asarray(vc, np.float32).reshape(_NB * bs, h, hs)
        got_k = kr[np.clip(slots, 0, None)]
        got_v = vr[np.clip(slots, 0, None)]
    elif layout == "tpu":
        kc = jnp.zeros((_NB, h, bs, hs), cache_dt)
        vc = jnp.zeros((_NB, h, bs, hs), cache_dt)
        kc, vc = ops.reshape_and_cache_tpu(
            key, val, kc, vc, jnp.asarray(slots), kv_cache_dtype,
            scale, scale)
        kn = np.asarray(kc, np.float32)
        vn = np.asarray(vc, np.float32)
        got_k = np.stack([kn[s // bs, :, s % bs] for s in
                          np.clip(slots, 0, None)])
        got_v = np.stack([vn[s // bs, :, s % bs] for s in
                          np.clip(slots, 0, None)])
    elif layout == "fused":
        kvc = jnp.zeros((_NB, h, bs, 2 * hs), cache_dt)
        kvc = ops.reshape_and_cache_tpu_fused(
            key, val, kvc, jnp.asarray(slots), kv_cache_dtype,
            scale, scale)
        n = np.asarray(kvc, np.float32)
        rows = np.stack([n[s // bs, :, s % bs] for s in
                         np.clip(slots, 0, None)])
        got_k, got_v = rows[..., :hs], rows[..., hs:]
    else:   # legacy vectorized [nb, h, hs/x, bs, x]
        x = 8
        if hs % x:
            pytest.skip("legacy layout needs head_size % 8 == 0")
        kc = jnp.zeros((_NB, h, hs // x, bs, x), dt)
        vc = jnp.zeros((_NB, h, hs, bs), dt)
        kc, vc = ops.reshape_and_cache(
            key, val, kc, vc, jnp.asarray(slots))
        kn = np.asarray(kc, np.float32)
        vn = np.asarray(vc, np.float32)
        got_k = np.stack([
            kn[s // bs, :, :, s % bs, :].reshape(h, hs)
            for s in np.clip(slots, 0, None)])
        got_v = np.stack([vn[s // bs, :, :, s % bs].reshape(h, hs)
                          for s in np.clip(slots, 0, None)])

    want_k = np.asarray(key, np.float32)
    want_v = np.asarray(val, np.float32)
    _check_rows(slots, got_k, want_k, kv_cache_dtype, 0.01, bs)
    _check_rows(slots, got_v, want_v, kv_cache_dtype, 0.01, bs)


@pytest.mark.parametrize("kv_lora_rank", scoped([64, 512], ci=[64],
                                                key="kv_lora_rank"))
@pytest.mark.parametrize("qk_rope_dim", [16, 64])
@pytest.mark.parametrize("block_size", BLOCK_SIZES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_concat_and_cache_mla_matrix(kv_lora_rank, qk_rope_dim,
                                     block_size, dtype):
    """MLA latent concat across the reference's rank/rope/block axes
    (reference test_concat_and_cache_mla parametrization)."""
    t, bs = 13, block_size
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(kv_lora_rank + qk_rope_dim + bs)
    kv_c = jnp.asarray(rng.standard_normal((t, kv_lora_rank)) * 0.5, dt)
    k_pe = jnp.asarray(rng.standard_normal((t, qk_rope_dim)) * 0.5, dt)
    cache = jnp.zeros((_NB, bs, kv_lora_rank + qk_rope_dim), dt)
    slots = _slots(rng, t, bs)
    out = ops.concat_and_cache_mla(kv_c, k_pe, cache, jnp.asarray(slots))
    on = np.asarray(out, np.float32).reshape(_NB * bs, -1)
    want = np.concatenate([np.asarray(kv_c, np.float32),
                           np.asarray(k_pe, np.float32)], -1)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        np.testing.assert_allclose(on[s], want[i], rtol=2e-2, atol=2e-2)
    # untouched slots stay zero
    written = {int(s) for s in slots if s >= 0}
    for s in range(_NB * bs):
        if s not in written:
            assert np.all(on[s] == 0)

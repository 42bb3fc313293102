"""Strided / layered KV-cache layout contracts (reference:
tests/flash_attn/test_flash_attn_varlen_func.py:25-27 + 381-470 —
``test_varlen_with_interleaved_paged_kv`` passes K and V as non-contiguous
views of ONE combined allocation, modeling the KV-offload connector's
uniform cache layout where each layer view has a larger physical page
stride).

JAX has no strided tensors: a torch strided view maps to a slice of the
combined buffer, and the CONTRACT under test is that attention over such
views is bit-identical to attention over contiguous per-layer caches.
(On TPU, XLA materializes a slice fed to a Pallas kernel — correct but a
copy per call — so the serving path keeps per-layer buffers and the
TPU-native combined layout is the FUSED [nb, H, bs, 2*hs] page, where
K|V share one buffer along lanes with zero stride tricks.  This suite
pins the semantics for offload-connector style callers.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops


def _attn(q, k, v, used, tbl, scale):
    q_lens = [1] * q.shape[0]
    cu_q = jnp.asarray(np.arange(len(q_lens) + 1), jnp.int32)
    return ops.flash_attn_varlen_func(
        q, k, v, 1, cu_q, int(tbl.shape[1] * k.shape[1]),
        seqused_k=used, block_table=tbl, causal=True,
        softmax_scale=scale, kv_layout="bshd")


@pytest.mark.parametrize("head_size", [64, 128])
def test_interleaved_combined_kv_views(head_size, impl):
    """K/V as the two halves of a combined [nb, 2*bs, H, hs] allocation
    (the reference's interleaved paged-KV case) == contiguous caches."""
    rng = np.random.default_rng(0)
    nb, bs, hkv, hq = 32, 16, 2, 8
    combined = jnp.asarray(
        rng.standard_normal((nb, 2 * bs, hkv, head_size)) * 0.5,
        jnp.bfloat16)
    k_view = combined[:, :bs]
    v_view = combined[:, bs:]
    q = jnp.asarray(rng.standard_normal((3, hq, head_size)) * 0.5,
                    jnp.bfloat16)
    used = jnp.asarray([130, 37, 5], jnp.int32)
    tbl = jnp.asarray(rng.permutation(nb)[:27].reshape(3, 9), jnp.int32)
    scale = head_size ** -0.5

    out_view = _attn(q, k_view, v_view, used, tbl, scale)
    # contiguous copies (the reference's .contiguous() golden)
    k_c = jnp.array(np.asarray(k_view))
    v_c = jnp.array(np.asarray(v_view))
    out_c = _attn(q, k_c, v_c, used, tbl, scale)
    np.testing.assert_array_equal(np.asarray(out_view, np.float32),
                                  np.asarray(out_c, np.float32))


def test_cross_layer_uniform_cache_views(impl):
    """Cross-layer uniform cache (reference NUM_LAYERS cases): one
    [L, 2, nb, bs, H, hs] allocation, each layer's K/V a view with the
    larger cross-layer page stride; per-layer attention over the views
    matches per-layer contiguous buffers."""
    rng = np.random.default_rng(1)
    L, nb, bs, hkv, hq, hs = 3, 16, 16, 2, 4, 64
    big = jnp.asarray(
        rng.standard_normal((L, 2, nb, bs, hkv, hs)) * 0.5, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((2, hq, hs)) * 0.5, jnp.bfloat16)
    used = jnp.asarray([40, 17], jnp.int32)
    tbl = jnp.asarray(rng.permutation(nb)[:6].reshape(2, 3), jnp.int32)
    scale = hs ** -0.5
    for li in range(L):
        out_v = _attn(q, big[li, 0], big[li, 1], used, tbl, scale)
        k_c = jnp.array(np.asarray(big[li, 0]))
        v_c = jnp.array(np.asarray(big[li, 1]))
        out_c = _attn(q, k_c, v_c, used, tbl, scale)
        np.testing.assert_array_equal(np.asarray(out_v, np.float32),
                                      np.asarray(out_c, np.float32))


def test_fused_layout_is_the_native_combined_cache(impl):
    """The TPU-native combined allocation: K|V lane-fused pages
    [nb, H, bs, 2*hs] == the split caches they were packed from (the
    engine's answer to the reference's interleaved stride layout — one
    buffer, zero copies, one DMA per page)."""
    rng = np.random.default_rng(2)
    nb, bs, hkv, hq, hs = 16, 16, 2, 4, 64
    k = rng.standard_normal((nb, hkv, bs, hs)) * 0.5
    v = rng.standard_normal((nb, hkv, bs, hs)) * 0.5
    fused = jnp.asarray(np.concatenate([k, v], axis=-1), jnp.bfloat16)
    kj = jnp.asarray(k, jnp.bfloat16)
    vj = jnp.asarray(v, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((2, hq, hs)) * 0.5, jnp.bfloat16)
    used = jnp.asarray([40, 17], jnp.int32)
    tbl = jnp.asarray(rng.permutation(nb)[:6].reshape(2, 3), jnp.int32)
    cu_q = jnp.asarray([0, 1, 2], jnp.int32)
    out_f = ops.flash_attn_varlen_func(
        q, fused, None, 1, cu_q, nb * bs, seqused_k=used,
        block_table=tbl, causal=True, kv_layout="fused")
    out_s = ops.flash_attn_varlen_func(
        q, kj, vj, 1, cu_q, nb * bs, seqused_k=used,
        block_table=tbl, causal=True, kv_layout="bhsd")
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_s, np.float32),
                               rtol=2e-2, atol=2e-2)

"""Flash attention tests (mirrors reference
tests/flash_attn/test_flash_attn_varlen_func.py ``ref_paged_attn`` golden:
per-seq full attention with bottom-right-aligned causal/window masks,
softcap, sinks, GQA, FP8-KV, MLA head sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.conftest import scoped
from tests.utils import assert_allclose


def np_ref_attn(q, kv_lens_k, q_lens, key, value, scale,
                causal=False, window=(-1, -1), soft_cap=None, sink=None,
                k_descale=None, v_descale=None):
    """Golden per-seq attention (numpy port of ref_paged_attn,
    test_flash_attn_varlen_func.py:30-126).  key/value are per-seq lists of
    [kv_len, Hkv, D] arrays."""
    outs, lses = [], []
    start = 0
    hq = q.shape[1]
    for i, qlen in enumerate(q_lens):
        kv_len = kv_lens_k[i]
        qi = q[start:start + qlen].astype(np.float32) * scale
        k = key[i].astype(np.float32)
        v = value[i].astype(np.float32)
        if k_descale is not None:
            k = k * k_descale
        if v_descale is not None:
            v = v * v_descale
        if qi.shape[1] != k.shape[1]:
            rep = qi.shape[1] // k.shape[1]
            k = np.repeat(k, rep, axis=1)
            v = np.repeat(v, rep, axis=1)
        attn = np.einsum("qhd,khd->hqk", qi, k).astype(np.float32)
        empty = np.ones((qlen, kv_len))
        mask = np.triu(empty, k=kv_len - qlen + 1).astype(bool)
        wl, wr = window
        if wl > 0 or wr > 0:
            wr_ = wr if wr >= 0 else max(kv_lens_k)
            wl_ = wl if wl >= 0 else max(kv_lens_k)
            m_r = np.triu(empty, k=kv_len - qlen + wr_ + 1).astype(bool)
            m_l = ~np.triu(empty, k=kv_len - qlen - wl_).astype(bool)
            attn[:, m_r | m_l] = -np.inf
        if soft_cap is not None:
            attn = soft_cap * np.tanh(attn / soft_cap)
        if causal:
            attn[:, mask] = -np.inf
        if sink is not None:
            s = np.broadcast_to(sink.reshape(hq, 1, 1), (hq, qlen, 1))
            attn = np.concatenate([attn, s], axis=-1)
        m = attn.max(-1, keepdims=True)
        p = np.exp(attn - m)
        l = p.sum(-1, keepdims=True)
        sm = p / l
        lses.append((m[..., 0] + np.log(l[..., 0])))
        if sink is not None:
            sm = sm[..., :-1]
        outs.append(np.einsum("hqk,khd->qhd", sm, v))
        start += qlen
    return np.concatenate(outs, 0), np.concatenate(lses, axis=1)


def make_paged(seq_lens, num_heads, head_size, head_size_v, block_size,
               num_blocks, dtype, seed=0, kv_dtype=None):
    """Build q (packed), paged caches, block table, and per-seq k/v views."""
    rng = np.random.default_rng(seed)
    q_lens = [s[0] for s in seq_lens]
    kv_lens = [s[1] for s in seq_lens]
    hq, hkv = num_heads
    total_q = sum(q_lens)
    q = rng.standard_normal((total_q, hq, head_size), np.float32) * 0.5
    kc = rng.standard_normal(
        (num_blocks, block_size, hkv, head_size), np.float32) * 0.5
    vc = rng.standard_normal(
        (num_blocks, block_size, hkv, head_size_v), np.float32) * 0.5
    max_blocks = max(-(-kv // block_size) for kv in kv_lens)
    tbl = rng.permutation(num_blocks)[: len(seq_lens) * max_blocks]
    tbl = tbl.reshape(len(seq_lens), max_blocks).astype(np.int32)
    io_dtype = dtype
    qj = jnp.asarray(q, io_dtype)
    kv_store = kv_dtype or io_dtype
    kj = jnp.asarray(kc, kv_store)
    vj = jnp.asarray(vc, kv_store)
    # per-seq contiguous kv views for the golden (in *stored* precision)
    keys_, vals_ = [], []
    kc_s = np.asarray(kj, np.float32)
    vc_s = np.asarray(vj, np.float32)
    for i, kv in enumerate(kv_lens):
        nb = -(-kv // block_size)
        keys_.append(kc_s[tbl[i, :nb]].reshape(-1, hkv, head_size)[:kv])
        vals_.append(vc_s[tbl[i, :nb]].reshape(-1, hkv, head_size_v)[:kv])
    cu_q = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    return (qj, kj, vj, jnp.asarray(cu_q), jnp.asarray(kv_lens, jnp.int32),
            jnp.asarray(tbl), q_lens, kv_lens, keys_, vals_,
            np.asarray(qj, np.float32))


SEQ_LENS = [[(1, 1328), (5, 18), (129, 463)]]
DECODE_LENS = [[(1, 1025), (1, 523), (1, 37)]]


@pytest.mark.parametrize("seq_lens", SEQ_LENS)
# non-lane-aligned heads 80/96/120 take the padded-lane route (reference
# sweep points: tests/test_cache.py:21 head 80/120, attention head 512
# tests/flash_attn/test_flash_attn_varlen_func.py:14)
@pytest.mark.parametrize("head_size", scoped(
    [64, 80, 96, 120, 128, 256, 512], ci=[64, 80, 120, 128],
    key="head_size"))
@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("window", scoped(
    [(-1, -1), (127, -1), (64, 64)], ci=[(-1, -1), (127, -1)],
    key="window"))
def test_varlen_paged(seq_lens, head_size, causal, window, impl):
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), head_size, head_size, 16, 512,
                   jnp.bfloat16)
    scale = head_size ** -0.5
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, max(q_lens), cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=causal,
        window_size=window, softmax_scale=scale)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=causal, window=window)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("seq_lens", SEQ_LENS)
def test_varlen_nonpaged(seq_lens, impl):
    head_size = 128
    rng = np.random.default_rng(3)
    q_lens = [s[0] for s in seq_lens]
    kv_lens = [s[1] for s in seq_lens]
    hq, hkv = 8, 2
    q = rng.standard_normal((sum(q_lens), hq, head_size), np.float32) * 0.5
    k = rng.standard_normal((sum(kv_lens), hkv, head_size), np.float32) * 0.5
    v = rng.standard_normal((sum(kv_lens), hkv, head_size), np.float32) * 0.5
    cu_q = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int32)
    qj = jnp.asarray(q, jnp.bfloat16)
    kj = jnp.asarray(k, jnp.bfloat16)
    vj = jnp.asarray(v, jnp.bfloat16)
    scale = head_size ** -0.5
    out, lse = ops.flash_attn_varlen_func(
        qj, kj, vj, max(q_lens), jnp.asarray(cu_q), max(kv_lens),
        cu_seqlens_k=jnp.asarray(cu_k), causal=True, softmax_scale=scale,
        return_softmax_lse=True)
    keys_ = [np.asarray(kj, np.float32)[cu_k[i]:cu_k[i + 1]]
             for i in range(len(kv_lens))]
    vals_ = [np.asarray(vj, np.float32)[cu_k[i]:cu_k[i + 1]]
             for i in range(len(kv_lens))]
    golden, golden_lse = np_ref_attn(
        np.asarray(qj, np.float32), kv_lens, q_lens, keys_, vals_, scale,
        causal=True)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)
    assert lse.shape == (hq, sum(q_lens))
    assert_allclose(lse, golden_lse, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("seq_lens", DECODE_LENS)
@pytest.mark.parametrize("head_size", scoped(
    [64, 80, 96, 120, 128, 256], ci=[64, 80, 120, 128], key="head_size"))
@pytest.mark.parametrize("block_size", scoped([16, 64], ci=[16], key="block_size"))
@pytest.mark.parametrize("window", [(-1, -1), (127, -1)])
def test_decode_paged(seq_lens, head_size, block_size, window, impl):
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), head_size, head_size, block_size, 256,
                   jnp.bfloat16, seed=1)
    scale = head_size ** -0.5
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        window_size=window, softmax_scale=scale, num_splits_kv=8)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True, window=window)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("kind", ["sink", "softcap", "fp8kv"])
def test_decode_features(kind, impl):
    seq_lens = [(1, 200), (1, 37)]
    hq, hkv, d = 8, 2, 128
    kv_dtype = jnp.float8_e4m3fn if kind == "fp8kv" else None
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (hq, hkv), d, d, 16, 64, jnp.bfloat16, seed=2,
                   kv_dtype=kv_dtype)
    scale = d ** -0.5
    sink = softcap = kd = vd = None
    kwargs = {}
    if kind == "sink":
        sink = np.linspace(-1.0, 1.0, hq).astype(np.float32)
        kwargs["s_aux"] = jnp.asarray(sink)
    elif kind == "softcap":
        softcap = 30.0
        kwargs["softcap"] = softcap
    else:
        kd, vd = 1.7, 0.6
        kwargs["k_descale"] = jnp.float32(kd)
        kwargs["v_descale"] = jnp.float32(vd)
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        softmax_scale=scale, **kwargs)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True, soft_cap=softcap, sink=sink,
                            k_descale=kd, v_descale=vd)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("mode", ["decode", "prefill"])
def test_feature_cross_product(mode, impl):
    """Kitchen-sink cross: causal + sliding window + sinks + softcap +
    FP8 KV + GQA together in ONE call (the reference's feature matrix is
    exercised per-axis by its kernel-variant sweep; on TPU one kernel
    serves every combination, so the interaction paths need a direct
    cross test)."""
    seq_lens = ([(1, 200), (1, 37)] if mode == "decode"
                else [(33, 200), (5, 37)])
    hq, hkv, d = 8, 2, 128
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (hq, hkv), d, d, 16, 64, jnp.bfloat16,
                   seed=6, kv_dtype=jnp.float8_e4m3fn)
    scale = d ** -0.5
    sink = np.linspace(-1.0, 1.0, hq).astype(np.float32)
    softcap, kd, vd, window = 30.0, 1.7, 0.6, (63, -1)
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, max(q_lens), cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        softmax_scale=scale, s_aux=jnp.asarray(sink), softcap=softcap,
        k_descale=jnp.float32(kd), v_descale=jnp.float32(vd),
        window_size=window)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True, soft_cap=softcap, sink=sink,
                            k_descale=kd, v_descale=vd, window=window)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("hs_qk,hs_vo", [(192, 128), (576, 512)])
def test_decode_mla(hs_qk, hs_vo, impl):
    """MLA shapes: head_size_qk != head_size_vo
    (reference: test_decode_with_paged_kv_mla, head_size 192/128; the
    chunk-prefill kernel's contract extends "up to 576/512" — DeepSeek-V3
    absorbed latent decode, chunk_prefill_kernel.hpp:70 — so the real
    V3 shape is tested too, incl. the non-128-multiple d_qk=576)."""
    seq_lens = [(1, 130), (1, 37)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 1), hs_qk, hs_vo, 16, 64, jnp.bfloat16,
                   seed=4)
    scale = hs_qk ** -0.5
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True, softmax_scale=scale)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True)
    assert out.shape == (2, 8, hs_vo)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("hs_qk,hs_vo", [(576, 512)])
def test_prefill_mla_chunked(hs_qk, hs_vo, impl):
    """Chunk-prefill at the full DeepSeek-V3 MLA head sizes (reference
    chunk_prefill_kernel.hpp:70 'up to 576/512' + test_mla_decode.py):
    varlen paged prefill with q-len > 1 rows against the latent cache
    (Hkv = 1 absorbed layout)."""
    seq_lens = [(33, 70), (5, 18)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 1), hs_qk, hs_vo, 16, 64, jnp.bfloat16,
                   seed=11)
    scale = hs_qk ** -0.5
    out = ops.flash_attn_varlen_func(
        qj, kj, vj, max(q_lens), cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True, softmax_scale=scale)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True)
    assert out.shape == (sum(q_lens), 8, hs_vo)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("kind", ["plain", "sink", "softcap", "fp8kv"])
@pytest.mark.parametrize("splits", [2, 4, 16])
def test_decode_split_kv(kind, splits, impl):
    """Honored num_splits_kv: S page-range splits LSE-merge to the
    unsplit result — output AND lse (reference ReduceSplitK,
    csrc/xpu/attn paged_decode split reduction +
    docs/group_split_kv_design.md).  splits=16 > pages exercises empty
    splits (skewed-batch case: the 37-token sequence fills 3 pages)."""
    seq_lens = [(1, 200), (1, 37), (1, 130)]
    hq, hkv, d = 8, 2, 128
    kv_dtype = jnp.float8_e4m3fn if kind == "fp8kv" else None
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (hq, hkv), d, d, 16, 64, jnp.bfloat16, seed=7,
                   kv_dtype=kv_dtype)
    scale = d ** -0.5
    kwargs = {}
    if kind == "sink":
        kwargs["s_aux"] = jnp.asarray(
            np.linspace(-1.0, 1.0, hq).astype(np.float32))
    elif kind == "softcap":
        kwargs["softcap"] = 30.0
    elif kind == "fp8kv":
        kwargs["k_descale"] = jnp.float32(1.7)
        kwargs["v_descale"] = jnp.float32(0.6)

    def run(ns):
        return ops.flash_attn_varlen_func(
            qj, kj, vj, 1, cu_q, max(kv_lens),
            seqused_k=used_k, block_table=tbl, causal=True,
            softmax_scale=scale, num_splits_kv=ns,
            return_softmax_lse=True, **kwargs)

    ref_out, ref_lse = run(0)
    out, lse = run(splits)
    assert_allclose(out, ref_out, rtol=2e-2, atol=2e-2)
    assert_allclose(lse, ref_lse, rtol=1e-3, atol=1e-3)


def test_merge_attn_states(impl):
    """Splitting KV in half and LSE-merging equals full attention
    (reference: csrc/attention/merge_attn_states.cpp contract)."""
    rng = np.random.default_rng(5)
    t, h, d, kv = 12, 4, 64, 96
    q = rng.standard_normal((t, h, d), np.float32) * 0.5
    k = rng.standard_normal((kv, h, d), np.float32) * 0.5
    v = rng.standard_normal((kv, h, d), np.float32) * 0.5
    scale = d ** -0.5

    def full(ks, vs):
        attn = np.einsum("qhd,khd->hqk", q * scale, ks)
        m = attn.max(-1, keepdims=True)
        p = np.exp(attn - m)
        l = p.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", p / l, vs)
        return o, (m[..., 0] + np.log(l[..., 0]))

    golden, _ = full(k, v)
    o1, lse1 = full(k[:48], v[:48])
    o2, lse2 = full(k[48:], v[48:])
    out, lse = ops.merge_attn_states(
        jnp.asarray(o1), jnp.asarray(lse1), jnp.asarray(o2),
        jnp.asarray(lse2))
    assert_allclose(out, golden, rtol=1e-4, atol=1e-4)


def test_build_decode_split_plan():
    """Split plan correctness contract (reference:
    docs/group_split_kv_design.md:93-106)."""
    from vllm_xpu_kernels_tpu.ops.attention import build_decode_split_plan

    kv_lens = [16, 4096, 128, 100000]
    splits = build_decode_split_plan(kv_lens, kv_tile=64, num_kv_splits=16)
    assert len(splits) == 4
    assert all(s >= 1 for s in splits)
    assert all(s <= 16 for s in splits)
    assert splits[0] == 1  # short seq: single split


@pytest.mark.parametrize("pp", [1, 2, 3, 4])
def test_decode_pages_per_step(pp, impl):
    """All pages_per_step variants of the decode kernel agree with the
    golden (fat grid steps are a pure scheduling change)."""
    from vllm_xpu_kernels_tpu.kernels.flash_attention import paged_decode

    seq_lens = [(1, 130), (1, 256), (1, 17), (1, 64)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), 64, 64, 16, 256, jnp.bfloat16, seed=3)
    # make_paged emits the flash [nb, bs, H, hs] layout; the raw kernel
    # takes the TPU-native [nb, H, bs, hs]
    kn = jnp.transpose(kj, (0, 2, 1, 3))
    vn = jnp.transpose(vj, (0, 2, 1, 3))
    scale = 64 ** -0.5
    out, _ = paged_decode(
        qj, kn, vn, cu_q, used_k, tbl, scale=scale, window=(-1, -1),
        softcap=0.0, sink=None, k_descale=None, v_descale=None,
        max_seqlen_k=max(kv_lens), pages_per_step=pp)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True)
    assert_allclose(out.reshape(golden.shape), golden, rtol=3e-2, atol=3e-2)


def _fuse_pages(kj, vj):
    """make_paged emits the flash [nb, bs, Hkv, hs] layout; the fused page
    layout is [nb, Hkv, bs, hs_k + hs_v] (K in [..., :hs_k])."""
    kn = jnp.transpose(kj, (0, 2, 1, 3))
    vn = jnp.transpose(vj, (0, 2, 1, 3))
    return jnp.concatenate([kn, vn], axis=-1)


@pytest.mark.parametrize("decode_impl", ["dma", "pipelined"])
@pytest.mark.parametrize("kv_dtype", [None, jnp.float8_e4m3fn])
@pytest.mark.parametrize("d", [128, 64])
def test_decode_fused_kv(decode_impl, kv_dtype, d, impl, monkeypatch):
    """Fused [nb, Hkv, bs, Dk+Dv] page layout matches the golden under
    both decode kernels (one async DMA per page in the dma kernel;
    two last-dim blocks of one operand in the pipelined kernel).
    d=64 exercises the half-lane padded-q path (GPT-OSS / Llama-3.2
    head size: the [.., 128] page serves as both K and V)."""
    monkeypatch.setenv("VXK_DECODE_IMPL", decode_impl)
    seq_lens = [(1, 1025), (1, 523), (1, 37)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), d, d, 16, 256, jnp.bfloat16, seed=11,
                   kv_dtype=kv_dtype)
    scale = d ** -0.5
    kwargs = {}
    kd = vd = None
    if kv_dtype is not None:
        kd, vd = 1.3, 0.7
        kwargs["k_descale"] = jnp.float32(kd)
        kwargs["v_descale"] = jnp.float32(vd)
    out = ops.flash_attn_varlen_func(
        qj, _fuse_pages(kj, vj), None, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        softmax_scale=scale, kv_layout="fused", **kwargs)
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True, k_descale=kd, v_descale=vd)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("layout", ["contig", "mixed"])
def test_decode_contiguous_runs(layout, impl, monkeypatch):
    """The dma decode kernel coalesces a round of consecutive block-table
    entries into one fat page copy — exercise fully-contiguous tables and
    a mix of contiguous / permuted sequences (the predicate must agree
    between DMA issue and wait, and partial tail rounds stay per-page)."""
    monkeypatch.setenv("VXK_DECODE_IMPL", "dma")
    seq_lens = [(1, 1025), (1, 523), (1, 130), (1, 37)]
    d = 128
    bs = 16
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), d, d, bs, 512, jnp.bfloat16, seed=21)
    # rebuild the block table: contiguous page runs per sequence (what a
    # sequential allocator produces), optionally leaving one sequence on
    # the permuted table
    max_blocks = tbl.shape[1]
    new_tbl = np.asarray(tbl).copy()
    contig_seqs = range(len(seq_lens)) if layout == "contig" else (0, 2)
    for i in contig_seqs:
        new_tbl[i] = np.arange(i * max_blocks, (i + 1) * max_blocks)
    # regenerate the golden per-seq views for the new table
    kc_s = np.asarray(kj, np.float32)                # flash [nb, bs, H, hs]
    vc_s = np.asarray(vj, np.float32)
    keys_, vals_ = [], []
    for i, kv in enumerate(kv_lens):
        nb = -(-kv // bs)
        keys_.append(kc_s[new_tbl[i, :nb]].reshape(-1, 2, d)[:kv])
        vals_.append(vc_s[new_tbl[i, :nb]].reshape(-1, 2, d)[:kv])
    out = ops.flash_attn_varlen_func(
        qj, _fuse_pages(kj, vj), None, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=jnp.asarray(new_tbl), causal=True,
        softmax_scale=d ** -0.5, kv_layout="fused")
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, d ** -0.5,
                            causal=True)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("decode_impl", ["dma", "pipelined"])
@pytest.mark.parametrize("kv_dtype", [None, jnp.float8_e5m2])
def test_decode_fresh_kv(decode_impl, kv_dtype, impl, monkeypatch):
    """Fresh-KV decode fast path: the current token's quantized row is
    folded into the attention epilogue and written into the cache by the
    kernel — output matches scatter-then-attend, and the returned cache
    matches the scatter exactly (bit-identical rows).  Includes a padded
    batch row (slot -1, kv_len 1) that must not touch the cache."""
    monkeypatch.setenv("VXK_DECODE_IMPL", decode_impl)
    seq_lens = [(1, 1025), (1, 523), (1, 128), (1, 1)]
    d, bs = 128, 16
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), d, d, bs, 512, jnp.bfloat16, seed=31,
                   kv_dtype=kv_dtype)
    kv_cache = _fuse_pages(kj, vj)
    hkv = 2
    scale = d ** -0.5
    rng = np.random.default_rng(41)
    fresh = jnp.asarray(rng.standard_normal((4, hkv, 2 * d)) * 0.5,
                        kv_cache.dtype)
    # newest-token slots from the block table; seq 3 is batch padding
    slots = []
    for i, kv in enumerate(kv_lens):
        pos = kv - 1
        slots.append(int(tbl[i, pos // bs]) * bs + pos % bs)
    slots[3] = -1
    slots = jnp.asarray(slots, jnp.int32)
    kd = vd = None
    kwargs = {}
    if kv_dtype is not None:
        kd, vd = 1.3, 0.7
        kwargs = dict(k_descale=jnp.float32(kd), v_descale=jnp.float32(vd))

    from vllm_xpu_kernels_tpu.ops.cache import scatter_fused_rows

    # baseline: scatter the fresh rows first, attend over the full length
    cache_ref = scatter_fused_rows(kv_cache, fresh, slots)
    out_ref = ops.flash_attn_varlen_func(
        qj, cache_ref, None, 1, cu_q, max(kv_lens), seqused_k=used_k,
        block_table=tbl, causal=True, softmax_scale=scale,
        kv_layout="fused", **kwargs)
    # fast path: one call, fresh row folded + written by the kernel
    out, cache_new = ops.flash_attn_varlen_func(
        qj, kv_cache, None, 1, cu_q, max(kv_lens), seqused_k=used_k,
        block_table=tbl, causal=True, softmax_scale=scale,
        kv_layout="fused", fresh_kv=fresh, fresh_slots=slots, **kwargs)
    # padded row's output is undefined; compare live rows only
    assert_allclose(out[:3], out_ref[:3], rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(
        np.asarray(cache_new, np.float32), np.asarray(cache_ref, np.float32))


@pytest.mark.parametrize("fresh", [False, True])
def test_decode_out_quant(fresh, impl, monkeypatch):
    """Fused per-token int8 output quant in the decode epilogue: dequant
    of (q, scale) matches the unquantized output within int8 resolution,
    and scales match ops.dynamic_per_token_scaled_int8_quant's law."""
    monkeypatch.setenv("VXK_DECODE_IMPL", "dma")
    seq_lens = [(1, 257), (1, 64), (1, 8)]
    d, bs = 128, 16
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), d, d, bs, 128, jnp.bfloat16, seed=7)
    kv_cache = _fuse_pages(kj, vj)
    scale = d ** -0.5
    kwargs = dict(causal=True, softmax_scale=scale, kv_layout="fused",
                  seqused_k=used_k, block_table=tbl)
    if fresh:
        rng = np.random.default_rng(3)
        fresh_kv = jnp.asarray(
            rng.standard_normal((3, 2, 2 * d)) * 0.5, kv_cache.dtype)
        slots = jnp.asarray(
            [int(tbl[i, (kv - 1) // bs]) * bs + (kv - 1) % bs
             for i, kv in enumerate(kv_lens)], jnp.int32)
        kwargs.update(fresh_kv=fresh_kv, fresh_slots=slots)
    ref = ops.flash_attn_varlen_func(
        qj, kv_cache, None, 1, cu_q, max(kv_lens), **kwargs)
    res = ops.flash_attn_varlen_func(
        qj, kv_cache, None, 1, cu_q, max(kv_lens), out_quant=True,
        **kwargs)
    if fresh:
        ref, (out_pair, _) = ref[0], (res[0], res[1])
        out, s = out_pair
    else:
        out, s = res
    if s is None:
        return  # executing tier cannot fuse; contract is (out, None)
    assert out.dtype == jnp.int8
    deq = np.asarray(out, np.float32) * np.asarray(s)[:, None, None]
    ref_f = np.asarray(ref, np.float32)
    # tolerance: half an int8 ulp (the kernel quantizes from f32) plus
    # the bf16 rounding the reference output already carries
    atol = np.asarray(s).max() * 0.51 + np.abs(ref_f).max() * 2.0 ** -8
    np.testing.assert_allclose(deq, ref_f, rtol=0.0, atol=atol)


@pytest.mark.parametrize("d", [128, 64])
def test_prefill_fused_kv(d, impl):
    """Mixed varlen prefill against the fused page layout (d=64: the
    half-lane padded-q path)."""
    seq_lens = [(1, 1328), (5, 18), (129, 463)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 2), d, d, 16, 512, jnp.bfloat16, seed=12)
    scale = d ** -0.5
    out = ops.flash_attn_varlen_func(
        qj, _fuse_pages(kj, vj), None, max(q_lens), cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        softmax_scale=scale, kv_layout="fused")
    golden, _ = np_ref_attn(qf, kv_lens, q_lens, keys_, vals_, scale,
                            causal=True)
    assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("hs_qk,hs_vo,wpad", [(576, 512, 1152), (64, 64, 128)])
def test_decode_mla_padded_fused(hs_qk, hs_vo, wpad, impl):
    """Absorbed-latent MLA decode on PADDED fused pages
    ([K(576) | V(512) | zeros] in 1152 lanes, v_head_dim explicit):
    one DMA per page on the dma kernel's padded-q path == the split
    bshd layout.  The 64/64 case pins the existing half-lane pages
    through the same code path."""
    seq_lens = [(1, 130), (1, 37)]
    qj, kj, vj, cu_q, used_k, tbl, q_lens, kv_lens, keys_, vals_, qf = \
        make_paged(seq_lens, (8, 1), hs_qk, hs_vo, 16, 64, jnp.bfloat16,
                   seed=21)
    scale = hs_qk ** -0.5
    ref = ops.flash_attn_varlen_func(
        qj, kj, vj, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True, softmax_scale=scale)
    # build the padded fused cache [nb, hkv, bs, wpad]
    k_b = np.asarray(kj).transpose(0, 2, 1, 3)     # bshd -> bhsd
    v_b = np.asarray(vj).transpose(0, 2, 1, 3)
    nb, hkv, bs = k_b.shape[:3]
    fused = np.zeros((nb, hkv, bs, wpad), np.float32)
    fused[..., :hs_qk] = k_b
    fused[..., hs_qk:hs_qk + hs_vo] = v_b
    out = ops.flash_attn_varlen_func(
        qj, jnp.asarray(fused, jnp.bfloat16), None, 1, cu_q, max(kv_lens),
        seqused_k=used_k, block_table=tbl, causal=True,
        softmax_scale=scale, kv_layout="fused", v_head_dim=hs_vo)
    assert out.shape == (2, 8, hs_vo)
    assert_allclose(np.asarray(out, np.float32),
                    np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)

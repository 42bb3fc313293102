"""KV-cache op tests (mirrors reference tests/test_cache.py,
test_indexer_k_quant_and_cache.py, test_cp_gather_indexer_k_quant_cache.py)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.utils import assert_allclose, keys, rand

NB, BS, H, HS = 8, 16, 4, 64


def random_slots(rng, n, with_pad=True):
    slots = rng.permutation(NB * BS)[:n].astype(np.int64)
    if with_pad:
        slots[0] = -1  # padding slot must be skipped
    return slots


@pytest.mark.parametrize("kv_cache_dtype", ["auto", "fp8"])
def test_reshape_and_cache_flash(kv_cache_dtype):
    rng = np.random.default_rng(0)
    k1, k2 = keys(0, 2)
    T = 24
    cache_dtype = jnp.bfloat16 if kv_cache_dtype == "auto" else jnp.float8_e4m3fn
    key = rand(k1, (T, H, HS), jnp.bfloat16)
    val = rand(k2, (T, H, HS), jnp.bfloat16)
    kc = jnp.zeros((NB, BS, H, HS), cache_dtype)
    vc = jnp.zeros((NB, BS, H, HS), cache_dtype)
    slots = random_slots(rng, T)
    scale = jnp.asarray([0.01], jnp.float32)
    kc2, vc2 = ops.reshape_and_cache_flash(
        key, val, kc, vc, jnp.asarray(slots), kv_cache_dtype, scale, scale
    )
    flat_k = np.asarray(kc2, np.float32).reshape(NB * BS, H, HS)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        expect = np.asarray(key, np.float32)[i]
        if kv_cache_dtype == "fp8":
            got = flat_k[s] * 0.01
            np.testing.assert_allclose(got, expect, rtol=0.1, atol=0.02)
        else:
            np.testing.assert_allclose(flat_k[s], expect, rtol=1e-2, atol=1e-2)
    # slot -1 must be dropped, not wrapped to the LAST slot (numpy -1
    # semantics) — regression test for the negative-slot sentinel
    written = {int(s) for s in slots if s >= 0}
    if (NB * BS - 1) not in written:
        assert np.all(flat_k[NB * BS - 1] == 0)


@pytest.mark.parametrize("kv_cache_dtype", ["auto", "fp8"])
@pytest.mark.parametrize("hs_v", [HS, 32])
def test_reshape_and_cache_tpu(kv_cache_dtype, hs_v):
    """TPU-native [nb, H, bs, hs] page layout; hs_v != hs covers the MLA
    split-head case.  Golden: per-token row placement + dropped padding."""
    import jax

    rng = np.random.default_rng(5)
    k1, k2 = keys(3, 2)
    T = 24
    cache_dtype = (jnp.bfloat16 if kv_cache_dtype == "auto"
                   else jnp.float8_e4m3fn)
    key = rand(k1, (T, H, HS), jnp.bfloat16)
    val = rand(k2, (T, H, hs_v), jnp.bfloat16)
    kc = jnp.zeros((NB, H, BS, HS), cache_dtype)
    vc = jnp.zeros((NB, H, BS, hs_v), cache_dtype)
    slots = random_slots(rng, T)
    scale = jnp.asarray([0.01], jnp.float32)
    kc2, vc2 = jax.jit(ops.reshape_and_cache_tpu, static_argnums=(5,))(
        key, val, kc, vc, jnp.asarray(slots), kv_cache_dtype, scale, scale)
    kn = np.asarray(kc2, np.float32)
    vn = np.asarray(vc2, np.float32)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        b, off = divmod(int(s), BS)
        ek = np.asarray(key, np.float32)[i]
        ev = np.asarray(val, np.float32)[i]
        if kv_cache_dtype == "fp8":
            np.testing.assert_allclose(kn[b, :, off] * 0.01, ek,
                                       rtol=0.1, atol=0.02)
            np.testing.assert_allclose(vn[b, :, off] * 0.01, ev,
                                       rtol=0.1, atol=0.02)
        else:
            np.testing.assert_allclose(kn[b, :, off], ek, rtol=1e-2,
                                       atol=1e-2)
            np.testing.assert_allclose(vn[b, :, off], ev, rtol=1e-2,
                                       atol=1e-2)
    # untouched slots stay zero (drop semantics for the -1 sentinel)
    written = {int(s) for s in slots if s >= 0}
    for s in range(NB * BS):
        if s not in written:
            b, off = divmod(s, BS)
            assert np.all(kn[b, :, off] == 0), (b, off)


def test_reshape_and_cache_legacy():
    rng = np.random.default_rng(1)
    k1, k2 = keys(1, 2)
    T, x = 10, 8
    key = rand(k1, (T, H, HS), jnp.float32)
    val = rand(k2, (T, H, HS), jnp.float32)
    kc = jnp.zeros((NB, H, HS // x, BS, x), jnp.float32)
    vc = jnp.zeros((NB, H, HS, BS), jnp.float32)
    slots = random_slots(rng, T)
    kc2, vc2 = ops.reshape_and_cache(key, val, kc, vc, jnp.asarray(slots))
    kn, vn = np.asarray(kc2), np.asarray(vc2)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        b, o = divmod(int(s), BS)
        np.testing.assert_allclose(
            kn[b, :, :, o, :].reshape(H, HS),
            np.asarray(key)[i].reshape(H, HS // x, x).reshape(H, HS),
            rtol=1e-6,
        )
        np.testing.assert_allclose(vn[b, :, :, o], np.asarray(val)[i], rtol=1e-6)


def test_concat_and_cache_mla():
    rng = np.random.default_rng(2)
    k1, k2 = keys(2, 2)
    T, rank, pe = 12, 64, 32
    kv_c = rand(k1, (T, rank), jnp.bfloat16)
    k_pe = rand(k2, (T, pe), jnp.bfloat16)
    cache = jnp.zeros((NB, BS, rank + pe), jnp.bfloat16)
    slots = random_slots(rng, T)
    out = ops.concat_and_cache_mla(kv_c, k_pe, cache, jnp.asarray(slots))
    on = np.asarray(out, np.float32).reshape(NB * BS, rank + pe)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        np.testing.assert_allclose(
            on[s],
            np.concatenate(
                [np.asarray(kv_c, np.float32)[i], np.asarray(k_pe, np.float32)[i]]
            ),
            rtol=1e-2, atol=1e-2,
        )


@pytest.mark.parametrize("use_seq_starts", [False, True])
def test_gather_cache(use_seq_starts):
    (k1,) = keys(3, 1)
    src = rand(k1, (NB, BS, 32), jnp.float32)
    # two seqs: lens 20, 9
    cu = jnp.asarray([0, 20, 29], jnp.int32)
    bt = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    starts = jnp.asarray([4, 0], jnp.int32) if use_seq_starts else None
    out = ops.gather_cache(src, bt, cu, 29, starts)
    sn = np.asarray(src)
    btn, cun = np.asarray(bt), np.asarray(cu)
    for tok in range(29):
        seq = 0 if tok < 20 else 1
        pos = tok - cun[seq] + (4 if (use_seq_starts and seq == 0) else 0)
        expect = sn[btn[seq, pos // BS], pos % BS]
        np.testing.assert_allclose(np.asarray(out)[tok], expect)


def test_gather_and_maybe_dequant_cache():
    (k1,) = keys(4, 1)
    src_f = rand(k1, (NB, BS, 32), jnp.float32)
    src = jnp.clip(src_f / 0.02, -448, 448).astype(jnp.float8_e4m3fn)
    cu = jnp.asarray([0, 10, 25], jnp.int32)
    bt = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    t2s = jnp.asarray([0] * 10 + [1] * 15, jnp.int32)
    out = ops.gather_and_maybe_dequant_cache(
        src, bt, cu, t2s, 25, "fp8", jnp.asarray([0.02], jnp.float32),
        out_dtype=jnp.float32,
    )
    sn = np.asarray(src, np.float32) * 0.02
    for tok in range(25):
        seq = 0 if tok < 10 else 1
        pos = tok - int(np.asarray(cu)[seq])
        expect = sn[np.asarray(bt)[seq, pos // BS], pos % BS]
        np.testing.assert_allclose(np.asarray(out)[tok], expect, rtol=1e-5)


def test_swap_blocks():
    (k1,) = keys(5, 1)
    src = rand(k1, (NB, BS, 8), jnp.float32)
    dst = jnp.zeros_like(src)
    mapping = jnp.asarray([[0, 3], [2, 5]], jnp.int32)
    out = ops.swap_blocks(src, dst, mapping)
    np.testing.assert_array_equal(np.asarray(out)[3], np.asarray(src)[0])
    np.testing.assert_array_equal(np.asarray(out)[5], np.asarray(src)[2])
    assert np.all(np.asarray(out)[0] == 0)


@pytest.mark.parametrize("scale_fmt", ["fp32", "ue8m0"])
def test_indexer_k_quant_and_cache(scale_fmt):
    rng = np.random.default_rng(6)
    (k1,) = keys(6, 1)
    T, hd, qb = 9, 128, 32
    k = rand(k1, (T, hd), jnp.bfloat16)
    kc = jnp.zeros((NB, BS, hd), jnp.float8_e4m3fn)
    sc = jnp.zeros((NB, BS, hd // qb), jnp.float32)
    slots = random_slots(rng, T, with_pad=False)
    kc2, sc2 = ops.indexer_k_quant_and_cache(
        k, kc, sc, jnp.asarray(slots), qb, scale_fmt
    )
    kn = np.asarray(kc2, np.float32).reshape(NB * BS, hd)
    sn = np.asarray(sc2).reshape(NB * BS, hd // qb)
    kf = np.asarray(k, np.float32)
    for i, s in enumerate(slots):
        amax = np.abs(kf[i].reshape(-1, qb)).max(-1)
        scale = np.maximum(amax, 1e-4) / 448.0
        if scale_fmt == "ue8m0":
            scale = np.exp2(np.ceil(np.log2(np.maximum(scale, 1e-10))))
        np.testing.assert_allclose(sn[s], scale, rtol=1e-6)
        deq = kn[s].reshape(-1, qb) * sn[s][:, None]
        np.testing.assert_allclose(deq, kf[i].reshape(-1, qb), rtol=0.1, atol=0.02)
    # roundtrip through the gather op
    cu = jnp.asarray([0, T], jnp.int32)
    bt = jnp.asarray([[int(s) // BS for s in slots] + [0] * (16 - T)], jnp.int32)
    # (gather assumes contiguous slots; just check it runs + shapes)
    gk, gs = ops.cp_gather_indexer_k_quant_cache(kc2, sc2, bt, cu, T)
    assert gk.shape == (T, hd) and gs.shape == (T, hd // qb)


def test_reshape_and_cache_tpu_prefill_matches_row_scatter():
    """Page-granular fresh-prefill writes == the row scatter on every
    slot that holds a real token (tail slots of a partial page may
    differ — they are masked by attention and overwritten by decode)."""
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    rng = np.random.default_rng(7)
    h, bs, hs = 4, 16, 64
    q_lens = [33, 16, 7]
    b = len(q_lens)
    mb = max(-(-ql // bs) for ql in q_lens)
    nb = sum(-(-ql // bs) for ql in q_lens) + 2
    t = sum(q_lens)
    key = jnp.asarray(rng.standard_normal((t, h, hs)), jnp.bfloat16)
    val = jnp.asarray(rng.standard_normal((t, h, hs)), jnp.bfloat16)
    kc = jnp.zeros((nb, h, bs, hs), jnp.bfloat16)
    vc = jnp.zeros((nb, h, bs, hs), jnp.bfloat16)

    tbl = np.zeros((b, mb), np.int32)
    nxt = 1
    slots = []
    for i, ql in enumerate(q_lens):
        nblk = -(-ql // bs)
        tbl[i, :nblk] = np.arange(nxt, nxt + nblk)
        for p in range(ql):
            slots.append(tbl[i, p // bs] * bs + p % bs)
        nxt += nblk
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    slots = jnp.asarray(slots, jnp.int32)

    kc_row, vc_row = ops.reshape_and_cache_tpu(key, val, kc, vc, slots)
    kc_pg, vc_pg = ops.reshape_and_cache_tpu_prefill(
        key, val, kc, vc, jnp.asarray(tbl), cu, max(q_lens))

    # compare on written token slots only
    for cache_row, cache_pg, src in ((kc_row, kc_pg, key),
                                     (vc_row, vc_pg, val)):
        row = np.asarray(cache_row, np.float32)
        pg = np.asarray(cache_pg, np.float32)
        tok = 0
        for i, ql in enumerate(q_lens):
            for p in range(ql):
                blk, off = tbl[i, p // bs], p % bs
                np.testing.assert_array_equal(pg[blk, :, off], row[blk, :, off])
                np.testing.assert_array_equal(
                    pg[blk, :, off],
                    np.asarray(src[tok], np.float32))
                tok += 1


@pytest.mark.parametrize("kv_cache_dtype", ["auto", "fp8"])
def test_reshape_and_cache_tpu_fused(kv_cache_dtype):
    """Fused [nb, H, bs, 2*hs] writes == the split-pair row scatter."""
    import jax

    rng = np.random.default_rng(9)
    k1, k2 = keys(11, 2)
    T = 24
    cache_dtype = (jnp.bfloat16 if kv_cache_dtype == "auto"
                   else jnp.float8_e4m3fn)
    key = rand(k1, (T, H, HS), jnp.bfloat16)
    val = rand(k2, (T, H, HS), jnp.bfloat16)
    slots = jnp.asarray(random_slots(rng, T))
    scale = jnp.asarray([0.01], jnp.float32)
    kvc = jnp.zeros((NB, H, BS, 2 * HS), cache_dtype)
    kvc2 = jax.jit(ops.reshape_and_cache_tpu_fused, static_argnums=(4,))(
        key, val, kvc, slots, kv_cache_dtype, scale, scale)
    kc, vc = (jnp.zeros((NB, H, BS, HS), cache_dtype),) * 2
    kc2, vc2 = ops.reshape_and_cache_tpu(
        key, val, kc, vc, slots, kv_cache_dtype, scale, scale)
    fused = np.asarray(kvc2, np.float32)
    np.testing.assert_array_equal(fused[..., :HS], np.asarray(kc2, np.float32))
    np.testing.assert_array_equal(fused[..., HS:], np.asarray(vc2, np.float32))


def test_reshape_and_cache_tpu_fused_unique_pages(impl, monkeypatch):
    """unique_pages (one row per page — the decode contract) routes to
    the Pallas page-window read-merge-write; bit-identical to the XLA
    row scatter, with sibling-window bytes preserved and negative slots
    skipped."""
    import jax

    rng = np.random.default_rng(21)
    k1, k2, k3 = keys(17, 3)
    b, h, bs, hs = 5, 2, 16, 128
    nb = b + 2
    key = rand(k1, (b, h, hs), jnp.bfloat16)
    val = rand(k2, (b, h, hs), jnp.bfloat16)
    # one slot per distinct page; one padding row
    slots = np.asarray([0 * bs + 3, 1 * bs + 15, 2 * bs + 0, 3 * bs + 8,
                        -1], np.int64)
    kvc = rand(k3, (nb, h, bs, 2 * hs), jnp.bfloat16)
    monkeypatch.setenv("VXK_CACHE_WINDOW_SCATTER", "1")
    ref = ops.reshape_and_cache_tpu_fused(
        key, val, kvc, jnp.asarray(slots), "auto")
    got = jax.jit(functools.partial(
        ops.reshape_and_cache_tpu_fused, kv_cache_dtype="auto",
        unique_pages=True))(key, val, kvc, jnp.asarray(slots))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_reshape_and_cache_tpu_prefill_fused():
    """Fused page-granular fresh-prefill writes == the split pair on all
    written token slots."""
    rng = np.random.default_rng(13)
    h, bs, hs = 4, 16, 64
    q_lens = [33, 16, 7]
    b = len(q_lens)
    mb = max(-(-ql // bs) for ql in q_lens)
    nb = sum(-(-ql // bs) for ql in q_lens) + 2
    t = sum(q_lens)
    key = jnp.asarray(rng.standard_normal((t, h, hs)), jnp.bfloat16)
    val = jnp.asarray(rng.standard_normal((t, h, hs)), jnp.bfloat16)

    tbl = np.zeros((b, mb), np.int32)
    nxt = 1
    for i, ql in enumerate(q_lens):
        nblk = -(-ql // bs)
        tbl[i, :nblk] = np.arange(nxt, nxt + nblk)
        nxt += nblk
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    kvc = ops.reshape_and_cache_tpu_prefill_fused(
        key, val, jnp.zeros((nb, h, bs, 2 * hs), jnp.bfloat16),
        jnp.asarray(tbl), cu, max(q_lens))
    kc, vc = ops.reshape_and_cache_tpu_prefill(
        key, val, jnp.zeros((nb, h, bs, hs), jnp.bfloat16),
        jnp.zeros((nb, h, bs, hs), jnp.bfloat16),
        jnp.asarray(tbl), cu, max(q_lens))
    fused = np.asarray(kvc, np.float32)
    for i, ql in enumerate(q_lens):
        for p in range(ql):
            blk, off = tbl[i, p // bs], p % bs
            np.testing.assert_array_equal(
                fused[blk, :, off, :hs], np.asarray(kc, np.float32)[blk, :, off])
            np.testing.assert_array_equal(
                fused[blk, :, off, hs:], np.asarray(vc, np.float32)[blk, :, off])

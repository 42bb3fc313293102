"""GDN attention tests (numpy port of reference
tests/gdn_attn/test_gdn_attn.py ``ref_gdn_attention`` golden: causal
depthwise conv + L2 norms + gated delta rule recurrence over mixed
prefill/decode varlen batches with initial states)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops

from tests.utils import assert_allclose


def np_softplus(x):
    return np.where(x > 20, x, np.log1p(np.exp(np.minimum(x, 20))))


def np_gdn_golden(qkvz, ba, conv_state, ssm_state, conv_w, conv_b,
                  A_log, dt_bias, qsl, state_idx, has_init,
                  nk, nv, hk, hv, activation="silu"):
    t_total = qkvz.shape[0]
    rep = nv // nk
    w = conv_w.shape[-1]
    eps, scale = 1e-6, 1.0 / math.sqrt(hk)
    qkvz_r = qkvz.reshape(t_total, nk, 2 * hk + 2 * rep * hv)
    q = qkvz_r[..., :hk].reshape(t_total, nk * hk)
    k = qkvz_r[..., hk:2 * hk].reshape(t_total, nk * hk)
    v = qkvz_r[..., 2 * hk:2 * hk + rep * hv].reshape(t_total, nk * rep * hv)
    z = qkvz_r[..., 2 * hk + rep * hv:].reshape(t_total, nv, hv)
    ba_r = ba.reshape(t_total, nk, 2 * rep)
    b = ba_r[..., :rep].reshape(t_total, nv)
    a = ba_r[..., rep:].reshape(t_total, nv)
    qkv = np.concatenate([q, k, v], -1)
    c = qkv.shape[-1]
    out = np.zeros((t_total, nv, hv), np.float32)
    conv_state = conv_state.copy()
    ssm_state = ssm_state.copy()
    A_exp = -np.exp(A_log)
    for bi in range(len(qsl) - 1):
        s0, e0 = qsl[bi], qsl[bi + 1]
        tb = e0 - s0
        cs = (conv_state[state_idx[bi]].copy() if has_init[bi]
              else np.zeros((w - 1, c), np.float32))
        xin = np.concatenate([cs, qkv[s0:e0]], 0)
        conv_state[state_idx[bi]] = xin[tb:]
        conv = np.stack([
            sum(xin[t + j, ch] * conv_w[ch, j] for j in range(w))
            for t in range(tb) for ch in range(c)
        ]).reshape(tb, c)
        if conv_b is not None:
            conv = conv + conv_b[None, :]
        if activation:
            conv = conv / (1 + np.exp(-conv)) * 1.0 if False else \
                conv * (1 / (1 + np.exp(-conv)))
        qo = conv[:, :nk * hk].reshape(tb, nk, hk)
        ko = conv[:, nk * hk:2 * nk * hk].reshape(tb, nk, hk)
        vo = conv[:, 2 * nk * hk:].reshape(tb, nv, hv)
        qo = qo / np.sqrt((qo ** 2).sum(-1, keepdims=True) + eps) * scale
        ko = ko / np.sqrt((ko ** 2).sum(-1, keepdims=True) + eps)
        if rep > 1:
            qo = np.repeat(qo, rep, 1)
            ko = np.repeat(ko, rep, 1)
        beta = 1 / (1 + np.exp(-b[s0:e0]))
        g = np.exp(A_exp * np_softplus(a[s0:e0] + dt_bias))
        S = (ssm_state[state_idx[bi]].astype(np.float32).copy()
             if has_init[bi] else np.zeros((nv, hv, hk), np.float32))
        for t in range(tb):
            S = S * g[t][:, None, None]
            kv_mem = np.einsum("vhk,vk->vh", S, ko[t])
            delta = (vo[t] - kv_mem) * beta[t][:, None]
            S = S + np.einsum("vh,vk->vhk", delta, ko[t])
            out[s0 + t] = np.einsum("vhk,vk->vh", S, qo[t])
        ssm_state[state_idx[bi]] = S
    return out, z, conv_state, ssm_state


@pytest.mark.parametrize("seq_lens,has_init", [
    ([5, 1, 3], [False, True, True]),
    ([1, 1], [True, True]),          # pure decode
    ([7], [False]),                  # pure prefill
    ([2, 2, 2], [True, True, False]),  # spec-decode style drafts
    # mixed spec-decode batch: long continuation + drafts + decode +
    # fresh prefill in one call (reference tests/gdn_attn mixed cases)
    ([33, 4, 1, 17], [True, True, True, False]),
    # long continued prefill crossing several 64-token chunks with a
    # carried-in state
    ([150], [True]),
])
def test_gdn_attention(seq_lens, has_init, impl):
    nk, nv, hk, hv, w = 2, 4, 16, 32, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    t_total = sum(seq_lens)
    n_state = 8
    rng = np.random.default_rng(0)
    qkvz = rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))).astype(np.float32) * 0.5
    ba = rng.standard_normal((t_total, nk * 2 * rep)).astype(np.float32)
    conv_state = rng.standard_normal((n_state, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal((n_state, nv, hv, hk)).astype(
        np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    conv_b = rng.standard_normal(c).astype(np.float32) * 0.1
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    state_idx = np.arange(len(seq_lens), dtype=np.int32) + 1
    has_init_np = np.asarray(has_init)

    g_out, g_z, g_cs, g_ss = np_gdn_golden(
        qkvz, ba, conv_state, ssm_state, conv_w, conv_b, A_log, dt_bias,
        qsl, state_idx, has_init_np, nk, nv, hk, hv)

    out, z, cs, ss = ops.gdn_attention(
        jnp.asarray(qkvz, jnp.bfloat16), jnp.asarray(ba, jnp.bfloat16),
        jnp.asarray(conv_state), jnp.asarray(ssm_state),
        jnp.asarray(conv_w), jnp.asarray(conv_b),
        jnp.asarray(A_log), jnp.asarray(dt_bias),
        jnp.asarray(qsl), jnp.asarray(state_idx),
        jnp.asarray(has_init_np),
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max(seq_lens))

    assert_allclose(out, g_out, rtol=4e-2,
                    atol=4e-2 * max(1.0, np.abs(g_out).max()))
    assert_allclose(z, g_z, rtol=2e-2, atol=2e-2)
    # states for touched slots match; untouched slots preserved
    assert_allclose(np.asarray(ss)[state_idx], g_ss[state_idx], rtol=4e-2,
                    atol=4e-2 * max(1.0, np.abs(g_ss).max()))
    assert_allclose(np.asarray(cs)[0], conv_state[0], rtol=0, atol=0)
    untouched_cs = g_cs[state_idx]
    got_cs = np.asarray(cs)[state_idx]
    # conv inputs pass through bf16 in our impl; compare loosely
    assert_allclose(got_cs, untouched_cs, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("pad_to", [12, 24])
def test_gdn_attention_padded_tail(pad_to, impl):
    """Padded leading dim: rows past query_start_loc[-1] are dead
    padding (jit bucketing pads token buffers to a captured size — the
    reference regression tests/gdn_attn/test_gdn_attn_padded.py for
    vllm-xpu-kernels#320, where num_actual_tokens < size(0) aborted).
    The active prefix must equal the unpadded call, the tail must stay
    finite, and untouched state slots must be preserved."""
    nk, nv, hk, hv, w = 2, 4, 16, 32, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    seq_lens, has_init = [5, 1, 3], [False, True, True]
    t_act = sum(seq_lens)
    n_state = 8
    rng = np.random.default_rng(11)
    qkvz = np.zeros((pad_to, nk * (2 * hk + 2 * rep * hv)), np.float32)
    qkvz[:t_act] = rng.standard_normal(qkvz[:t_act].shape) * 0.5
    ba = np.zeros((pad_to, nk * 2 * rep), np.float32)
    ba[:t_act] = rng.standard_normal(ba[:t_act].shape)
    conv_state = rng.standard_normal((n_state, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal((n_state, nv, hv, hk)).astype(
        np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    conv_b = rng.standard_normal(c).astype(np.float32) * 0.1
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    state_idx = np.arange(len(seq_lens), dtype=np.int32) + 1
    has_init_np = np.asarray(has_init)

    def run(rows):
        return ops.gdn_attention(
            jnp.asarray(qkvz[:rows], jnp.bfloat16),
            jnp.asarray(ba[:rows], jnp.bfloat16),
            jnp.asarray(conv_state), jnp.asarray(ssm_state),
            jnp.asarray(conv_w), jnp.asarray(conv_b),
            jnp.asarray(A_log), jnp.asarray(dt_bias),
            jnp.asarray(qsl), jnp.asarray(state_idx),
            jnp.asarray(has_init_np),
            num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
            max_seqlen=max(seq_lens))

    out_u, z_u, cs_u, ss_u = run(t_act)
    out_p, z_p, cs_p, ss_p = run(pad_to)
    assert out_p.shape[0] == pad_to
    assert_allclose(out_p[:t_act], out_u, rtol=1e-5, atol=1e-5)
    assert_allclose(z_p[:t_act], z_u, rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(out_p, np.float32)).all()
    assert_allclose(np.asarray(cs_p), np.asarray(cs_u), rtol=0, atol=0)
    assert_allclose(np.asarray(ss_p), np.asarray(ss_u), rtol=1e-5,
                    atol=1e-5)
    # slot 0 was never referenced by state_idx — bit-preserved
    assert_allclose(np.asarray(ss_p)[0], ssm_state[0], rtol=0, atol=0)


@pytest.mark.parametrize("nk,nv,hk,hv", [
    (4, 4, 32, 32),    # rep == 1 (no KV-head broadcast)
    (1, 4, 16, 16),    # single K head, wide broadcast
])
def test_gdn_attention_head_shapes(nk, nv, hk, hv, impl):
    """Head-configuration sweep over the mixed varlen path (reference
    tests/gdn_attn parametrizes num_heads/head dims the same way)."""
    seq_lens, has_init = [6, 1, 3], [True, True, False]
    w = 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    t_total = sum(seq_lens)
    rng = np.random.default_rng(2)
    qkvz = rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))).astype(np.float32) * 0.5
    ba = rng.standard_normal((t_total, nk * 2 * rep)).astype(np.float32)
    conv_state = rng.standard_normal((6, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal((6, nv, hv, hk)).astype(np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    conv_b = rng.standard_normal(c).astype(np.float32) * 0.1
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    state_idx = np.arange(len(seq_lens), dtype=np.int32) + 1
    hinit = np.asarray(has_init)
    g_out, g_z, g_cs, g_ss = np_gdn_golden(
        qkvz, ba, conv_state, ssm_state, conv_w, conv_b, A_log, dt_bias,
        qsl, state_idx, hinit, nk, nv, hk, hv)
    out, z, cs, ss = ops.gdn_attention(
        jnp.asarray(qkvz, jnp.bfloat16), jnp.asarray(ba, jnp.bfloat16),
        jnp.asarray(conv_state), jnp.asarray(ssm_state),
        jnp.asarray(conv_w), jnp.asarray(conv_b),
        jnp.asarray(A_log), jnp.asarray(dt_bias),
        jnp.asarray(qsl), jnp.asarray(state_idx), jnp.asarray(hinit),
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max(seq_lens))
    assert_allclose(out, g_out, rtol=4e-2,
                    atol=4e-2 * max(1.0, np.abs(g_out).max()))
    assert_allclose(z, g_z, rtol=2e-2, atol=2e-2)
    assert_allclose(np.asarray(ss)[state_idx], g_ss[state_idx], rtol=4e-2,
                    atol=4e-2 * max(1.0, np.abs(g_ss).max()))


@pytest.mark.parametrize("width", [2, 4])
@pytest.mark.parametrize("has_bias", [False, True])
@pytest.mark.parametrize("dtype", ["bfloat16", "float16"])
def test_gdn_attention_matrix(width, has_bias, dtype, impl):
    """Reference sweep axes beyond the mixed-batch cases: conv width
    {2,4} x bias {on,off} x input dtype {bf16,f16} over a mixed
    prefill/spec/decode batch (reference tests/gdn_attn/test_gdn_attn.py
    WIDTH/HAS_BIAS/DTYPES grids)."""
    nk, nv, hk, hv, w = 2, 4, 16, 32, width
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    seq_lens, has_init = [9, 2, 1], [False, True, True]
    t_total = sum(seq_lens)
    rng = np.random.default_rng(21 + width)
    qkvz = rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))).astype(np.float32) * 0.5
    ba = rng.standard_normal((t_total, nk * 2 * rep)).astype(np.float32)
    conv_state = rng.standard_normal((6, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal((6, nv, hv, hk)).astype(np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    conv_b = (rng.standard_normal(c).astype(np.float32) * 0.1
              if has_bias else None)
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    state_idx = np.arange(len(seq_lens), dtype=np.int32) + 1
    hinit = np.asarray(has_init)
    g_out, g_z, g_cs, g_ss = np_gdn_golden(
        qkvz, ba, conv_state, ssm_state, conv_w, conv_b, A_log, dt_bias,
        qsl, state_idx, hinit, nk, nv, hk, hv)
    jdt = jnp.dtype(dtype)
    out, z, cs, ss = ops.gdn_attention(
        jnp.asarray(qkvz, jdt), jnp.asarray(ba, jdt),
        jnp.asarray(conv_state), jnp.asarray(ssm_state),
        jnp.asarray(conv_w),
        None if conv_b is None else jnp.asarray(conv_b),
        jnp.asarray(A_log), jnp.asarray(dt_bias),
        jnp.asarray(qsl), jnp.asarray(state_idx), jnp.asarray(hinit),
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max(seq_lens))
    tol = 4e-2 if dtype == "bfloat16" else 2e-2
    assert_allclose(out, g_out, rtol=tol,
                    atol=tol * max(1.0, np.abs(g_out).max()))
    assert_allclose(z, g_z, rtol=tol, atol=tol)
    assert_allclose(np.asarray(ss)[state_idx], g_ss[state_idx], rtol=tol,
                    atol=tol * max(1.0, np.abs(g_ss).max()))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gdn_attention_randomized_spec_mixes(seed, impl):
    """Randomized spec-decode batch compositions (the reference's 937-LoC
    suite hammers prefill/decode/spec mixes; this is the property form):
    random mixes of long continuations, K-token draft windows, single
    decodes, and fresh prefills — chunked path vs the numpy recurrence."""
    rng = np.random.default_rng(100 + seed)
    nk, nv, hk, hv, w = 2, 4, 16, 32, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    kinds = rng.integers(0, 4, rng.integers(3, 7))
    seq_lens, has_init = [], []
    for kk in kinds:
        if kk == 0:
            seq_lens.append(int(rng.integers(30, 90)))   # continuation
            has_init.append(True)
        elif kk == 1:
            seq_lens.append(int(rng.integers(2, 6)))     # spec drafts
            has_init.append(True)
        elif kk == 2:
            seq_lens.append(1)                           # decode
            has_init.append(True)
        else:
            seq_lens.append(int(rng.integers(5, 40)))    # fresh prefill
            has_init.append(False)
    t_total = sum(seq_lens)
    qkvz = rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))).astype(np.float32) * 0.5
    ba = rng.standard_normal((t_total, nk * 2 * rep)).astype(np.float32)
    n_state = len(seq_lens) + 2
    conv_state = rng.standard_normal((n_state, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal(
        (n_state, nv, hv, hk)).astype(np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    conv_b = rng.standard_normal(c).astype(np.float32) * 0.1
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    perm = rng.permutation(n_state)[:len(seq_lens)].astype(np.int32)
    hinit = np.asarray(has_init)
    g_out, g_z, g_cs, g_ss = np_gdn_golden(
        qkvz, ba, conv_state, ssm_state, conv_w, conv_b, A_log, dt_bias,
        qsl, perm, hinit, nk, nv, hk, hv)
    out, z, cs, ss = ops.gdn_attention(
        jnp.asarray(qkvz, jnp.bfloat16), jnp.asarray(ba, jnp.bfloat16),
        jnp.asarray(conv_state), jnp.asarray(ssm_state),
        jnp.asarray(conv_w), jnp.asarray(conv_b),
        jnp.asarray(A_log), jnp.asarray(dt_bias),
        jnp.asarray(qsl), jnp.asarray(perm), jnp.asarray(hinit),
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max(seq_lens))
    assert_allclose(out, g_out, rtol=5e-2,
                    atol=5e-2 * max(1.0, np.abs(g_out).max()))
    assert_allclose(np.asarray(ss)[perm], g_ss[perm], rtol=5e-2,
                    atol=5e-2 * max(1.0, np.abs(g_ss).max()))


@pytest.mark.parametrize("seq_lens,chunk", [
    ([70, 1, 130], 64),   # crosses chunk boundaries, mixed batch
    ([64], 64),           # exact chunk
    ([5, 3], 4),          # tiny chunks
    ([256, 2, 2, 1], 64),  # long prefill + spec drafts + decode mix
])
def test_gdn_chunked_matches_scan(seq_lens, chunk, impl):
    """Chunked (WY-transform) delta rule == token scan."""
    nk, nv, hk, hv, w = 2, 4, 16, 32, 4
    rep = nv // nk
    c = nk * (2 * hk + rep * hv)
    t_total = sum(seq_lens)
    rng = np.random.default_rng(9)
    qkvz = rng.standard_normal(
        (t_total, nk * (2 * hk + 2 * rep * hv))).astype(np.float32) * 0.5
    ba = rng.standard_normal((t_total, nk * 2 * rep)).astype(np.float32)
    conv_state = rng.standard_normal((8, w - 1, c)).astype(np.float32)
    ssm_state = rng.standard_normal((8, nv, hv, hk)).astype(np.float32) * 0.3
    conv_w = rng.standard_normal((c, w)).astype(np.float32) * 0.3
    A_log = rng.standard_normal(nv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(nv).astype(np.float32) * 0.3
    qsl = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    sidx = np.arange(len(seq_lens), dtype=np.int32)
    hinit = np.asarray([True] * len(seq_lens))
    common = dict(
        num_k_heads=nk, num_v_heads=nv, head_k_dim=hk, head_v_dim=hv,
        max_seqlen=max(seq_lens))
    args = (jnp.asarray(qkvz, jnp.bfloat16), jnp.asarray(ba, jnp.bfloat16),
            jnp.asarray(conv_state), jnp.asarray(ssm_state),
            jnp.asarray(conv_w), None, jnp.asarray(A_log),
            jnp.asarray(dt_bias), jnp.asarray(qsl), jnp.asarray(sidx),
            jnp.asarray(hinit))
    o_scan, _, _, ss_scan = ops.gdn_attention(
        *args, algorithm="scan", **common)
    o_chunk, _, _, ss_chunk = ops.gdn_attention(
        *args, algorithm="chunk", chunk_size=chunk, **common)
    denom = max(1.0, float(np.abs(np.asarray(o_scan, np.float32)).max()))
    assert_allclose(o_chunk, np.asarray(o_scan, np.float32),
                    rtol=2e-2, atol=2e-2 * denom)
    sdenom = max(1.0, float(np.abs(np.asarray(ss_scan[sidx],
                                              np.float32)).max()))
    assert_allclose(np.asarray(ss_chunk)[sidx],
                    np.asarray(ss_scan, np.float32)[sidx],
                    rtol=2e-2, atol=2e-2 * sdenom)

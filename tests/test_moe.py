"""MoE stack tests (mirrors reference tests/test_topk.py,
test_grouped_topk.py, test_moe_align_block_size.py, test_moe_gather.py,
test_moe_sum.py, tests/fused_moe/ goldens)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu import ops
from vllm_xpu_kernels_tpu.quantization import pack_int4_splitk

from tests.conftest import scoped
from tests.utils import assert_allclose


def np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def np_topk_stable(scores, k):
    """descending stable top-k (reference stable_topk, topk_op.py:11-13)."""
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


@pytest.mark.parametrize("te", [(7, 8), (33, 64), (128, 256)])
@pytest.mark.parametrize("topk", [2, 4])
@pytest.mark.parametrize("renorm", [True, False])
@pytest.mark.parametrize("use_bias", [False, True])
def test_topk_softmax(te, topk, renorm, use_bias):
    t, e = te
    rng = np.random.default_rng(0)
    gating = rng.standard_normal((t, e)).astype(np.float32)
    bias = rng.standard_normal(e).astype(np.float32) if use_bias else None
    scores = np_softmax(gating)
    if bias is not None:
        _, ids = np_topk_stable(scores + bias, topk)
        w = np.take_along_axis(scores, ids, axis=-1)
    else:
        w, ids = np_topk_stable(scores, topk)
    if renorm:
        w = w / w.sum(-1, keepdims=True)
    ow, oi = ops.topk_softmax(
        jnp.asarray(gating), topk, renorm,
        None if bias is None else jnp.asarray(bias))
    assert_allclose(ow, w, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oi), ids)


def test_topk_sigmoid():
    rng = np.random.default_rng(1)
    gating = rng.standard_normal((17, 32)).astype(np.float32)
    scores = 1.0 / (1.0 + np.exp(-gating))
    w, ids = np_topk_stable(scores, 4)
    ow, oi = ops.topk_sigmoid(jnp.asarray(gating), 4, False)
    assert_allclose(ow, w, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oi), ids)


@pytest.mark.parametrize("scoring", ["softmax", "sigmoid"])
@pytest.mark.parametrize("use_bias", [False, True])
def test_grouped_topk(scoring, use_bias):
    """Golden: tests/ops/grouped_topk_op.py:11-67."""
    t, e, g, tg, k = 16, 64, 8, 3, 6
    rng = np.random.default_rng(2)
    gating = rng.standard_normal((t, e)).astype(np.float32)
    bias = (rng.standard_normal(e).astype(np.float32) * 0.1
            if use_bias else None)
    scores = (np_softmax(gating) if scoring == "softmax"
              else 1 / (1 + np.exp(-gating)))
    original = scores.copy()
    if bias is not None:
        scores = scores + bias
        grp = scores.reshape(t, g, e // g)
        gs = -np.sort(-grp, axis=-1)[:, :, :2].sum(-1)
    else:
        gs = scores.reshape(t, g, e // g).max(-1)
    gidx = np.argsort(-gs, axis=-1, kind="stable")[:, :tg]
    mask = np.zeros((t, g), bool)
    np.put_along_axis(mask, gidx, True, axis=1)
    smask = np.repeat(mask, e // g, axis=1)
    masked = np.where(smask, scores, -np.inf)
    ids = np.argsort(-masked, axis=-1, kind="stable")[:, :k]
    if bias is not None:
        w = np.take_along_axis(original, ids, axis=-1)
    else:
        w = np.take_along_axis(masked, ids, axis=-1)
    w = w / w.sum(-1, keepdims=True) * 2.5
    ow, oi = ops.grouped_topk(
        jnp.asarray(gating), k, True, g, tg, scoring, 2.5,
        None if bias is None else jnp.asarray(bias))
    # ids may tie-break differently within equal scores; compare weights sets
    assert_allclose(np.sort(np.asarray(ow), -1), np.sort(w, -1),
                    rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(oi), -1), np.sort(ids, -1))


@pytest.mark.parametrize("m,topk,e,bs", [
    (12, 3, 4, 4), (33, 2, 8, 16), (128, 4, 16, 32), (3, 2, 64, 16)])
def test_moe_align_block_size(m, topk, e, bs):
    rng = np.random.default_rng(3)
    topk_ids = np.stack([
        rng.choice(e, topk, replace=False) for _ in range(m)
    ]).astype(np.int32)
    sorted_ids, expert_ids, total = ops.moe_align_block_size(
        jnp.asarray(topk_ids), e, bs)
    sorted_ids = np.asarray(sorted_ids)
    expert_ids = np.asarray(expert_ids)
    total = int(np.asarray(total)[0])
    numel = m * topk
    flat = topk_ids.reshape(-1)
    cnt = np.bincount(flat, minlength=e)
    assert total == sum(-(-c // bs) * bs for c in cnt)
    assert total % bs == 0
    # every real slot appears exactly once; block experts consistent
    seen = sorted_ids[sorted_ids < numel]
    assert len(seen) == numel and len(set(seen.tolist())) == numel
    for blk in range(total // bs):
        eid = expert_ids[blk]
        for sid in sorted_ids[blk * bs:(blk + 1) * bs]:
            if sid < numel:
                assert flat[sid] == eid, (blk, sid, flat[sid], eid)


def test_moe_sum_and_expert_map():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((9, 3, 32)).astype(np.float32)
    assert_allclose(ops.moe_sum(jnp.asarray(x)), x.sum(1), rtol=1e-5,
                    atol=1e-5)
    em = np.asarray(ops.init_expert_map(4, 1, 3))
    exp = np.full(12, -1)
    exp[4:8] = [0, 1, 2, 3]
    np.testing.assert_array_equal(em, exp)


def _dense_moe_golden(x, w13, w2, tw, ti, act="silu", ep_map=None):
    """Dense per-token loop golden for the fused pipeline."""
    t, d = x.shape
    out = np.zeros((t, d), np.float32)
    for i in range(t):
        for j in range(ti.shape[1]):
            e_g = ti[i, j]
            e_l = ep_map[e_g] if ep_map is not None else e_g
            if e_l < 0:
                continue
            h = x[i].astype(np.float32) @ w13[e_l].astype(np.float32)
            half = h.shape[-1] // 2
            if act == "silu":
                a = h[:half] / (1 + np.exp(-h[:half])) * h[half:]
            else:
                raise ValueError(act)
            out[i] += tw[i, j] * (a @ w2[e_l].astype(np.float32))
    return out


@pytest.mark.parametrize("quant", ["none", "fp8_channel", "w8a8", "int4", "mxfp4"])
def test_tpu_fused_moe(quant, impl):
    t, d, inter, e, k = 24, 128, 256, 8, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = rng.standard_normal((t, e)).astype(np.float32)
    tw, ti = ops.topk_softmax(jnp.asarray(gating), k, True)
    tw_np, ti_np = np.asarray(tw), np.asarray(ti)

    w13f = rng.standard_normal((e, d, 2 * inter)).astype(np.float32) * 0.1
    w2f = rng.standard_normal((e, inter, d)).astype(np.float32) * 0.1
    g = 128
    kwargs = {}
    if quant == "none":
        w13, w2 = jnp.asarray(w13f, jnp.bfloat16), jnp.asarray(w2f, jnp.bfloat16)
        w13_dq, w2_dq = np.asarray(w13, np.float32), np.asarray(w2, np.float32)
    elif quant == "fp8_channel":
        s13 = np.abs(w13f).max(1) / 448 + 1e-8     # [E, 2I]
        s2 = np.abs(w2f).max(1) / 448 + 1e-8
        w13 = jnp.asarray(w13f / s13[:, None, :], jnp.float8_e4m3fn)
        w2 = jnp.asarray(w2f / s2[:, None, :], jnp.float8_e4m3fn)
        w13_dq = np.asarray(w13, np.float32) * s13[:, None, :]
        w2_dq = np.asarray(w2, np.float32) * s2[:, None, :]
        kwargs = dict(w13_scales=jnp.asarray(s13), w2_scales=jnp.asarray(s2))
    elif quant == "w8a8":
        s13 = np.abs(w13f).max(1) / 127 + 1e-8     # [E, 2I]
        s2 = np.abs(w2f).max(1) / 127 + 1e-8
        w13 = jnp.asarray(np.clip(np.round(w13f / s13[:, None, :]),
                                  -127, 127), jnp.int8)
        w2 = jnp.asarray(np.clip(np.round(w2f / s2[:, None, :]),
                                 -127, 127), jnp.int8)
        w13_dq = np.asarray(w13, np.float32) * s13[:, None, :]
        w2_dq = np.asarray(w2, np.float32) * s2[:, None, :]
        kwargs = dict(w13_scales=jnp.asarray(s13), w2_scales=jnp.asarray(s2))
    elif quant in ("int4", "mxfp4"):
        if quant == "int4":
            codes13 = rng.integers(0, 16, (e, d, 2 * inter), dtype=np.uint8)
            codes2 = rng.integers(0, 16, (e, inter, d), dtype=np.uint8)
            s13 = rng.random((e, d // g, 2 * inter)).astype(np.float32) * 0.1 + 0.02
            s2 = rng.random((e, inter // g, d)).astype(np.float32) * 0.1 + 0.02
            w13_dq = (codes13.astype(np.float32) - 8) * np.repeat(s13, g, 1)
            w2_dq = (codes2.astype(np.float32) - 8) * np.repeat(s2, g, 1)
        else:
            from vllm_xpu_kernels_tpu.utils import quant_math as qm
            g = 32
            vals13 = rng.standard_normal((e, d, 2 * inter)).astype(np.float32)
            vals2 = rng.standard_normal((e, inter, d)).astype(np.float32)
            codes13 = np.asarray(qm.fp4_e2m1_encode(jnp.asarray(
                np.clip(vals13, -6, 6))), np.uint8)
            codes2 = np.asarray(qm.fp4_e2m1_encode(jnp.asarray(
                np.clip(vals2, -6, 6))), np.uint8)
            s13 = np.exp2(rng.integers(-3, 1, (e, d // g, 2 * inter))).astype(np.float32)
            s2 = np.exp2(rng.integers(-3, 1, (e, inter // g, d))).astype(np.float32)
            dec13 = np.asarray(qm.fp4_e2m1_decode(jnp.asarray(codes13)), np.float32)
            dec2 = np.asarray(qm.fp4_e2m1_decode(jnp.asarray(codes2)), np.float32)
            w13_dq = dec13 * np.repeat(s13, g, 1)
            w2_dq = dec2 * np.repeat(s2, g, 1)
        w13 = jnp.asarray(np.stack(
            [pack_int4_splitk(codes13[i], g) for i in range(e)]))
        w2 = jnp.asarray(np.stack(
            [pack_int4_splitk(codes2[i], g) for i in range(e)]))
        kwargs = dict(w13_scales=jnp.asarray(s13), w2_scales=jnp.asarray(s2),
                      group_size=g)

    out = ops.tpu_fused_moe(
        x, w13, w2, tw, ti,
        quant=quant if quant != "fp8_channel" else "fp8_channel",
        activation="silu", block_m=32, **kwargs)
    golden = _dense_moe_golden(np.asarray(x, np.float32), w13_dq, w2_dq,
                               tw_np, ti_np)
    tol = {"none": 2e-2, "fp8_channel": 4e-2, "w8a8": 4e-2, "int4": 4e-2,
           "mxfp4": 4e-2}[quant]
    assert_allclose(out, golden, rtol=tol,
                    atol=tol * max(1.0, np.abs(golden).max()))


def test_tpu_fused_moe_w8a8_bias(impl):
    """w8a8 fused MoE WITH per-expert biases (the GPT-OSS transcode
    serving path): GEMM1 bias folds after the channel+token scales,
    GEMM2 bias applies before the routing weight via the kernel's
    pre-bias row-scale slot ((acc*chan*a_s + b) * w)."""
    t, d, inter, e, k = 24, 128, 256, 8, 2
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    tw, ti = ops.topk_softmax(
        jnp.asarray(rng.standard_normal((t, e)), jnp.float32), k, True)
    w13f = rng.standard_normal((e, d, 2 * inter)).astype(np.float32) * 0.1
    w2f = rng.standard_normal((e, inter, d)).astype(np.float32) * 0.1
    b13 = rng.standard_normal((e, 2 * inter)).astype(np.float32) * 0.05
    b2 = rng.standard_normal((e, d)).astype(np.float32) * 0.05
    s13 = np.abs(w13f).max(1) / 127 + 1e-8
    s2 = np.abs(w2f).max(1) / 127 + 1e-8
    w13 = jnp.asarray(np.clip(np.round(w13f / s13[:, None, :]),
                              -127, 127), jnp.int8)
    w2 = jnp.asarray(np.clip(np.round(w2f / s2[:, None, :]),
                             -127, 127), jnp.int8)
    w13_dq = np.asarray(w13, np.float32) * s13[:, None, :]
    w2_dq = np.asarray(w2, np.float32) * s2[:, None, :]
    out = ops.tpu_fused_moe(
        x, w13, w2, tw, ti, quant="w8a8",
        w13_scales=jnp.asarray(s13), w2_scales=jnp.asarray(s2),
        w13_bias=jnp.asarray(b13), w2_bias=jnp.asarray(b2),
        activation="silu", block_m=32)
    # dense golden with biases
    tw_np, ti_np = np.asarray(tw), np.asarray(ti)
    xf = np.asarray(x, np.float32)
    golden = np.zeros((t, d), np.float32)
    for i in range(t):
        for j in range(k):
            ee = ti_np[i, j]
            h = xf[i] @ w13_dq[ee] + b13[ee]
            a = h[:inter] / (1 + np.exp(-h[:inter])) * h[inter:]
            golden[i] += tw_np[i, j] * (a @ w2_dq[ee] + b2[ee])
    assert_allclose(out, golden, rtol=5e-2,
                    atol=5e-2 * max(1.0, np.abs(golden).max()))


def _np_qdq_group_fp8(x, g, ue8m0):
    """Numpy twin of ops.per_token_group_fp8_quant qdq (e4m3, per-row
    K-group scales, optional UE8M0 pow2 rounding)."""
    import ml_dtypes

    m, n = x.shape
    xg = x.astype(np.float32).reshape(m, n // g, g)
    absmax = np.maximum(np.abs(xg).max(-1), 1e-10)
    s = np.maximum(absmax / 448.0, 1.0 / (448.0 * 512.0))
    if ue8m0:
        s = np.exp2(np.ceil(np.log2(np.maximum(s, 1e-10))))
    q = np.clip(xg / s[..., None], -448, 448).astype(
        ml_dtypes.float8_e4m3fn).astype(np.float32)
    return (q * s[..., None]).reshape(m, n)


def _np_qdq_tensor_fp8(x, absmax):
    """Numpy twin of ops.dynamic_scaled_fp8_quant qdq (per-tensor e4m3;
    ``absmax`` passed in so the caller controls the amax population)."""
    import ml_dtypes

    s = max(absmax / 448.0, 1.0 / (448.0 * 512.0))
    q = np.clip(x.astype(np.float32) / s, -448, 448).astype(
        ml_dtypes.float8_e4m3fn).astype(np.float32)
    return q * s


@pytest.mark.parametrize("quant", ["mxfp8", "fp8_block", "mxfp4_fp8"])
def test_tpu_fused_moe_fp8_recipes(quant, impl):
    """The reference's remaining fused-MoE recipes: mxfp8 (fp8 weights +
    UE8M0 32-group scales, mxfp8-qdq acts), block-fp8 ([K/128, N/128] f32
    weight scales, per-128-group-qdq acts), mxfp4_fp8 (mxfp4 weights,
    per-tensor-fp8-qdq acts).  Reference detection + ref impl:
    fused_moe_interface.py:33-60, ref_moe_utils.py:166-250."""
    from vllm_xpu_kernels_tpu.utils import quant_math as qm

    t, d, inter, e, k = 24, 128, 256, 8, 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = rng.standard_normal((t, e)).astype(np.float32)
    tw, ti = ops.topk_softmax(jnp.asarray(gating), k, True)
    tw_np, ti_np = np.asarray(tw), np.asarray(ti)
    w13f = rng.standard_normal((e, d, 2 * inter)).astype(np.float32) * 0.1
    w2f = rng.standard_normal((e, inter, d)).astype(np.float32) * 0.1

    kwargs = {}
    if quant == "mxfp8":
        import ml_dtypes

        g = 32
        s13 = np.exp2(rng.integers(-6, -2, (e, d // g, 2 * inter))
                      ).astype(np.float32)
        s2 = np.exp2(rng.integers(-6, -2, (e, inter // g, d))
                     ).astype(np.float32)
        q13 = (w13f / np.repeat(s13, g, 1)).astype(ml_dtypes.float8_e4m3fn)
        q2 = (w2f / np.repeat(s2, g, 1)).astype(ml_dtypes.float8_e4m3fn)
        w13, w2 = jnp.asarray(q13), jnp.asarray(q2)
        w13_dq = q13.astype(np.float32) * np.repeat(s13, g, 1)
        w2_dq = q2.astype(np.float32) * np.repeat(s2, g, 1)
        # scales ride as UE8M0 exponent BYTES (the MX storage format)
        kwargs = dict(
            w13_scales=jnp.asarray(qm.e8m0_encode(jnp.asarray(s13))),
            w2_scales=jnp.asarray(qm.e8m0_encode(jnp.asarray(s2))),
            group_size=g)
        qdq = lambda a: _np_qdq_group_fp8(a, 32, True)
    elif quant == "fp8_block":
        import ml_dtypes

        gb = 128
        s13 = (rng.random((e, d // gb, 2 * inter // gb)) * 0.1
               + 0.02).astype(np.float32)
        s2 = (rng.random((e, inter // gb, d // gb)) * 0.1
              + 0.02).astype(np.float32)
        ex13 = np.repeat(np.repeat(s13, gb, 1), gb, 2)
        ex2 = np.repeat(np.repeat(s2, gb, 1), gb, 2)
        q13 = np.clip(w13f / ex13, -448, 448).astype(
            ml_dtypes.float8_e4m3fn)
        q2 = np.clip(w2f / ex2, -448, 448).astype(ml_dtypes.float8_e4m3fn)
        w13, w2 = jnp.asarray(q13), jnp.asarray(q2)
        w13_dq = q13.astype(np.float32) * ex13
        w2_dq = q2.astype(np.float32) * ex2
        kwargs = dict(w13_scales=jnp.asarray(s13),
                      w2_scales=jnp.asarray(s2), group_size=gb)
        qdq = lambda a: _np_qdq_group_fp8(a, 128, False)
    else:   # mxfp4_fp8: mxfp4 weights, per-tensor fp8 act qdq
        g = 32
        vals13 = rng.standard_normal((e, d, 2 * inter)).astype(np.float32)
        vals2 = rng.standard_normal((e, inter, d)).astype(np.float32)
        codes13 = np.asarray(qm.fp4_e2m1_encode(jnp.asarray(
            np.clip(vals13, -6, 6))), np.uint8)
        codes2 = np.asarray(qm.fp4_e2m1_encode(jnp.asarray(
            np.clip(vals2, -6, 6))), np.uint8)
        s13 = np.exp2(rng.integers(-3, 1, (e, d // g, 2 * inter))
                      ).astype(np.float32)
        s2 = np.exp2(rng.integers(-3, 1, (e, inter // g, d))
                     ).astype(np.float32)
        w13_dq = np.asarray(qm.fp4_e2m1_decode(jnp.asarray(codes13)),
                            np.float32) * np.repeat(s13, g, 1)
        w2_dq = np.asarray(qm.fp4_e2m1_decode(jnp.asarray(codes2)),
                           np.float32) * np.repeat(s2, g, 1)
        w13 = jnp.asarray(np.stack(
            [pack_int4_splitk(codes13[i], g) for i in range(e)]))
        w2 = jnp.asarray(np.stack(
            [pack_int4_splitk(codes2[i], g) for i in range(e)]))
        kwargs = dict(w13_scales=jnp.asarray(s13),
                      w2_scales=jnp.asarray(s2), group_size=g)
        qdq = None   # per-tensor amax handled in the golden loop below

    out = ops.tpu_fused_moe(
        x, w13, w2, tw, ti, quant=quant, activation="silu", block_m=32,
        **kwargs)

    # golden with the act qdq applied exactly as the op contract states
    xf = np.asarray(x, np.float32)
    if quant == "mxfp4_fp8":
        x_qdq = _np_qdq_tensor_fp8(xf, np.abs(xf).max())
        # per-tensor GEMM2 amax is over ALL routed-slot activations
        acts = {}
        for i in range(t):
            for j in range(k):
                h = x_qdq[i] @ w13_dq[ti_np[i, j]]
                a = h[:inter] / (1 + np.exp(-h[:inter])) * h[inter:]
                acts[(i, j)] = a
        amax2 = max(np.abs(a).max() for a in acts.values())
        golden = np.zeros((t, d), np.float32)
        for (i, j), a in acts.items():
            golden[i] += tw_np[i, j] * (
                _np_qdq_tensor_fp8(a, amax2) @ w2_dq[ti_np[i, j]])
    else:
        x_qdq = qdq(xf)
        golden = np.zeros((t, d), np.float32)
        for i in range(t):
            for j in range(k):
                h = x_qdq[i] @ w13_dq[ti_np[i, j]]
                a = h[:inter] / (1 + np.exp(-h[:inter])) * h[inter:]
                a = qdq(a[None, :])[0]
                golden[i] += tw_np[i, j] * (a @ w2_dq[ti_np[i, j]])

    tol = 6e-2
    assert_allclose(out, golden, rtol=tol,
                    atol=tol * max(1.0, np.abs(golden).max()))


def test_tpu_fused_moe_ep(impl):
    """EP: only local experts contribute on this rank."""
    t, d, inter, e_g, k = 12, 64, 128, 8, 2
    e_local, ep_rank, ep_size = 4, 1, 2
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = rng.standard_normal((t, e_g)).astype(np.float32)
    tw, ti = ops.topk_softmax(jnp.asarray(gating), k, True)
    w13 = jnp.asarray(rng.standard_normal((e_local, d, 2 * inter)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e_local, inter, d)) * 0.1,
                     jnp.bfloat16)
    out = ops.tpu_fused_moe(
        x, w13, w2, tw, ti, quant="none", activation="silu",
        num_experts=e_g, ep_rank=ep_rank, ep_size=ep_size, block_m=32)
    ep_map = np.asarray(ops.init_expert_map(e_local, ep_rank, ep_size))
    golden = _dense_moe_golden(
        np.asarray(x, np.float32), np.asarray(w13, np.float32),
        np.asarray(w2, np.float32), np.asarray(tw), np.asarray(ti),
        ep_map=ep_map)
    assert_allclose(out, golden, rtol=2e-2,
                    atol=2e-2 * max(1.0, np.abs(golden).max()))


@pytest.mark.parametrize("with_scale_bias", [False, True])
def test_grouped_gemm_standalone(with_scale_bias, impl):
    r_per = [5, 0, 9, 2]
    e, k_dim, n = 4, 64, 96
    r = sum(r_per)
    rng = np.random.default_rng(7)
    a = rng.standard_normal((r, k_dim)).astype(np.float32) * 0.5
    b = rng.standard_normal((e, k_dim, n)).astype(np.float32) * 0.5
    sc = rng.random(e).astype(np.float32) + 0.5 if with_scale_bias else None
    bias = (rng.standard_normal((e, n)).astype(np.float32) * 0.1
            if with_scale_bias else None)
    golden = np.zeros((r, n), np.float32)
    start = 0
    for ei, cnt in enumerate(r_per):
        blk = a[start:start + cnt] @ b[ei]
        if with_scale_bias:
            blk = blk * sc[ei] + bias[ei]
        golden[start:start + cnt] = blk
        start += cnt
    out = ops.grouped_gemm(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
        jnp.asarray(r_per, jnp.int32),
        scales=None if sc is None else jnp.asarray(sc),
        bias=None if bias is None else jnp.asarray(bias),
        out_dtype=jnp.float32)
    assert_allclose(out, golden, rtol=2e-2,
                    atol=2e-2 * max(1.0, np.abs(golden).max()))


def test_remap_gather_roundtrip():
    t, d, e, k = 10, 32, 6, 3
    rng = np.random.default_rng(8)
    x = rng.standard_normal((t, d)).astype(np.float32)
    ti = np.stack([rng.choice(e, k, replace=False) for _ in range(t)]
                  ).astype(np.int32)
    tw = rng.random((t, k)).astype(np.float32)
    remapped, rpe, inv, _ = ops.remap_hidden_states(
        jnp.asarray(x), jnp.asarray(ti), e, e)
    assert int(np.asarray(rpe).sum()) == t * k
    # identity "expert compute": gather back should reproduce weighted sums
    out = ops.moe_gather(remapped, jnp.asarray(tw), inv, e)
    golden = (x[:, None, :] * tw[:, :, None]).sum(1)
    assert_allclose(out, golden, rtol=1e-4, atol=1e-4)


def test_batched_moe_align_block_size():
    mtb, bs = 16, 8
    ent = np.asarray([3, 0, 16, 9], np.int32)
    sorted_ids, expert_ids, total = ops.batched_moe_align_block_size(
        mtb, bs, jnp.asarray(ent))
    sorted_ids = np.asarray(sorted_ids)
    expert_ids = np.asarray(expert_ids)
    total = int(np.asarray(total)[0])
    assert total == sum(-(-int(c) // bs) * bs for c in ent)
    numel = len(ent) * mtb
    for blk in range(total // bs):
        eid = expert_ids[blk]
        for sid in sorted_ids[blk * bs:(blk + 1) * bs]:
            if sid < numel:
                assert sid // mtb == eid
                assert sid % mtb < ent[eid]
    valid = sorted_ids[sorted_ids < numel]
    assert len(valid) == int(ent.sum())
    assert len(set(valid.tolist())) == len(valid)


def test_fused_moe_mxfp4_ue8m0_byte_scales(impl):
    """UE8M0 exponent-BYTE scales (the MX spec / released-checkpoint
    storage) == the expanded bf16 pow2 scales through the fused
    pipeline on both tiers (in-kernel shift+bitcast decode)."""
    from vllm_xpu_kernels_tpu.utils import quant_math as qm

    rng = np.random.default_rng(17)
    t, d, inter, e, k, g = 16, 64, 64, 4, 2, 32
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    w13 = jnp.asarray(rng.integers(-128, 128, (e, d // 2, 2 * inter),
                                   dtype=np.int8))
    w2 = jnp.asarray(rng.integers(-128, 128, (e, inter // 2, d),
                                  dtype=np.int8))
    s13 = jnp.exp2(jnp.asarray(
        rng.integers(-6, 3, (e, d // g, 2 * inter)), jnp.float32))
    s2 = jnp.exp2(jnp.asarray(
        rng.integers(-6, 3, (e, inter // g, d)), jnp.float32))
    tw, ti = ops.topk_softmax(jnp.asarray(
        rng.standard_normal((t, e)), jnp.float32), k, True)

    def run(s13v, s2v):
        return np.asarray(ops.tpu_fused_moe(
            x, w13, w2, tw, ti.astype(jnp.int32), quant="mxfp4",
            w13_scales=s13v, w2_scales=s2v, group_size=g), np.float32)

    ref = run(s13v=s13.astype(jnp.bfloat16), s2v=s2.astype(jnp.bfloat16))
    got = run(s13v=qm.e8m0_encode(s13), s2v=qm.e8m0_encode(s2))
    np.testing.assert_allclose(got, ref, rtol=2e-2,
                               atol=2e-2 * max(1.0, np.abs(ref).max()))
    # codec round-trip is exact on the pow2 grid
    np.testing.assert_array_equal(
        np.asarray(qm.e8m0_decode(qm.e8m0_encode(s13))), np.asarray(s13))

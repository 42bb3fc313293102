"""Distributed-layer tests on the virtual 8-device CPU mesh: ring context
parallelism (LSE-merge composition) and Megatron-TP model equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tests.utils import assert_allclose


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal, impl):
    from vllm_xpu_kernels_tpu.parallel import ring_attention

    n_dev = min(4, len(jax.devices()))
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("cp",))
    t_local, h, d = 16, 4, 32
    t = t_local * n_dev
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    scale = d ** -0.5

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "cp", scale=scale,
                                       causal=causal),
        mesh=mesh, in_specs=(P("cp"), P("cp"), P("cp")),
        out_specs=P("cp"), check_rep=False)
    out = jax.jit(ring)(q, k, v)

    # dense golden
    logits = np.einsum("qhd,khd->hqk", np.asarray(q) * scale, np.asarray(k))
    if causal:
        qpos = np.arange(t)[:, None]
        kpos = np.arange(t)[None, :]
        logits = np.where((kpos > qpos)[None], -np.inf, logits)
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    sm = p / p.sum(-1, keepdims=True)
    golden = np.einsum("hqk,khd->qhd", sm, np.asarray(v))
    tol = 1e-4 if impl == "ref" else 8e-3   # kernel tier: bf16 matmuls
    assert_allclose(out, golden, rtol=tol, atol=tol)


def test_ring_attention_long_context(monkeypatch):
    """32k-token ring CP prefill on the Pallas kernel path.  The golden
    is dense attention for a SAMPLE of q rows (the last rows of every
    shard — the rows that see the most ring blocks); a full 32k x 32k
    dense golden would need ~8 GB."""
    monkeypatch.setenv("VXK_FORCE_PALLAS", "1")
    from vllm_xpu_kernels_tpu.parallel import ring_attention

    n_dev = min(4, len(jax.devices()))
    t_local, h, d = 32768 // n_dev, 1, 64
    t = t_local * n_dev
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("cp",))
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((t, h, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((t, h, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((t, h, d)) * 0.3, jnp.bfloat16)
    scale = d ** -0.5
    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "cp", scale=scale,
                                       causal=True),
        mesh=mesh, in_specs=(P("cp"), P("cp"), P("cp")),
        out_specs=P("cp"), check_rep=False)
    out = np.asarray(jax.jit(ring)(q, k, v), np.float32)

    rows = np.concatenate([np.arange((i + 1) * t_local - 8,
                                     (i + 1) * t_local)
                           for i in range(n_dev)])
    qf = np.asarray(q, np.float32)[rows]
    kf, vf = np.asarray(k, np.float32), np.asarray(v, np.float32)
    logits = np.einsum("qhd,khd->hqk", qf * scale, kf)
    mask = np.arange(t)[None, :] > rows[:, None]
    logits = np.where(mask[None], -np.inf, logits)
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    golden = np.einsum("hqk,khd->qhd", p / p.sum(-1, keepdims=True), vf)
    assert_allclose(out[rows], golden, rtol=2e-2, atol=2e-2)


def test_cp_paged_decode_matches_single(monkeypatch):
    """Context-parallel paged decode: KV tokens split across shards
    (each with its own page pool), per-shard paged_decode partials
    LSE-merged with collectives == single-pool decode.  Includes a
    shard holding ZERO tokens of one sequence."""
    from vllm_xpu_kernels_tpu.parallel import cp_paged_decode
    from vllm_xpu_kernels_tpu import ops

    n_dev = 4
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("cp",))
    b, hq, hkv, d, bs = 3, 4, 2, 64, 16
    kv_lens = [173, 61, 15]    # seq 2 fits on one shard => empty shards
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((b, hq, d)) * 0.5, jnp.bfloat16)

    # full per-seq KV, split contiguously across shards
    full_k = [rng.standard_normal((kv, hkv, d)).astype(np.float32) * 0.5
              for kv in kv_lens]
    full_v = [rng.standard_normal((kv, hkv, d)).astype(np.float32) * 0.5
              for kv in kv_lens]
    mb = max(-(-kv // bs) for kv in kv_lens)
    nb_shard = b * mb + 1

    caches, tables, useds = [], [], []
    for s in range(n_dev):
        cache = np.zeros((nb_shard, hkv, bs, 2 * d), np.float32)
        tbl = np.zeros((b, mb), np.int32)
        used = np.zeros((b,), np.int32)
        nxt = 1
        for i, kv in enumerate(kv_lens):
            per = -(-kv // n_dev)
            lo, hi = min(s * per, kv), min((s + 1) * per, kv)
            used[i] = hi - lo
            for j in range(0, hi - lo, bs):
                blk = nxt
                nxt += 1
                tbl[i, j // bs] = blk
                chunk_k = full_k[i][lo + j: min(lo + j + bs, hi)]
                chunk_v = full_v[i][lo + j: min(lo + j + bs, hi)]
                n_t = chunk_k.shape[0]
                cache[blk, :, :n_t, :d] = chunk_k.transpose(1, 0, 2)
                cache[blk, :, :n_t, d:] = chunk_v.transpose(1, 0, 2)
        caches.append(cache)
        tables.append(tbl)
        useds.append(used)
    caches = jnp.asarray(np.stack(caches), jnp.bfloat16)
    tables = jnp.asarray(np.stack(tables))
    useds = jnp.asarray(np.stack(useds))
    scale = d ** -0.5

    f = shard_map(
        lambda c, t_, u: cp_paged_decode(
            q, c[0], None, u[0], t_[0], "cp",
            max_seqlen_k=mb * bs, scale=scale),
        mesh=mesh, in_specs=(P("cp"), P("cp"), P("cp")),
        out_specs=P(), check_rep=False)
    out = jax.jit(f)(caches, tables, useds)

    # golden: single-pool decode over each seq's full KV
    nb_full = b * (max(-(-kv // bs) for kv in kv_lens)) * n_dev + 1
    cache_f = np.zeros((nb_full, hkv, bs, 2 * d), np.float32)
    tbl_f = np.zeros((b, mb * n_dev), np.int32)
    nxt = 1
    for i, kv in enumerate(kv_lens):
        for j in range(0, kv, bs):
            blk = nxt
            nxt += 1
            tbl_f[i, j // bs] = blk
            ck = full_k[i][j: j + bs]
            cv = full_v[i][j: j + bs]
            cache_f[blk, :, :ck.shape[0], :d] = ck.transpose(1, 0, 2)
            cache_f[blk, :, :ck.shape[0], d:] = cv.transpose(1, 0, 2)
    golden = ops.flash_attn_varlen_func(
        q, jnp.asarray(cache_f, jnp.bfloat16), None, 1,
        jnp.arange(b + 1, dtype=jnp.int32), mb * n_dev * bs,
        seqused_k=jnp.asarray(kv_lens, jnp.int32),
        block_table=jnp.asarray(tbl_f), causal=True, softmax_scale=scale,
        kv_layout="fused")
    assert_allclose(np.asarray(out, np.float32),
                    np.asarray(golden, np.float32), rtol=2e-2, atol=2e-2)


def test_tp_model_matches_single_device():
    """shard_mapped TP decode step == single-device decode step."""
    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, init_kv_cache, decode_step)
    from vllm_xpu_kernels_tpu.models.llama import (
        param_tp_specs, kv_cache_tp_spec, params_for_tp)
    from vllm_xpu_kernels_tpu.parallel import make_mesh

    tp = 4
    cfg = LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=256, vocab_size=512,
        max_position=256, quant="none", block_size=16)
    cfg_local = cfg.tp_slice(tp)
    params = init_params(cfg, jax.random.PRNGKey(0))
    nb = 8
    kc, vc = init_kv_cache(cfg, nb)
    b, kv_len = 2, 20
    tok = jnp.asarray([3, 5], jnp.int32)
    kv_lens = jnp.full((b,), kv_len, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray([[0, 1, 0, 0], [2, 3, 0, 0]], jnp.int32)
    slots = jnp.asarray([16 + 3, 3 * 16 + 3], jnp.int32)
    max_k = 64

    ref_logits, _, _ = decode_step(
        cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=max_k)

    mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    pspecs = param_tp_specs(cfg)
    cspec = kv_cache_tp_spec()
    rep = P()

    def step(p, tok, pos, slots, tbl, kvl, kc, vc):
        logits, kc2, vc2 = decode_step(
            cfg_local, p, tok, pos, slots, tbl, kvl, kc, vc,
            max_seqlen_k=max_k, tp_axis="tp")
        return logits

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, rep, rep, rep, rep, rep, cspec, cspec),
        out_specs=rep, check_rep=False)
    kc2, vc2 = init_kv_cache(cfg, nb)
    tp_logits = jax.jit(sharded)(
        params_for_tp(params, cfg, tp), tok, positions, slots, tbl,
        kv_lens, kc2, vc2)
    assert_allclose(tp_logits, np.asarray(ref_logits, np.float32),
                    rtol=3e-2, atol=3e-1)


def test_tp_prefill_overlap_flag(monkeypatch):
    """VXK_TP_OVERLAP wires parallel/overlap's chunked row-parallel
    schedule into the TP prefill path: logits stay EXACT vs the
    unchunked step, and the compiled HLO carries more all-reduce ops
    (the C-1 overlap windows the latency-hiding scheduler needs —
    docs/overlap_design.md; VERDICT weak #5)."""
    import re

    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, init_kv_cache, prefill_step)
    from vllm_xpu_kernels_tpu.models.llama import (
        param_tp_specs, kv_cache_tp_spec, params_for_tp)
    from vllm_xpu_kernels_tpu.parallel import make_mesh

    tp = 4
    cfg = LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=256, vocab_size=512,
        max_position=512, quant="none", block_size=16)
    cfg_local = cfg.tp_slice(tp)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    lens = [160, 160]                      # 320 rows >= overlap threshold
    t = sum(lens)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, t), jnp.int32)
    positions = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32) for n in lens])
    cu_q = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    nb_per = -(-max(lens) // cfg.block_size)
    tbl = jnp.asarray(
        np.arange(2 * nb_per).reshape(2, nb_per).astype(np.int32))
    slots = jnp.concatenate([
        tbl[i, positions[cu_q[i]:cu_q[i + 1]] // cfg.block_size]
        * cfg.block_size + positions[cu_q[i]:cu_q[i + 1]]
        % cfg.block_size for i in range(2)])
    kv_lens = jnp.asarray(lens, jnp.int32)
    nb = 2 * nb_per

    mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    pspecs = param_tp_specs(cfg)
    cspec = kv_cache_tp_spec()
    rep = P()

    def step(p, tok, pos, cu, slots, tbl, kvl, kc, vc):
        logits, _, _ = prefill_step(
            cfg_local, p, tok, pos, cu, slots, tbl, kvl, kc, vc,
            max_seqlen_q=160, max_seqlen_k=160, tp_axis="tp",
            fresh_prefill=True)
        return logits

    sharded = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, rep, rep, rep, rep, rep, rep, cspec, cspec),
        out_specs=rep, check_rep=False))
    p_tp = params_for_tp(params, cfg, tp)

    def run():
        kc, vc = init_kv_cache(cfg, nb)
        args = (p_tp, tok, positions, cu_q, slots, tbl, kv_lens, kc, vc)
        compiled = sharded.lower(*args).compile()
        out = np.asarray(compiled(*args), np.float32)
        n_ar = len(re.findall(r"all-reduce", compiled.as_text()))
        return out, n_ar

    base, ar_off = run()
    monkeypatch.setenv("VXK_TP_OVERLAP", "4")
    sharded.clear_cache()
    chunked, ar_on = run()
    assert_allclose(chunked, base, rtol=2e-3, atol=2e-3)
    assert ar_on > ar_off, (ar_on, ar_off)


def test_ep_fused_moe_matches_single_device():
    """shard_mapped expert-parallel MoE == single-device fused MoE."""
    from vllm_xpu_kernels_tpu import ops
    from vllm_xpu_kernels_tpu.parallel import ep_fused_moe

    ep = 4
    t_local, d, inter, e_total, k = 8, 64, 128, 8, 2
    e_local = e_total // ep
    t = t_local * ep
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = jnp.asarray(rng.standard_normal((t, e_total)).astype(np.float32))
    tw, ti = ops.topk_softmax(gating, k, True)
    w13 = jnp.asarray(rng.standard_normal((e_total, d, 2 * inter)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e_total, inter, d)) * 0.1,
                     jnp.bfloat16)

    golden = ops.tpu_fused_moe(x, w13, w2, tw, ti, quant="none",
                               activation="silu", block_m=32)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    f = shard_map(
        lambda x, w13, w2, tw, ti: ep_fused_moe(
            x, w13, w2, tw, ti, "ep", block_m=32),
        mesh=mesh,
        in_specs=(P("ep"), P("ep"), P("ep"), P("ep"), P("ep")),
        out_specs=P("ep"), check_rep=False)
    out = jax.jit(f)(x, w13, w2, tw, ti)
    assert_allclose(out, np.asarray(golden, np.float32), rtol=3e-2,
                    atol=3e-2 * max(1.0, np.abs(np.asarray(golden)).max()))


@pytest.mark.parametrize("capacity", ["exact", 16])
@pytest.mark.parametrize("quant", ["none", "w8a8"])
def test_ep_fused_moe_a2a_matches_gather(quant, capacity):
    """a2a token dispatch == gather strategy == single-device fused MoE.

    capacity=16 == t_local*k here, i.e. the exact worst case — identical
    results with the bucketed send layout exercised; capacity="exact"
    takes the lossless path explicitly (the None default is the
    capacity-factor heuristic, tested separately with balanced
    routing)."""
    from vllm_xpu_kernels_tpu import ops
    from vllm_xpu_kernels_tpu.parallel import ep_fused_moe

    ep = 8
    t_local, d, inter, e_total, k = 8, 64, 128, 16, 2
    t = t_local * ep
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = jnp.asarray(rng.standard_normal((t, e_total)).astype(np.float32))
    tw, ti = ops.topk_softmax(gating, k, True)
    w13 = jnp.asarray(rng.standard_normal((e_total, d, 2 * inter)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e_total, inter, d)) * 0.1,
                     jnp.bfloat16)
    if quant == "w8a8":
        def q8(wt):
            s = (jnp.max(jnp.abs(wt.astype(jnp.float32)), axis=1)
                 / 127.0 + 1e-8)
            qw = jnp.clip(jnp.round(wt.astype(jnp.float32) / s[:, None]),
                          -127, 127).astype(jnp.int8)
            return qw, s.astype(jnp.float32)
        w13, s13 = q8(w13)
        w2, s2 = q8(w2)
    else:
        s13 = jnp.zeros((e_total, 1), jnp.float32)   # placeholder shard
        s2 = jnp.zeros((e_total, 1), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))

    def run(strategy):
        f = shard_map(
            lambda x, w13, w2, tw, ti, s13, s2: ep_fused_moe(
                x, w13, w2, tw, ti, "ep", quant=quant, block_m=32,
                strategy=strategy, capacity=capacity,
                **(dict(w13_scales=s13, w2_scales=s2)
                   if quant == "w8a8" else {})),
            mesh=mesh,
            in_specs=(P("ep"),) * 7,
            out_specs=P("ep"), check_rep=False)
        return np.asarray(jax.jit(f)(x, w13, w2, tw, ti, s13, s2),
                          np.float32)

    got = run("a2a")
    ref = run("gather")
    # same per-expert kernels, different f32 summation order only
    assert_allclose(got, ref, rtol=2e-2,
                    atol=2e-2 * max(1.0, np.abs(ref).max()))


def test_ep_a2a_capacity_drop():
    """Overflow slots beyond capacity are dropped deterministically:
    with capacity 1 and every token routed to the same expert, only the
    first slot per (src rank, dst rank) contributes."""
    from vllm_xpu_kernels_tpu.parallel import ep_fused_moe

    ep = 4
    t_local, d, inter, e_total = 4, 32, 64, 4
    t = t_local * ep
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    w13 = jnp.asarray(rng.standard_normal((e_total, d, 2 * inter)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e_total, inter, d)) * 0.1,
                     jnp.bfloat16)
    ti = jnp.zeros((t, 1), jnp.int32)           # all to expert 0 (rank 0)
    tw = jnp.ones((t, 1), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))

    def run(capacity):
        f = shard_map(
            lambda x, w13, w2, tw, ti: ep_fused_moe(
                x, w13, w2, tw, ti, "ep", block_m=32,
                strategy="a2a", capacity=capacity),
            mesh=mesh,
            in_specs=(P("ep"), P("ep"), P("ep"), P("ep"), P("ep")),
            out_specs=P("ep"), check_rep=False)
        return np.asarray(jax.jit(f)(x, w13, w2, tw, ti), np.float32)

    full = run("exact")
    capped = run(1)
    # first token of each rank's shard survives, the rest are dropped
    kept = np.arange(t) % t_local == 0
    np.testing.assert_allclose(capped[kept], full[kept], rtol=1e-5)
    np.testing.assert_array_equal(capped[~kept], 0.0)


def test_ep_a2a_default_capacity_and_dropped_count():
    """The DEFAULT capacity is the ceil(cf*K*T/ep) heuristic
    (VXK_EP_A2A_CF=1.25): with perfectly balanced round-robin routing
    nothing drops and the result matches the exact-capacity path;
    ``return_dropped`` surfaces the overflow count, and a capacity of 1
    under skewed routing reports exactly the expected number of dropped
    slots."""
    from vllm_xpu_kernels_tpu.parallel import ep_fused_moe

    ep = 4
    t_local, d, inter, e_total, k = 8, 32, 64, 8, 2
    t = t_local * ep
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    w13 = jnp.asarray(rng.standard_normal((e_total, d, 2 * inter)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e_total, inter, d)) * 0.1,
                     jnp.bfloat16)
    # balanced routing: token i -> experts (2i, 2i+1) mod e_total, so
    # each rank sends exactly K*T_local/ep = 4 slots per destination,
    # under the default capacity ceil(1.25*16/4) = 5
    ti = ((jnp.arange(t)[:, None] * k + jnp.arange(k)[None, :])
          % e_total).astype(jnp.int32)
    tw = jnp.full((t, k), 0.5, jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))

    def body(capacity):
        def f(x, w13, w2, tw, ti):
            o, dr = ep_fused_moe(
                x, w13, w2, tw, ti, "ep", block_m=32, strategy="a2a",
                capacity=capacity, return_dropped=True)
            return o, dr[None]           # rank-0 scalar -> per-rank lane
        return f

    def run(capacity):
        f = shard_map(
            body(capacity), mesh=mesh,
            in_specs=(P("ep"),) * 5,
            out_specs=(P("ep"), P("ep")), check_rep=False)
        out, dr = jax.jit(f)(x, w13, w2, tw, ti)
        return np.asarray(out, np.float32), np.asarray(dr)

    got, dropped = run(None)
    ref, dropped_exact = run("exact")
    np.testing.assert_array_equal(dropped, 0)
    np.testing.assert_array_equal(dropped_exact, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # skewed: every slot to expert 0 -> per rank K*T_local slots to rank
    # 0, capacity 1 keeps one -> dropped = K*T_local - 1 per rank
    ti0 = jnp.zeros((t, k), jnp.int32)
    f = shard_map(
        body(1), mesh=mesh,
        in_specs=(P("ep"),) * 5,
        out_specs=(P("ep"), P("ep")), check_rep=False)
    _, dr = jax.jit(f)(x, w13, w2, tw, ti0)
    np.testing.assert_array_equal(np.asarray(dr), k * t_local - 1)


def test_gpipe_llama_stages():
    """REAL-MODEL pipeline parallelism: Llama decoder layers (RMSNorm +
    RoPE + flash attention + gated MLP, real init_params weights) as
    GPipe stages over the pp mesh axis; microbatches are whole packed
    sequences with non-paged causal attention.  Golden: the model's own
    prefill_step on a fresh paged cache."""
    from vllm_xpu_kernels_tpu.models import (
        LlamaConfig, init_params, init_kv_cache)
    from vllm_xpu_kernels_tpu.models.llama import (
        prefill_step, _rope_cache)
    from vllm_xpu_kernels_tpu import ops
    from vllm_xpu_kernels_tpu.parallel import (
        AXIS_PP, gpipe_apply, stack_stage_params)

    n_stages = 4
    devs = np.array(jax.devices()[:n_stages])
    mesh = Mesh(devs, (AXIS_PP,))
    cfg = LlamaConfig(
        hidden_size=128, num_layers=8, num_q_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=256, vocab_size=512,
        max_position=256, quant="none", block_size=16, kv_fused=False)
    params = init_params(cfg, jax.random.PRNGKey(3))
    seq, m_batches = 24, 4
    rng = np.random.default_rng(11)
    toks = rng.integers(0, cfg.vocab_size, (m_batches, seq))
    rope = _rope_cache(cfg)
    pos = jnp.arange(seq, dtype=jnp.int32)
    cu1 = jnp.asarray([0, seq], jnp.int32)

    def layer_fwd(lp, x):
        """One llama decoder layer on a single packed sequence (pre-norm
        residual form matching models/llama._forward_tokens, non-paged
        attention)."""
        hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
        h = ops.rms_norm(x, lp["ln1"], cfg.rms_eps)
        qkv = jnp.dot(h, lp["wqkv"]["w"],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        q = qkv[:, : hq * d]
        k = qkv[:, hq * d: (hq + hkv) * d]
        v = qkv[:, (hq + hkv) * d:]
        q, k = ops.rotary_embedding(pos, q, k, d, rope, is_neox=True)
        attn = ops.flash_attn_varlen_func(
            q.reshape(seq, hq, d), k.reshape(seq, hkv, d),
            v.reshape(seq, hkv, d), seq, cu1, seq, cu_seqlens_k=cu1,
            causal=True)
        x = x + jnp.dot(attn.reshape(seq, hq * d), lp["wo"]["w"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
        h2 = ops.rms_norm(x, lp["ln2"], cfg.rms_eps)
        gu = jnp.dot(h2, lp["wgu"]["w"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
        act = ops.silu_and_mul(gu)
        return x + jnp.dot(act, lp["wd"]["w"],
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)

    def stage_fn(stage_params, x):
        for i in range(cfg.num_layers // n_stages):
            lp = jax.tree.map(lambda a: a[i], stage_params)
            x = layer_fwd(lp, x)
        return x

    stacked = stack_stage_params(params["layers"], n_stages)
    xs = jnp.take(params["embed"], jnp.asarray(toks), axis=0)

    f = shard_map(
        lambda sp, x: gpipe_apply(
            stage_fn, jax.tree.map(lambda a: a[0], sp), x, AXIS_PP),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(AXIS_PP), stacked), P()),
        out_specs=P(), check_rep=False)
    hidden = jax.jit(f)(stacked, xs)                     # [M, seq, E]
    hidden = ops.rms_norm(hidden.reshape(-1, cfg.hidden_size),
                          params["final_ln"], cfg.rms_eps)
    logits_pp = jnp.dot(hidden, params["embed"].T,
                        preferred_element_type=jnp.float32
                        ).reshape(m_batches, seq, -1)

    # golden: the model's own prefill on fresh paged caches, per batch
    for bi in range(m_batches):
        kc, vc = init_kv_cache(cfg, num_blocks=seq // cfg.block_size + 2)
        tbl = jnp.arange(1, seq // cfg.block_size + 2, dtype=jnp.int32
                         )[None, :]
        slots = (jnp.arange(seq, dtype=jnp.int32) // cfg.block_size + 1
                 ) * cfg.block_size + jnp.arange(seq) % cfg.block_size
        lg, _, _ = prefill_step(
            cfg, params, jnp.asarray(toks[bi]), pos, cu1, slots, tbl,
            jnp.asarray([seq], jnp.int32), kc, vc,
            max_seqlen_q=seq, max_seqlen_k=2 * cfg.block_size)
        assert_allclose(np.asarray(logits_pp[bi], np.float32),
                        np.asarray(lg, np.float32), rtol=3e-2, atol=3e-2)



@pytest.mark.parametrize("n_stages,m", [(2, 4), (4, 4), (4, 1)])
def test_gpipe_pipeline_matches_sequential(n_stages, m):
    """Stage-sharded GPipe pipeline == sequential layer stack."""
    from vllm_xpu_kernels_tpu.parallel import (
        gpipe_apply, stack_stage_params)

    mb, d = 8, 32
    layers_per_stage = 2
    n_layers = n_stages * layers_per_stage
    rng = np.random.default_rng(0)
    per_layer = [
        {"w": jnp.asarray(rng.standard_normal((d, d)) * (d ** -0.5),
                          jnp.float32),
         "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)}
        for _ in range(n_layers)
    ]
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)

    def layer(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    # sequential golden
    golden = x
    for p in per_layer:
        golden = jax.vmap(lambda h: layer(p, h))(golden)

    stacked = stack_stage_params(per_layer, n_stages)  # [S, Lps, ...]
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pp",))

    def stage_fn(stage_p, h):
        for li in range(layers_per_stage):
            h = layer(jax.tree.map(lambda a: a[li], stage_p), h)
        return h

    def run(stacked, x):
        my = jax.tree.map(lambda a: a[0], stacked)  # this stage's params
        return gpipe_apply(stage_fn, my, x, "pp")

    f = shard_map(
        run, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), stacked), P()),
        out_specs=P(), check_rep=False)
    out = jax.jit(f)(stacked, x)
    assert_allclose(out, np.asarray(golden), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_stages,m", [(2, 4), (4, 6), (4, 1)])
def test_one_f_one_b_matches_sequential_grads(n_stages, m):
    """1F1B pipeline loss + per-stage grads == jax.grad of the sequential
    stack (forward AND backward stream through the stage ring)."""
    from vllm_xpu_kernels_tpu.parallel import (
        one_f_one_b_grads, stack_stage_params)

    mb, d = 8, 32
    layers_per_stage = 2
    n_layers = n_stages * layers_per_stage
    rng = np.random.default_rng(1)
    per_layer = [
        {"w": jnp.asarray(rng.standard_normal((d, d)) * (d ** -0.5),
                          jnp.float32),
         "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)}
        for _ in range(n_layers)
    ]
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)

    def layer(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    def loss_fn(act, y_mb):
        return jnp.mean((act - y_mb) ** 2)

    # sequential golden loss + grads over the stacked stage params
    stacked = stack_stage_params(per_layer, n_stages)  # [S, Lps, ...]

    def stage_fn(stage_p, h):
        for li in range(layers_per_stage):
            h = layer(jax.tree.map(lambda a: a[li], stage_p), h)
        return h

    def seq_loss(stacked_p):
        total = 0.0
        for mi in range(m):
            h = x[mi]
            for si in range(n_stages):
                h = stage_fn(jax.tree.map(lambda a: a[si], stacked_p), h)
            total = total + loss_fn(h, y[mi])
        return total

    golden_loss, golden_grads = jax.value_and_grad(seq_loss)(stacked)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pp",))

    def run(stacked_p, x, y):
        my = jax.tree.map(lambda a: a[0], stacked_p)
        loss, g = one_f_one_b_grads(stage_fn, my, x, y, loss_fn, "pp")
        return loss, jax.tree.map(lambda a: a[None], g)

    f = shard_map(
        run, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), stacked), P(), P()),
        out_specs=(P(), jax.tree.map(lambda _: P("pp"), stacked)),
        check_rep=False)
    loss, grads = jax.jit(f)(stacked, x, y)
    assert_allclose(np.asarray(loss), np.asarray(golden_loss),
                    rtol=1e-5, atol=1e-6)
    for ga, gb in zip(jax.tree.leaves(grads), jax.tree.leaves(golden_grads)):
        assert_allclose(np.asarray(ga), np.asarray(gb),
                        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("window,sink", [((7, -1), False), ((-1, -1), True),
                                         ((5, -1), True)])
def test_ring_attention_window_sink(window, sink):
    """Ring CP with GPT-OSS-style sliding window and attention sinks ==
    dense softmax with the sink column (sink enters the normalizer
    exactly once, regardless of ring size)."""
    from vllm_xpu_kernels_tpu.parallel import ring_attention

    n_dev = min(4, len(jax.devices()))
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("cp",))
    t_local, h, d = 8, 4, 32
    t = t_local * n_dev
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, h, d)) * 0.5, jnp.float32)
    s = (jnp.asarray(rng.standard_normal((h,)), jnp.float32)
         if sink else None)
    scale = d ** -0.5

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "cp", scale=scale,
                                       causal=True, window=window, sink=s),
        mesh=mesh, in_specs=(P("cp"), P("cp"), P("cp")),
        out_specs=P("cp"), check_rep=False)
    out = jax.jit(ring)(q, k, v)

    logits = np.einsum("qhd,khd->hqk", np.asarray(q) * scale, np.asarray(k))
    qpos = np.arange(t)[:, None]
    kpos = np.arange(t)[None, :]
    mask = kpos > qpos
    if window[0] >= 0:
        mask = mask | (kpos < qpos - window[0])
    logits = np.where(mask[None], -np.inf, logits)
    if sink:
        logits = np.concatenate(
            [logits, np.broadcast_to(np.asarray(s)[:, None, None],
                                     (h, t, 1))], axis=-1)
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    sm = p / p.sum(-1, keepdims=True)
    if sink:
        sm = sm[..., :-1]
    golden = np.einsum("hqk,khd->qhd", sm, np.asarray(v))
    assert_allclose(out, golden, rtol=1e-4, atol=1e-4)


def test_overlap_primitives_exact():
    """Chunked row-parallel psum and ring all-gather-matmul == their
    monolithic formulations (the overlap restructure changes only the
    collective/compute interleaving, never the math)."""
    from vllm_xpu_kernels_tpu.parallel import (
        row_parallel_matmul_overlapped, allgather_matmul_overlapped)

    tp = 4
    t, k, n = 16, 64, 96
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))

    # row-parallel: x cols and w rows sharded over tp
    f = shard_map(
        lambda xl, wl: row_parallel_matmul_overlapped(xl, wl, "tp", 4),
        mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(), check_rep=False)
    got = np.asarray(jax.jit(f)(x, w))
    ref = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # all-gather-matmul: tokens sharded, weight replicated
    g = shard_map(
        lambda xl, wl: allgather_matmul_overlapped(xl, wl, "tp"),
        mesh=mesh, in_specs=(P("tp", None), P(None, None)),
        out_specs=P(), check_rep=False)
    got2 = np.asarray(jax.jit(g)(x, w))
    np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-5)

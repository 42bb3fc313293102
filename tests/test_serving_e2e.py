"""End-to-end serving integration: prefill + incremental paged decode must
reproduce full-prefill logits (cache write / block tables / attention /
model plumbing all consistent), plus block-manager lifecycle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.models import (
    LlamaConfig, init_params, init_kv_cache, decode_step, prefill_step)
from vllm_xpu_kernels_tpu.models.runtime import (
    BlockManager, build_decode_batch, build_prefill_batch)

from tests.utils import assert_allclose


CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=128, quant="none", block_size=16)


def _full_prefill_logits(params, tokens_per_seq):
    """Teacher-forcing golden: prefill each full sequence in a fresh cache;
    return last-token logits per seq."""
    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    prompts = {i: np.asarray(t, np.int64)
               for i, t in enumerate(tokens_per_seq)}
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(mgr, prompts)
    max_q = -(-max_q // 8) * 8
    logits, _, _ = prefill_step(
        CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc,
        max_seqlen_q=max_q, max_seqlen_k=-(-max_k // 16) * 16)
    return np.asarray(logits, np.float32)[np.asarray(cu_q[1:]) - 1]


def test_incremental_decode_matches_full_prefill():
    params = init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    prompt_lens = [13, 30, 5]
    prompts = {i: rng.integers(0, CFG.vocab_size, n).astype(np.int64)
               for i, n in enumerate(prompt_lens)}
    n_steps = 6

    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(mgr, prompts)
    max_q = -(-max_q // 8) * 8
    logits, kc, vc = prefill_step(
        CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc,
        max_seqlen_q=max_q, max_seqlen_k=48)
    last = np.asarray(logits, np.float32)[np.asarray(cu_q[1:]) - 1]
    next_tok = last.argmax(-1).astype(np.int64)
    gen = {i: [int(next_tok[i])] for i in seq_ids}

    for _ in range(n_steps):
        batch = build_decode_batch(mgr, seq_ids, next_tok, max_blocks=4)
        logits, kc, vc = decode_step(
            CFG, params, jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
            kc, vc, max_seqlen_k=64)
        next_tok = np.asarray(logits, np.float32).argmax(-1).astype(np.int64)
        for i in seq_ids:
            gen[i].append(int(next_tok[i]))

    # teacher-forced golden: full prefill over prompt + generated prefix
    # must predict the same next token at every step
    for step in range(n_steps):
        seqs = [np.concatenate([prompts[i], gen[i][:step + 1]])
                for i in seq_ids]
        golden_logits = _full_prefill_logits(params, seqs)
        golden_next = golden_logits.argmax(-1)
        got_next = [gen[i][step + 1] if step + 1 < len(gen[i]) else None
                    for i in seq_ids]
        for i in seq_ids:
            if got_next[i] is not None:
                assert got_next[i] == int(golden_next[i]), (
                    step, i, got_next[i], int(golden_next[i]))


def test_block_manager_lifecycle():
    mgr = BlockManager(8, 16)
    mgr.allocate(0, 40)          # 3 blocks
    mgr.allocate(1, 16)          # 1 block
    assert len(mgr.free) == 4
    assert not mgr.can_allocate(16 * 5)
    mgr.release(0)
    assert len(mgr.free) == 7
    mgr.allocate(2, 100)         # 7 blocks
    assert len(mgr.free) == 0
    with pytest.raises(AssertionError):
        mgr.allocate(3, 1)


def test_mixtral_decode_and_ep():
    """Mixtral MoE decode step runs and the EP-sharded variant matches."""
    from vllm_xpu_kernels_tpu.models import mixtral as MX
    from vllm_xpu_kernels_tpu.models import init_kv_cache
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    cfg = MX.MixtralConfig(
        hidden_size=64, num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128,
        max_position=64, quant="none", block_size=16,
        num_experts=4, top_k=2)
    params = MX.init_params(cfg, jax.random.PRNGKey(3))
    kc, vc = init_kv_cache(cfg, 16)
    b = 4
    tok = jnp.asarray([1, 2, 3, 4], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)

    logits, kc2, vc2 = MX.decode_step(
        cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32)
    assert logits.shape == (b, cfg.vocab_size)
    assert not bool(jnp.isnan(logits).any())

    # EP over 4 devices: experts sharded, everything else replicated
    ep = 4
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    cfg_local = cfg.ep_slice(ep)

    def spec_tree(params):
        def leaf_spec(path_leaf):
            return P()
        specs = jax.tree.map(lambda _: P(), params)
        for lp in specs["layers"]:
            lp["w13"] = {k: P("ep") for k in lp["w13"]}
            lp["w2"] = {k: P("ep") for k in lp["w2"]}
        return specs

    pspecs = spec_tree(params)
    rep = P()

    def step(p, tok, pos, slots, tbl, kvl, kc, vc):
        logits, _, _ = MX.decode_step(
            cfg_local, p, tok, pos, slots, tbl, kvl, kc, vc,
            max_seqlen_k=32, ep_axis="ep")
        return logits

    # batch must be divisible by ep for the gather/scatter; replicate kv
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, P("ep"), P("ep"), P("ep"), P("ep"), P("ep"),
                  rep, rep),
        out_specs=P("ep"), check_rep=False)
    kc3, vc3 = init_kv_cache(cfg, 16)
    ep_logits = jax.jit(sharded)(
        params, tok, positions, slots, tbl, kv_lens, kc3, vc3)
    assert_allclose(ep_logits, np.asarray(logits, np.float32),
                    rtol=3e-2, atol=3e-1)


@pytest.mark.parametrize("quant", ["fp8", "int8", "w8a8", "w4a8", "mxfp4"])
def test_quantized_model_decode(quant, impl):
    """Every weight recipe runs the decode step with finite logits close
    to the unquantized model (Qwen2-style MXFP4 path included)."""
    cfg_q = LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=256, vocab_size=256,
        max_position=128, quant=quant, block_size=16)
    params = init_params(cfg_q, jax.random.PRNGKey(7))
    kc, vc = init_kv_cache(cfg_q, 16)
    b = 2
    tok = jnp.asarray([5, 9], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)
    logits, _, _ = decode_step(
        cfg_q, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32)
    assert logits.shape == (b, cfg_q.vocab_size)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize("quant", ["w8a8", "fp8-int8"])
def test_decode_fused_argmax_matches_logits(quant, impl):
    """head_mode='argmax' (fused int8 lm_head + greedy argmax, no [B, V]
    logits round trip) emits exactly argmax(logits) in both tiers."""
    cfg_q = LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=256, vocab_size=300,
        max_position=128, quant=quant, block_size=16)
    params = init_params(cfg_q, jax.random.PRNGKey(3))
    kc, vc = init_kv_cache(cfg_q, 16)
    b = 3
    tok = jnp.asarray([5, 9, 11], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)
    logits, _, _ = decode_step(
        cfg_q, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32)
    ids, _, _ = decode_step(
        cfg_q, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32, head_mode="argmax")
    # the fused kernel skips the per-token activation scale (positive,
    # argmax-invariant in exact math) — f32 rounding of that multiply can
    # flip exact ties, so assert the emitted id attains the max logit
    # rather than index equality
    lg = np.asarray(logits, np.float32)
    ids = np.asarray(ids)
    picked = lg[np.arange(b), ids]
    top = lg.max(-1)
    np.testing.assert_allclose(picked, top, rtol=1e-5, atol=1e-5)


def test_gu256_decode_matches_plain(impl):
    """cfg.gu256 (gate/up 256-col interleaved weights + in-epilogue
    silu(g)*u) == the plain w8a8 path within quant tolerance, single
    device and TP."""
    import dataclasses
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from vllm_xpu_kernels_tpu.models.llama import (
        param_tp_specs, kv_cache_tp_spec, params_for_tp)
    from vllm_xpu_kernels_tpu.parallel import make_mesh

    cfg = LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=512, vocab_size=300,
        max_position=128, quant="w8a8", block_size=16)
    cfg_g = dataclasses.replace(cfg, gu256=True)
    p1 = init_params(cfg, jax.random.PRNGKey(0))
    p2 = init_params(cfg_g, jax.random.PRNGKey(0))
    kc, vc = init_kv_cache(cfg, 8)
    b = 2
    tok = jnp.asarray([1, 2], jnp.int32)
    kvl = jnp.full((b,), 20, jnp.int32)
    pos = kvl - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[jnp.arange(b), 1] * 16 + 3).astype(jnp.int32)
    l1, _, _ = decode_step(cfg, p1, tok, pos, slots, tbl, kvl, kc, vc,
                           max_seqlen_k=32)
    l2, _, _ = decode_step(cfg_g, p2, tok, pos, slots, tbl, kvl, kc, vc,
                           max_seqlen_k=32)
    assert_allclose(l2, np.asarray(l1, np.float32), rtol=3e-2, atol=3e-1)

    # TP: the composite params_for_tp permutation keeps per-rank gu256
    tp = 2
    cfg_local = cfg_g.tp_slice(tp)
    mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    rep = P()

    def step(p, tok, pos, slots, tbl, kvl, kc, vc):
        lg, _, _ = decode_step(cfg_local, p, tok, pos, slots, tbl, kvl,
                               kc, vc, max_seqlen_k=32, tp_axis="tp")
        return lg

    sh = shard_map(
        step, mesh=mesh,
        in_specs=(param_tp_specs(cfg_g), rep, rep, rep, rep, rep,
                  kv_cache_tp_spec(), kv_cache_tp_spec()),
        out_specs=rep, check_rep=False)
    kc2, vc2 = init_kv_cache(cfg_g, 8)
    l3 = jax.jit(sh)(params_for_tp(p2, cfg_g, tp), tok, pos, slots, tbl,
                     kvl, kc2, vc2)
    assert_allclose(l3, np.asarray(l2, np.float32), rtol=3e-2, atol=3e-1)


def test_deepseek_decode():
    """DeepSeek-style MLA + grouped-topk MoE decode step (scaling rope,
    qk_head != v_head through paged attention, shared experts)."""
    from vllm_xpu_kernels_tpu.models import deepseek as DS

    cfg = DS.DeepSeekConfig(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=4,
        qk_nope_dim=32, qk_rope_dim=16, v_head_dim=32, kv_lora_rank=64,
        vocab_size=128, max_position=64, block_size=16,
        num_experts=16, num_shared_experts=1, top_k=4, n_group=4,
        topk_group=2, moe_intermediate=64, head_dim=48,
        intermediate_size=64)
    params = DS.init_params(cfg, jax.random.PRNGKey(5))
    kc, vc = DS.init_kv_cache(cfg, 16)
    b = 2
    tok = jnp.asarray([3, 7], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)
    logits, kc, vc = DS.decode_step(
        cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32)
    assert logits.shape == (b, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())
    # cache got the MLA head sizes
    assert kc[0].shape[-1] == cfg.qk_head_dim
    assert vc[0].shape[-1] == cfg.v_head_dim


def test_deepseek_prefill_then_decode_matches_full_prefill():
    """deepseek prefill_step + one decode_step == a full prefill of the
    extended prompt (teacher-forced incremental equivalence, same
    contract as the Llama serving tests)."""
    from vllm_xpu_kernels_tpu.models import deepseek as DS

    kw = dict(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=4,
        qk_nope_dim=32, qk_rope_dim=16, v_head_dim=32, kv_lora_rank=64,
        vocab_size=128, max_position=64, block_size=16,
        num_experts=16, num_shared_experts=1, top_k=4, n_group=4,
        topk_group=2, moe_intermediate=64, head_dim=48,
        intermediate_size=64)
    cfg = DS.DeepSeekConfig(**kw)
    params = DS.init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    n = 9
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, n + 1), jnp.int32)
    tbl = jnp.asarray([[0, 1]], jnp.int32)

    def prefill(n_tok):
        kc, vc = DS.init_kv_cache(cfg, 4)
        pos = jnp.arange(n_tok, dtype=jnp.int32)
        slots = pos
        cu = jnp.asarray([0, n_tok], jnp.int32)
        kv_lens = jnp.asarray([n_tok], jnp.int32)
        logits, kc, vc = DS.prefill_step(
            cfg, params, toks[:n_tok], pos, cu, slots, tbl, kv_lens,
            kc, vc, max_seqlen_q=16, max_seqlen_k=32)
        return logits, kc, vc

    full, _, _ = prefill(n + 1)
    part, kc, vc = prefill(n)
    dec, _, _ = DS.decode_step(
        cfg, params, toks[n:n + 1], jnp.asarray([n], jnp.int32),
        jnp.asarray([n], jnp.int32), tbl,
        jnp.asarray([n + 1], jnp.int32), kc, vc, max_seqlen_k=32)
    ref = np.asarray(full, np.float32)[-1]
    got = np.asarray(dec, np.float32)[0]
    np.testing.assert_allclose(got, ref, rtol=3e-2,
                               atol=3e-2 * max(1.0, np.abs(ref).max()))


def test_deepseek_absorbed_decode_matches_expanded():
    """Weight-absorbed latent MLA decode (one [c_kv | k_pe] row per
    token, V overlapping K's first r lanes on the padded-fused kernel)
    == the expanded per-head cache path, same weights — the DeepSeek-V3
    serving mode over the reference's "up to 576/512" MLA contract."""
    from vllm_xpu_kernels_tpu.models import deepseek as DS

    kw = dict(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=4,
        qk_nope_dim=32, qk_rope_dim=16, v_head_dim=32, kv_lora_rank=64,
        vocab_size=128, max_position=64, block_size=16,
        num_experts=16, num_shared_experts=1, top_k=4, n_group=4,
        topk_group=2, moe_intermediate=64, head_dim=48,
        intermediate_size=64)
    b = 2
    tok = jnp.asarray([3, 7], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)

    outs = {}
    params = DS.init_params(DS.DeepSeekConfig(**kw), jax.random.PRNGKey(5))
    for absorbed in (False, True):
        cfg = DS.DeepSeekConfig(absorbed=absorbed, **kw)
        kc, vc = DS.init_kv_cache(cfg, 16)
        logits, kc, vc = DS.decode_step(
            cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
            max_seqlen_k=32)
        outs[absorbed] = np.asarray(logits, np.float32)
        if absorbed:
            assert vc[0] is None
            assert kc[0].shape == (16, 1, 16, 128)   # one padded latent
    assert np.isfinite(outs[True]).all()
    assert_allclose(outs[True], outs[False], rtol=3e-2,
                    atol=3e-2 * max(1.0, np.abs(outs[False]).max()))


def test_mixtral_w8a8_decode():
    """w8a8 Mixtral: int8 expert weights through the native-s8 grouped
    GEMM, int8 attention linears, finite logits near the bf16 model."""
    from vllm_xpu_kernels_tpu.models import mixtral as MX
    from vllm_xpu_kernels_tpu.models import init_kv_cache

    kw = dict(hidden_size=64, num_layers=2, num_q_heads=4, num_kv_heads=2,
              head_dim=16, intermediate_size=128, vocab_size=128,
              max_position=64, block_size=16, num_experts=4, top_k=2)
    b = 4
    tok = jnp.asarray([1, 2, 3, 4], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)

    outs = {}
    for quant in ("none", "w8a8"):
        cfg = MX.MixtralConfig(quant=quant, **kw)
        params = MX.init_params(cfg, jax.random.PRNGKey(3))
        kc, vc = init_kv_cache(cfg, 16)
        logits, _, _ = MX.decode_step(
            cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
            max_seqlen_k=32)
        outs[quant] = np.asarray(logits, np.float32)
    assert np.isfinite(outs["w8a8"]).all()
    assert_allclose(outs["w8a8"], outs["none"], rtol=2e-1, atol=2e-1)


def test_deepseek_sparse_indexer_decode():
    """DeepSeek-V3.2 DSA path end-to-end: indexer K quant+cache, paged
    fp8 MQA logits, top-k token selection, gathered sparse attention.
    With index_topk >= context the selected set is the full causal
    context, so sparse logits must match the dense decode step; with a
    small index_topk the step still produces finite logits."""
    import dataclasses

    from vllm_xpu_kernels_tpu.models import deepseek as DS

    kw = dict(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=4,
        qk_nope_dim=32, qk_rope_dim=16, v_head_dim=32, kv_lora_rank=64,
        vocab_size=128, max_position=64, block_size=16,
        num_experts=16, num_shared_experts=1, top_k=4, n_group=4,
        topk_group=2, moe_intermediate=64, head_dim=48,
        intermediate_size=64, dtype="float32")
    cfg_s = DS.DeepSeekConfig(index_topk=32, index_n_heads=4,
                              index_head_dim=32, **kw)
    cfg_d = DS.DeepSeekConfig(**kw)
    params = DS.init_params(cfg_s, jax.random.PRNGKey(7))

    b = 2
    tok = jnp.asarray([3, 7], jnp.int32)
    kv_lens = jnp.full((b,), 9, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    slots = (tbl[:, 0] * 16 + 8).astype(jnp.int32)

    kc, vc = DS.init_kv_cache(cfg_s, 16)
    # seed the paged KV cache with context so sparse selection matters
    rng = jax.random.PRNGKey(8)
    kc = [jax.random.normal(rng, c.shape, c.dtype) * 0.3 for c in kc]
    vc = [jax.random.normal(rng, c.shape, c.dtype) * 0.3 for c in vc]
    ic = DS.init_indexer_cache(cfg_s, 16)
    # populate indexer cache for the existing context tokens (positions
    # 0..7 of each seq live in block tbl[:,0])
    for li in range(cfg_s.num_layers):
        ctx_slots = jnp.concatenate(
            [tbl[i, 0] * 16 + jnp.arange(8) for i in range(b)])
        k_ctx = jax.random.normal(
            jax.random.PRNGKey(20 + li), (b * 8, cfg_s.index_head_dim),
            jnp.float32)
        ic[li] = tuple(DS.ops.indexer_k_quant_and_cache(
            k_ctx, ic[li][0], ic[li][1], ctx_slots,
            quant_block_size=cfg_s.index_head_dim))

    dense_logits, kc_d, vc_d = DS.decode_step(
        cfg_d, params, tok, positions, slots, tbl, kv_lens,
        [jnp.array(c) for c in kc], [jnp.array(c) for c in vc],
        max_seqlen_k=32)
    sparse_logits, kc_s, vc_s, ic2 = DS.decode_step(
        cfg_s, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32, idx_cache=ic)
    assert bool(jnp.isfinite(sparse_logits).all())
    # topk=32 >= context(9): the full causal window is selected
    np.testing.assert_allclose(np.asarray(sparse_logits),
                               np.asarray(dense_logits),
                               rtol=2e-4, atol=2e-4)
    # indexer cache was updated at this step's slots
    for li in range(cfg_s.num_layers):
        assert not np.allclose(np.asarray(ic2[li][1]),
                               np.asarray(ic[li][1]))

    # small top-k: runs, finite, and actually restricts the context
    cfg_t = dataclasses.replace(cfg_s, index_topk=4)
    tiny_logits, _, _, _ = DS.decode_step(
        cfg_t, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=32, idx_cache=ic)
    assert bool(jnp.isfinite(tiny_logits).all())
    assert not np.allclose(np.asarray(tiny_logits),
                           np.asarray(dense_logits))


def test_chunked_prefill_matches_whole_prefill():
    """Chunked prefill (prompt fed in several chunks against the paged
    cache) and a mixed chunk+fresh-prompt batch reproduce whole-prefill
    last-token logits (reference mixed-batch routing,
    csrc/flash_attn/flash_api.cpp:206-322)."""
    from vllm_xpu_kernels_tpu.models.runtime import (
        build_chunked_prefill_batch)

    params = init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    pa = rng.integers(0, CFG.vocab_size, 27).astype(np.int64)
    pb = rng.integers(0, CFG.vocab_size, 11).astype(np.int64)

    def run_chunks(schedule):
        """schedule: list of {seq_id: chunk}; returns last-token logits of
        the final chunk per seq (dict)."""
        mgr = BlockManager(64, CFG.block_size)
        kc, vc = init_kv_cache(CFG, 64)
        out = {}
        for chunks in schedule:
            (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
             max_q, max_k) = build_chunked_prefill_batch(mgr, chunks)
            max_q = -(-max_q // 8) * 8
            logits, kc, vc = prefill_step(
                CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
                jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
                jnp.asarray(kv_lens), kc, vc,
                max_seqlen_q=max_q, max_seqlen_k=-(-int(max_k) // 16) * 16)
            lg = np.asarray(logits, np.float32)
            ends = np.asarray(cu_q[1:]) - 1
            for i, sid in enumerate(seq_ids):
                out[sid] = lg[ends[i]]
        return out

    golden = run_chunks([{0: pa, 1: pb}])
    # seq 0 chunked [10, 9, 8]; the final chunk arrives together with the
    # whole of seq 1 (mixed batch: continuation + fresh prompt)
    chunked = run_chunks([{0: pa[:10]}, {0: pa[10:19]},
                          {0: pa[19:], 1: pb}])
    for sid in (0, 1):
        assert_allclose(chunked[sid], golden[sid], rtol=2e-2, atol=2e-2)

    # 1-token chunk of a running sequence == decode row in a prefill batch
    one_tok = run_chunks([{0: pa[:26]}, {0: pa[26:]}])
    assert_allclose(one_tok[0], golden[0], rtol=2e-2, atol=2e-2)


def test_mixtral_prefill_then_decode_teacher_forcing():
    """Mixtral via the shared forward body: incremental decode over the
    paged cache reproduces teacher-forced prefill logits."""
    from vllm_xpu_kernels_tpu.models import mixtral as MX
    from vllm_xpu_kernels_tpu.models import init_kv_cache
    from vllm_xpu_kernels_tpu.models.runtime import (
        BlockManager, build_prefill_batch, build_decode_batch)

    cfg = MX.MixtralConfig(
        hidden_size=64, num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128,
        max_position=64, quant="none", block_size=16,
        num_experts=4, top_k=2, dtype="float32")
    params = MX.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(9)
    T = 10
    toks = rng.integers(0, cfg.vocab_size, (T,))

    mgr = BlockManager(16, cfg.block_size)
    kc, vc = init_kv_cache(cfg, 16)
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     mq, mk) = build_prefill_batch(mgr, {0: toks.astype(np.int64)})
    want, _, _ = MX.prefill_step(
        cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc, 16, 16)
    want = np.asarray(want, np.float32)[:T]

    mgr2 = BlockManager(16, cfg.block_size)
    kc2, vc2 = init_kv_cache(cfg, 16)
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     mq, mk) = build_prefill_batch(mgr2, {0: toks[:1].astype(np.int64)})
    logits, kc2, vc2 = MX.prefill_step(
        cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc2, vc2, 16, 16)
    np.testing.assert_allclose(np.asarray(logits)[0], want[0],
                               rtol=2e-4, atol=2e-4)
    for i in range(1, T):
        batch = build_decode_batch(mgr2, seq_ids, toks[i: i + 1],
                                   max_blocks=2)
        logits, kc2, vc2 = MX.decode_step(
            cfg, params, jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
            kc2, vc2, max_seqlen_k=32)
        np.testing.assert_allclose(np.asarray(logits)[0], want[i],
                                   rtol=2e-4, atol=2e-4)

"""GPT-OSS family: swigluoai MoE + attention sinks + sliding window +
YaRN rope, validated against HF transformers as an independent golden.

Reference features exercised end-to-end: swigluoai_and_mul
(csrc/activation.cpp:277-346), sink/local flash-attention variants
(KERNEL_CONFIGURATION.md:124-129), MXFP4 grouped-GEMM recipe
(csrc/xpu/grouped_gemm/xe_2/grouped_gemm_xe2_interface.hpp:174-350).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_xpu_kernels_tpu.models import gpt_oss as G
from vllm_xpu_kernels_tpu.models.llama import init_kv_cache
from vllm_xpu_kernels_tpu.models.runtime import (BlockManager,
                                                 build_prefill_batch)

CFG = G.GptOssConfig(
    hidden_size=128,
    num_layers=4,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=64,
    intermediate_size=128,
    vocab_size=256,
    num_experts=8,
    top_k=4,
    sliding_window=8,
    rope_factor=32.0,
    rope_orig_max_position=16,
    max_position=512,
    block_size=16,
    dtype="float32",
)


def _hf_config(tfm, cfg):
    return tfm.GptOssConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_q_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        num_local_experts=cfg.num_experts,
        num_experts_per_tok=cfg.top_k,
        sliding_window=cfg.sliding_window,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position,
        rope_scaling={
            "rope_type": "yarn",
            "factor": cfg.rope_factor,
            "beta_fast": cfg.rope_beta_fast,
            "beta_slow": cfg.rope_beta_slow,
            "truncate": False,
            "original_max_position_embeddings": cfg.rope_orig_max_position,
        },
    )


def _prefill_logits(cfg, params, toks):
    mgr = BlockManager(64, cfg.block_size)
    kc, vc = init_kv_cache(cfg, 64)
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(
        mgr, {0: np.asarray(toks, np.int64)})
    logits, _, _ = G.prefill_step(
        cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc,
        max_seqlen_q=64, max_seqlen_k=64)
    return np.asarray(logits, np.float32)[: len(toks)]


def test_yarn_rope_matches_hf():
    """Our YaRN inverse-frequency + attention-factor math vs transformers
    ROPE_INIT_FUNCTIONS['yarn'] (the exact init real checkpoints use)."""
    tfm = pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf_cfg = _hf_config(tfm, CFG)
    inv, att = ROPE_INIT_FUNCTIONS["yarn"](hf_cfg, device="cpu")
    cache = np.asarray(G._rope_cache_yarn(CFG), np.float32)
    d2 = CFG.head_dim // 2
    t = np.arange(CFG.max_position, dtype=np.float32)
    freqs = np.outer(t, inv.numpy())
    np.testing.assert_allclose(cache[:, :d2], np.cos(freqs) * att,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cache[:, d2:], np.sin(freqs) * att,
                               rtol=1e-5, atol=1e-5)


def test_hf_transformers_golden():
    """Independent golden: a random HF GptOssForCausalLM (eager CPU) and
    our engine produce the same prefill logits — validates sinks,
    interleaved swigluoai experts with biases, router topk-softmax,
    alternating sliding/full layers, and YaRN rope in one shot."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    torch.manual_seed(3)
    hf = tfm.GptOssForCausalLM(_hf_config(tfm, CFG)).float().eval()
    hf.config._attn_implementation = "eager"

    rng = np.random.default_rng(7)
    T = 24          # > sliding_window so local masking matters
    toks = rng.integers(0, CFG.vocab_size, (T,))
    with torch.no_grad():
        want = hf(torch.tensor(toks[None])).logits[0].numpy()

    state = hf.state_dict()
    params = G.params_from_hf_state(
        CFG, lambda n: state[n].detach().numpy())
    got = _prefill_logits(CFG, params, toks)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sinks_and_window_are_live():
    """Ablations: zeroing sinks or widening the window must change
    logits (i.e. both features are actually applied)."""
    params = G.init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(11)
    toks = rng.integers(0, CFG.vocab_size, (24,))
    base = _prefill_logits(CFG, params, toks)

    ablated = dict(params)
    ablated["layers"] = [dict(lp) for lp in params["layers"]]
    for lp in ablated["layers"]:
        lp["sinks"] = jnp.zeros_like(lp["sinks"]) - 1e9  # no-op sink
    assert np.abs(base - _prefill_logits(CFG, ablated, toks)).max() > 1e-4

    wide = dataclasses.replace(CFG, sliding_window=0)   # all-full-attn
    assert np.abs(base - _prefill_logits(wide, params, toks)).max() > 1e-4


def test_mxfp4_recipe():
    """The released-checkpoint recipe: expert weights quantized to MXFP4
    run through the fused grouped-GEMM pipeline and track the bf16
    logits."""
    cfg_q = dataclasses.replace(CFG, quant="mxfp4")
    params = G.init_params(CFG, jax.random.PRNGKey(2))
    params_q = G.init_params(cfg_q, jax.random.PRNGKey(2))
    lp = params_q["layers"][0]
    assert lp["w13"]["w"].dtype == jnp.int8
    assert "mx" in lp["w13"]

    rng = np.random.default_rng(13)
    toks = rng.integers(0, CFG.vocab_size, (16,))
    a = _prefill_logits(CFG, params, toks)
    b = _prefill_logits(cfg_q, params_q, toks)
    # experts are the only quantized tensors; logits stay close
    assert np.abs(a - b).max() < 1.0
    assert np.abs(a - b).mean() < 0.1


def test_mxfp4_w8a8_transcode_recipe():
    """The int8 transcode of an mxfp4 checkpoint (BASELINE.md round-5
    recipe-level escape): experts quantize f32 -> mxfp4-QDQ ->
    per-channel int8 and serve on the native-s8 grouped kernel with
    biased GEMMs.  Logits must track BOTH the bf16 model and the mxfp4
    model it transcodes (the extra int8 noise rides on top of e2m1's)."""
    cfg_t = dataclasses.replace(CFG, quant="mxfp4-w8a8")
    cfg_m = dataclasses.replace(CFG, quant="mxfp4")
    params = G.init_params(CFG, jax.random.PRNGKey(2))
    params_t = G.init_params(cfg_t, jax.random.PRNGKey(2))
    params_m = G.init_params(cfg_m, jax.random.PRNGKey(2))
    lp = params_t["layers"][0]
    assert lp["w13"]["w"].dtype == jnp.int8 and "s8" in lp["w13"]
    # int8 stack is [E, K, N] (unpacked), scales per channel [E, N]
    assert lp["w13"]["s8"].shape == lp["w13"]["w"].shape[:1] + \
        lp["w13"]["w"].shape[2:]

    rng = np.random.default_rng(13)
    toks = rng.integers(0, CFG.vocab_size, (16,))
    a = _prefill_logits(CFG, params, toks)
    m = _prefill_logits(cfg_m, params_m, toks)
    t = _prefill_logits(cfg_t, params_t, toks)
    assert np.abs(a - t).max() < 1.2
    assert np.abs(a - t).mean() < 0.15
    # the transcode's EXTRA noise over mxfp4 is small
    assert np.abs(m - t).mean() < 0.1


def test_incremental_decode_matches_teacher_forcing():
    """Prefill(t0..tN) logits at step i == decode logits after feeding
    t0..t{i-1} one at a time (KV-cache path == packed path)."""
    from vllm_xpu_kernels_tpu.registry import use_pallas

    params = G.init_params(CFG, jax.random.PRNGKey(5))
    rng = np.random.default_rng(17)
    T = 12
    toks = rng.integers(0, CFG.vocab_size, (T,))
    want = _prefill_logits(CFG, params, toks)
    tol = 5e-3 if use_pallas() else 2e-4   # pallas kernels keep bf16 operands

    from vllm_xpu_kernels_tpu.models.runtime import build_decode_batch

    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(
        mgr, {0: np.asarray(toks[:1], np.int64)})
    logits, kc, vc = G.prefill_step(
        CFG, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc, max_seqlen_q=16, max_seqlen_k=16)
    np.testing.assert_allclose(np.asarray(logits)[0], want[0],
                               rtol=tol, atol=tol)
    for i in range(1, T):
        batch = build_decode_batch(mgr, seq_ids, toks[i: i + 1],
                                   max_blocks=4)
        logits, kc, vc = G.decode_step(
            CFG, params, jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions), jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.block_table), jnp.asarray(batch.kv_lens),
            kc, vc, max_seqlen_k=64)
        np.testing.assert_allclose(np.asarray(logits)[0], want[i],
                                   rtol=tol, atol=tol)


def test_moe_ep_matches_replicated():
    """shard_mapped expert-parallel GPT-OSS MoE (biases + swigluoai
    through parallel.ep_fused_moe) == replicated-expert fused MoE."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    params = G.init_params(CFG, jax.random.PRNGKey(9))
    lp = params["layers"][0]
    rng = np.random.default_rng(21)
    t = 16
    x = jnp.asarray(rng.standard_normal((t, CFG.hidden_size)) * 0.3,
                    jnp.float32)
    base = G._moe_mlp(CFG, lp, x, None)

    ep = 4
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))

    def run(x_l, w13, b13, w2, b2):
        lp_l = dict(lp)
        lp_l["w13"] = {"w": w13, "b": b13}
        lp_l["w2"] = {"w": w2, "b": b2}
        return G._moe_mlp(CFG, lp_l, x_l, None, ep_axis="ep")

    out = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P("ep"), P("ep"), P("ep"), P("ep"), P("ep")),
        out_specs=P("ep"), check_rep=False))(
        x, lp["w13"]["w"], lp["w13"]["b"], lp["w2"]["w"], lp["w2"]["b"])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(base, np.float32),
                               rtol=2e-3, atol=2e-3)


def test_tp_decode_matches_single_device():
    """shard_mapped TP GPT-OSS decode (sharded sinks + windows + biased
    projections, replicated experts) == single-device decode."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from vllm_xpu_kernels_tpu.models.llama import kv_cache_tp_spec
    from vllm_xpu_kernels_tpu.parallel import make_mesh

    tp = 2
    cfg = CFG
    cfg_local = cfg.tp_slice(tp)
    params = G.init_params(cfg, jax.random.PRNGKey(8))
    nb = 8
    kc, vc = init_kv_cache(cfg, nb)
    b, kv_len = 2, 20
    tok = jnp.asarray([3, 5], jnp.int32)
    kv_lens = jnp.full((b,), kv_len, jnp.int32)
    positions = kv_lens - 1
    tbl = jnp.asarray([[0, 1, 0, 0], [2, 3, 0, 0]], jnp.int32)
    slots = jnp.asarray([16 + 3, 3 * 16 + 3], jnp.int32)
    max_k = 64

    ref_logits, _, _ = G.decode_step(
        cfg, params, tok, positions, slots, tbl, kv_lens, kc, vc,
        max_seqlen_k=max_k)

    mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    pspecs = G.param_tp_specs(cfg)
    cspec = kv_cache_tp_spec()
    rep = P()

    def step(p, tok, pos, slots, tbl, kvl, kc, vc):
        logits, _, _ = G.decode_step(
            cfg_local, p, tok, pos, slots, tbl, kvl, kc, vc,
            max_seqlen_k=max_k, tp_axis="tp")
        return logits

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, rep, rep, rep, rep, rep, cspec, cspec),
        out_specs=rep, check_rep=False)
    kc2, vc2 = init_kv_cache(cfg, nb)
    tp_logits = jax.jit(sharded)(
        G.params_for_tp(params, cfg, tp), tok, positions, slots, tbl,
        kv_lens, kc2, vc2)
    np.testing.assert_allclose(np.asarray(tp_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_w8a8_attention_recipe():
    """attn_quant='w8a8': attention projections + logits head quantized
    (per-channel int8, dynamic per-token int8 activations via the fused
    norm-quant path) while experts keep their own recipe; logits track
    the bf16 model."""
    cfg_q = dataclasses.replace(CFG, attn_quant="w8a8")
    params = G.init_params(CFG, jax.random.PRNGKey(2))
    params_q = G.init_params(cfg_q, jax.random.PRNGKey(2))
    lp = params_q["layers"][0]
    assert "s8" in lp["wqkv"] and "b" in lp["wqkv"]
    assert "lm_head_q" in params_q

    rng = np.random.default_rng(23)
    toks = rng.integers(0, CFG.vocab_size, (16,))
    a = _prefill_logits(CFG, params, toks)
    b = _prefill_logits(cfg_q, params_q, toks)
    assert np.abs(a - b).max() < 1.0
    assert np.abs(a - b).mean() < 0.1

"""Checkpoint IO: HF-safetensors round-trip + quantize-on-load.

The reference delegates checkpoint loading to vLLM and ships only format
converters (_quantize_convert.py); this engine owns the whole path, so the
contract under test is: save_llama_hf(init_params) -> load_llama_params
reproduces identical forward logits, for every quant recipe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import scoped
from vllm_xpu_kernels_tpu.models import (LlamaConfig, init_params,
                                         init_kv_cache, decode_step)
from vllm_xpu_kernels_tpu.models.loader import (load_llama_params,
                                                read_hf_config,
                                                save_llama_hf)
from vllm_xpu_kernels_tpu.models.runtime import (BlockManager,
                                                 build_decode_batch)


def _tiny_cfg(quant="none"):
    return LlamaConfig(
        hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=256, vocab_size=512,
        max_position=128, quant=quant, block_size=16)


def _decode_logits(cfg, params, seed=3):
    mgr = BlockManager(num_blocks=16, block_size=cfg.block_size)
    seq_ids = [0, 1]
    for sid in seq_ids:
        mgr.allocate(sid, 5)
    b = build_decode_batch(mgr, seq_ids, np.array([7, 11], np.int64),
                           max_blocks=4)
    kc, vc = init_kv_cache(cfg, 16)
    logits, _, _ = jax.jit(
        lambda p, kc, vc: decode_step(
            cfg, p, jnp.asarray(b.token_ids, jnp.int32),
            jnp.asarray(b.positions), jnp.asarray(b.slot_mapping),
            jnp.asarray(b.block_table), jnp.asarray(b.kv_lens),
            kc, vc, max_seqlen_k=64),
    )(params, kc, vc)
    return np.asarray(logits)


@pytest.mark.parametrize("quant", scoped(["none", "fp8", "int8", "mxfp4"], key="quant",
                                         ci=["none", "int8", "mxfp4"],
                                         mini=["int8"]))
def test_save_load_roundtrip(tmp_path, quant):
    """bf16 tree -> HF safetensors -> quantize-on-load == quantize the
    bf16 tree directly: identical stored bytes, identical logits."""
    cfg_f = _tiny_cfg("none")
    params_f = init_params(cfg_f, jax.random.PRNGKey(0))
    save_llama_hf(params_f, cfg_f, str(tmp_path))

    cfg_q = read_hf_config(str(tmp_path))
    assert cfg_q.hidden_size == cfg_f.hidden_size
    assert cfg_q.num_layers == cfg_f.num_layers
    cfg_q = __import__("dataclasses").replace(
        cfg_q, quant=quant, block_size=cfg_f.block_size)

    loaded = load_llama_params(cfg_q, str(tmp_path))

    # direct-quantization twin of the loaded tree
    from vllm_xpu_kernels_tpu.models.llama import quantize_linear
    for li, lp in enumerate(params_f["layers"]):
        for name in ("wqkv", "wo", "wgu", "wd"):
            want = quantize_linear(
                lp[name]["w"].astype(jnp.float32), quant, cfg_q.jdtype)
            got = loaded["layers"][li][name]
            for k in want:
                np.testing.assert_array_equal(
                    np.asarray(want[k]).view(np.uint8),
                    np.asarray(got[k]).view(np.uint8),
                    err_msg=f"layer {li} {name} {k}")

    ref = _decode_logits(cfg_q, {
        **params_f,
        "layers": [
            {**lp, **{n: quantize_linear(lp[n]["w"].astype(jnp.float32),
                                         quant, cfg_q.jdtype)
                      for n in ("wqkv", "wo", "wgu", "wd")}}
            for lp in params_f["layers"]],
    })
    got = _decode_logits(cfg_q, loaded)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_untied_lm_head(tmp_path):
    """A checkpoint with a separate lm_head drives the logits projection."""
    cfg = _tiny_cfg("none")
    params = init_params(cfg, jax.random.PRNGKey(1))
    params["lm_head"] = jax.random.normal(
        jax.random.PRNGKey(9), params["embed"].shape,
        jnp.float32).astype(cfg.jdtype) * 0.02
    save_llama_hf(params, cfg, str(tmp_path))
    loaded = load_llama_params(cfg, str(tmp_path))
    assert "lm_head" in loaded
    tied = dict(loaded)
    del tied["lm_head"]
    assert not np.allclose(_decode_logits(cfg, loaded),
                           _decode_logits(cfg, tied))


def test_sharded_index(tmp_path):
    """Loader follows model.safetensors.index.json across shards."""
    import json
    import os
    import shutil

    from safetensors import safe_open
    from safetensors.numpy import save_file

    cfg = _tiny_cfg("none")
    params = init_params(cfg, jax.random.PRNGKey(2))
    save_llama_hf(params, cfg, str(tmp_path))
    # split the single file into two shards + index
    src = os.path.join(tmp_path, "model.safetensors")
    with safe_open(src, framework="numpy") as h:
        tensors = {k: h.get_tensor(k) for k in h.keys()}
    names = sorted(tensors)
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    wmap = {}
    for fname, ks in shards.items():
        save_file({k: tensors[k] for k in ks},
                  os.path.join(tmp_path, fname))
        wmap.update({k: fname for k in ks})
    os.remove(src)
    with open(os.path.join(tmp_path, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"weight_map": wmap}, f)

    loaded = load_llama_params(cfg, str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(loaded["layers"][0]["wqkv"]["w"], np.float32),
        np.asarray(params["layers"][0]["wqkv"]["w"], np.float32),
        rtol=1e-2, atol=1e-2)
    shutil.rmtree(tmp_path, ignore_errors=True)


@pytest.mark.parametrize("variant", scoped(
    ["llama", "qwen2", "qwen3"], ci=["qwen2", "qwen3"], mini=["qwen3"]))
def test_hf_transformers_golden(tmp_path, variant):
    """External golden: our saved checkpoint loaded by HF transformers
    (eager CPU) produces the same prefill logits as our engine — an
    independent implementation validating rope / rms-norm / qkv-bias
    (Qwen2) / per-head qk-norm (Qwen3) end-to-end."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    import dataclasses

    cfg = dataclasses.replace(
        _tiny_cfg("none"), dtype="float32",
        qkv_bias=variant == "qwen2", qk_norm=variant == "qwen3")
    params = init_params(cfg, jax.random.PRNGKey(4))
    save_llama_hf(params, cfg, str(tmp_path))

    model, info = tfm.AutoModelForCausalLM.from_pretrained(
        str(tmp_path), torch_dtype=torch.float32,
        attn_implementation="eager", output_loading_info=True)
    assert not info["missing_keys"], info["missing_keys"]
    rng = np.random.default_rng(5)
    T = 12
    toks = rng.integers(0, cfg.vocab_size, (1, T))
    with torch.no_grad():
        want = model(torch.tensor(toks)).logits[0].numpy()

    mgr = BlockManager(16, cfg.block_size)
    kc, vc = init_kv_cache(cfg, 16)
    from vllm_xpu_kernels_tpu.models.runtime import build_prefill_batch
    (seq_ids, token_ids, positions, cu_q, slots, tbl, kv_lens,
     max_q, max_k) = build_prefill_batch(
        mgr, {0: toks[0].astype(np.int64)})
    from vllm_xpu_kernels_tpu.models import prefill_step
    logits, _, _ = prefill_step(
        cfg, params, jnp.asarray(token_ids), jnp.asarray(positions),
        jnp.asarray(cu_q), jnp.asarray(slots), jnp.asarray(tbl),
        jnp.asarray(kv_lens), kc, vc,
        max_seqlen_q=16, max_seqlen_k=16)
    got = np.asarray(logits, np.float32)[:T]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["qwen2", "qwen3"])
def test_qwen_save_load_roundtrip(tmp_path, variant):
    """Bias / qk-norm tensors survive the HF round-trip and change
    logits (i.e. they are actually applied in the forward)."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg("none"),
                              qkv_bias=variant == "qwen2",
                              qk_norm=variant == "qwen3")
    params = init_params(cfg, jax.random.PRNGKey(6))
    if variant == "qwen3":
        # non-trivial norm weights so zeroing them is observable
        for lp in params["layers"]:
            lp["qnorm"] = lp["qnorm"] * 1.5
            lp["knorm"] = lp["knorm"] * 0.5
    save_llama_hf(params, cfg, str(tmp_path))
    cfg2 = read_hf_config(str(tmp_path))
    assert cfg2.qkv_bias == cfg.qkv_bias
    assert cfg2.qk_norm == cfg.qk_norm
    cfg2 = dataclasses.replace(cfg2, block_size=cfg.block_size)
    loaded = load_llama_params(cfg2, str(tmp_path))
    np.testing.assert_allclose(_decode_logits(cfg2, loaded),
                               _decode_logits(cfg, params),
                               rtol=1e-5, atol=1e-5)

    # ablate the variant-specific params -> logits must change
    import copy
    ablated = copy.deepcopy(loaded)
    for lp in ablated["layers"]:
        if variant == "qwen2":
            lp["wqkv"].pop("b")
        else:
            lp.pop("qnorm"), lp.pop("knorm")
    assert not np.allclose(_decode_logits(cfg2, loaded),
                           _decode_logits(cfg2, ablated))


def test_fp8_transcode_w8a8():
    """fp8-int8: an FP8 checkpoint's e4m3 codes transcode to int8 +
    per-channel scale (quantization.repack.fp8_transcode_w8a8) and serve
    on the w8a8 tree; the combined e4m3+int8 error stays bounded and the
    decode step runs the native-s8 path."""
    import dataclasses
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.models.llama import quantize_linear

    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 96)).astype(np.float32) * 0.1
    p = quantize_linear(jnp.asarray(w), "fp8-int8")
    assert set(p) == {"w", "s8"} and p["w"].dtype == jnp.int8
    deq = np.asarray(p["w"], np.float32) * np.asarray(p["s8"])[None, :]
    # e4m3 alone is ~6% relative near max; transcode adds <= one int8
    # step (colmax/127)
    err = np.abs(deq - w)
    bound = 0.07 * np.abs(w) + 1.5 * np.abs(w).max(0)[None, :] / 127.0
    assert (err <= bound).all()

    cfg_q = _tiny_cfg("fp8-int8")
    params_q = init_params(cfg_q, jax.random.PRNGKey(2))
    assert "s8" in params_q["layers"][0]["wqkv"]
    assert "lm_head_q" in params_q
    lq = _decode_logits(cfg_q, params_q)
    lf = _decode_logits(_tiny_cfg("none"),
                        init_params(_tiny_cfg("none"), jax.random.PRNGKey(2)))
    np.testing.assert_allclose(lq, lf, rtol=0.12, atol=0.12)


@pytest.mark.parametrize("quant", ["w8a8", "w4a8", "mxfp4"])
def test_quantize_params_in_memory(quant):
    """models.llama.quantize_params (in-memory quantize of a bf16 tree,
    the benchmark/benchmark_ppl.py path) == quantize-on-load: close
    logits and identical tree structure."""
    import dataclasses
    from vllm_xpu_kernels_tpu.models.llama import quantize_params

    cfg_f = _tiny_cfg("none")
    params_f = init_params(cfg_f, jax.random.PRNGKey(2))
    cfg_q = dataclasses.replace(cfg_f, quant=quant)
    params_q = quantize_params(cfg_q, params_f)
    ref_q = init_params(cfg_q, jax.random.PRNGKey(2))
    assert (jax.tree_util.tree_structure(params_q)
            == jax.tree_util.tree_structure(ref_q))
    lq = _decode_logits(cfg_q, params_q)
    lf = _decode_logits(cfg_f, params_f)
    tol = 0.35 if quant in ("mxfp4", "w4a8") else 0.1
    np.testing.assert_allclose(lq, lf, rtol=tol, atol=tol)

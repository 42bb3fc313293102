"""Llama-3-family decoder built from this engine's op surface.

Every hot op in the layer maps to a reference-parity op from ops/:
fused_add_rms_norm (csrc/layernorm.cpp) → rotary_embedding
(csrc/pos_encoding_kernels.cpp) → fp8_gemm_w8a16 / bf16 matmul
(csrc/xpu/onednn) → reshape_and_cache_tpu (csrc/cache.cpp) →
flash_attn_varlen_func (csrc/flash_attn) → silu_and_mul
(csrc/activation.cpp).

Layers are kept as separate per-layer buffers and unrolled (NOT stacked
under ``lax.scan``): pallas_call operands cannot alias a sliced view of a
stacked array, so scan costs a full copy of every weight and cache slice
per step — measured ~2x on weight bandwidth and ~45 ms/step on caches.

TP: pass ``tp_axis`` when calling inside ``shard_map`` — head/column
shards stay local, ``psum`` after the row-parallel o-proj and down-proj
(Megatron-style; the reference encodes the same contract implicitly via
per-rank head-count args, flash_api.cpp:349-360).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu import envs, ops
from vllm_xpu_kernels_tpu.parallel.mesh import tp_psum


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    hidden_size: int = 4096
    num_layers: int = 32
    num_q_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 14336
    vocab_size: int = 128256
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    max_position: int = 8192
    dtype: str = "bfloat16"
    quant: str = "none"   # none|fp8|int8|mxfp4 (weight-only)|w8a8|w4a8|fp8-int8
    block_size: int = 128        # KV page size (TPU tiling-friendly)
    qkv_bias: bool = False       # Qwen2-style bias on the qkv projection
    qk_norm: bool = False        # Qwen3-style per-head RMSNorm on q/k
    kv_fused: bool = True        # fused [nb, Hkv, bs, 2*D] KV pages: one
    # DMA per page in decode, one row-scatter per cache write (needs
    # 2*head_dim % 128 == 0 — D=64 runs via the kernels' padded-q path;
    # init_kv_cache falls back to split otherwise)
    gu256: bool = False          # store wgu 256-col gate/up-interleaved
    # (kernels/quant_matmul.gu256_perm) so GEMM1 applies silu(g)*u in
    # its epilogue and the [T, 2I] intermediate never touches HBM
    # (w8a8-family trees only; no LoRA on wgu)

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def attn_window(self, li: int):
        """Per-layer sliding window ``(left, right)`` or None (full
        causal).  Families with alternating local/global layers
        (GPT-OSS) override this."""
        return None

    def tp_slice(self, tp: int) -> "LlamaConfig":
        """Per-rank config with heads/columns divided (the reference's
        'shapes pre-resolved with TP division applied',
        benchmark/benchmark_gemm_onednn.py:87)."""
        assert self.num_q_heads % tp == 0 and self.num_kv_heads % tp == 0
        assert self.intermediate_size % tp == 0
        return dataclasses.replace(
            self,
            num_q_heads=self.num_q_heads // tp,
            num_kv_heads=self.num_kv_heads // tp,
            intermediate_size=self.intermediate_size // tp,
        )


def _rope_cache(cfg: LlamaConfig):
    rot = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, rot, 2, dtype=jnp.float32)
                                    / rot))
    t = jnp.arange(cfg.max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def quantize_linear(w, quant, dtype=jnp.bfloat16):
    """f32 [K, N] weight -> stored linear-param dict for a quant recipe
    ('none' | 'fp8' | 'int8' | 'w8a8' | 'mxfp4').  Used by random init and
    checkpoint quantize-on-load (models/loader.py)."""
    w = w.astype(jnp.float32)
    fan_in, fan_out = w.shape
    if quant == "fp8":
        absmax = jnp.max(jnp.abs(w), axis=0) + 1e-8
        s = (absmax / 448.0).astype(jnp.float32)
        q = jnp.clip(w / s[None, :], -448.0, 448.0).astype(jnp.float8_e4m3fn)
        return {"w": q, "s": s}
    if quant in ("int8", "w8a8"):
        # int8: weight-only (upcast ~484 GB/s on v5e, activations stay
        # bf16).  w8a8: same stored weights, but activations are
        # dynamically per-token int8-quantized and the matmul runs on the
        # MXU's native int8 path (~740 GB/s weight stream, 90% of HBM
        # peak) — the speed-of-light 8-bit recipe.  The scale key names
        # the recipe so _linear dispatches on tree structure.
        absmax = jnp.max(jnp.abs(w), axis=0) + 1e-8
        s = (absmax / 127.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
        return {"w": q, ("s8" if quant == "w8a8" else "s"): s}
    if quant == "fp8-int8":
        # FP8-checkpoint serving at int8 speed: quantize to e4m3 exactly
        # as an FP8 checkpoint stores it, then LOSSY-transcode the codes
        # to int8 + per-channel scale so serving runs on the native-s8
        # w8a8 kernels (740 GB/s weight stream) instead of the 369 GB/s
        # e4m3 upcast ceiling (docs/quant_recipes.md).  Certified by the
        # Δnll gate in BASELINE.md; e4m3-exact weight-only ('fp8') stays
        # the lossless option.  Ref role: fp8_gemm_w8a16.h:13-99.
        from vllm_xpu_kernels_tpu.quantization.repack import (
            fp8_transcode_w8a8)

        return fp8_transcode_w8a8(quantize_linear(w, "fp8"))
    if quant == "w4a8":
        # symmetric int4 weights (split-K packed) + per-group scales;
        # activations are dynamically per-token int8-quantized at runtime
        # (reference role: int4_gemm_w4a8.h) — HALVES the decode weight
        # stream vs w8a8 at the cost of an in-kernel int4 unpack
        g = 128
        while fan_in % g:
            g //= 2
        wg = w.reshape(fan_in // g, g, fan_out)
        s = (jnp.max(jnp.abs(wg), axis=1) / 7.0 + 1e-10).astype(jnp.float32)
        codes = jnp.clip(jnp.round(wg / s[:, None, :]), -8, 7) + 8
        lo = codes[:, : g // 2]
        hi = codes[:, g // 2:]
        packed = (lo.astype(jnp.uint8) | (hi.astype(jnp.uint8) << 4)
                  ).reshape(fan_in // 2, fan_out).astype(jnp.int8)
        return {"w": packed, "s4": s}
    if quant == "mxfp4":
        # MX FP4: e2m1 codes + per-32-group power-of-two scales, split-K
        # packed for the fused dequant-matmul kernel (w4a16 path).
        from vllm_xpu_kernels_tpu.utils import quant_math as qm

        g = 32
        wg = w.reshape(fan_in // g, g, fan_out)
        s = qm.ue8m0_round(
            jnp.max(jnp.abs(wg), axis=1) / qm.FP4_E2M1_MAX, 1e-10)
        codes = qm.fp4_e2m1_encode(
            jnp.clip(wg / s[:, None, :], -qm.FP4_E2M1_MAX, qm.FP4_E2M1_MAX)
        ).reshape(fan_in, fan_out)
        lo = codes.reshape(fan_in // g, g, fan_out)[:, : g // 2]
        hi = codes.reshape(fan_in // g, g, fan_out)[:, g // 2:]
        packed = (lo.astype(jnp.uint8) | (hi.astype(jnp.uint8) << 4)
                  ).reshape(fan_in // 2, fan_out).astype(jnp.int8)
        return {"w": packed, "s": s.astype(jnp.float32)}
    return {"w": w.astype(dtype)}


def apply_gu256(p, inter: int):
    """Permute a stored [gate | up] linear-param dict into the gu256
    256-column-interleaved layout (w8a8-family trees; pure column
    permutation of w + per-channel scales + bias)."""
    from vllm_xpu_kernels_tpu.kernels.quant_matmul import gu256_perm

    perm = jnp.asarray(gu256_perm(inter))
    out = {}
    for k, v in p.items():
        if k == "w" or k == "b":
            out[k] = v[..., perm] if k == "b" else v[:, perm]
        elif k in ("s", "s8", "s4"):
            out[k] = v[:, perm] if v.ndim == 2 else v[perm]
        else:
            out[k] = v
    return out


def _init_linear(key, fan_in, fan_out, cfg, quant_cols=True):
    """-> dict with 'w' (+'s' scale when quantized).  fp8 weights are
    stored [K, N] e4m3 with per-channel (per-N) scales."""
    w = jax.random.normal(key, (fan_in, fan_out), jnp.float32)
    w = w * (2.0 / (fan_in + fan_out)) ** 0.5
    return quantize_linear(w, cfg.quant, cfg.jdtype)


def _linear(x, p, tp_axis=None, reduce_out=False, lora=None, a_q=None,
            out_dtype=jnp.bfloat16):
    """p: {'w', quant scales..., optional 'b' bias} — bias stays bf16 and
    is added after the (possibly quantized) GEMM, matching the reference's
    oneDNN bias epilogues (csrc/xpu/onednn/onednn_matmul.cpp).

    ``a_q=(q_int8, scales)``: pre-quantized activations from a fused
    norm-quant / act-quant producer (w8a8 only; ``x`` may be None then —
    LoRA needs the bf16 activations, so callers keep x when lora is on).

    ``VXK_TP_OVERLAP=C`` (C>1): row-parallel (reduce_out) GEMMs on
    prefill-sized batches split their N dimension into C independent
    (GEMM -> psum) pairs so chunk i's all-reduce overlaps chunk i+1's
    GEMM under XLA's latency-hiding scheduler
    (parallel/overlap.row_parallel_matmul_overlapped generalized to the
    quant recipes; exact — same contractions, same f32 psums).
    """
    if reduce_out and tp_axis is not None and lora is None:
        from vllm_xpu_kernels_tpu.envs import VXK_TP_OVERLAP

        c = VXK_TP_OVERLAP()
        rows = (x.shape[0] if x is not None else a_q[0].shape[0])
        if c > 1 and rows >= 256:
            n = p["w"].shape[-1]
            while n % c:
                c -= 1
            if c > 1:
                if "s8" in p and a_q is None:
                    a_q = ops.dynamic_per_token_scaled_int8_quant(x)
                cw = n // c
                outs = []
                for i in range(c):
                    pi = {k: (v if v.shape[-1] != n else
                              jax.lax.slice_in_dim(v, i * cw, (i + 1) * cw,
                                                   axis=v.ndim - 1))
                          for k, v in p.items() if k != "b"}
                    oi = _linear(x, pi, tp_axis=None, reduce_out=False,
                                 a_q=a_q, out_dtype=out_dtype)
                    outs.append(tp_psum(oi.astype(jnp.float32), tp_axis))
                out = jnp.concatenate(outs, axis=-1)
                if "b" in p:
                    out = out + p["b"].astype(jnp.float32)
                return out.astype(out_dtype if x is None else x.dtype)
    if "s8" in p:
        # w8a8: dynamic per-token int8 activations, native MXU int8 matmul
        if a_q is not None:
            q, a_s = a_q
        else:
            q, a_s = ops.dynamic_per_token_scaled_int8_quant(x)
        out = ops.int8_gemm_w8a8(q, p["w"], A_scale=a_s, B_scale=p["s8"],
                                 out_dtype=(x.dtype if x is not None
                                            else out_dtype))
    elif "s4" in p:
        # w4a8: int4 split-K weights + dynamic per-token int8 activations
        if a_q is not None:
            q, a_s = a_q
        else:
            q, a_s = ops.dynamic_per_token_scaled_int8_quant(x)
        g = p["w"].shape[0] * 2 // p["s4"].shape[0]
        out = ops.int4_gemm_w4a8(
            q, a_s, None, p["w"], p["s4"], None, g,
            out_dtype=(x.dtype if x is not None else out_dtype))
    elif "s" in p and p["s"].ndim == 2:
        # mxfp4: split-K packed e2m1 + per-32-group pow2 scales
        out = _mx_linear(x, p["w"], p["s"])
    elif "s" in p:
        out = ops.fp8_gemm_w8a16(x, p["w"], p["s"])
    else:
        out = jnp.dot(x, p["w"], preferred_element_type=jnp.float32
                      ).astype(x.dtype)
    if "b" in p and not reduce_out:
        out = (out.astype(jnp.float32)
               + p["b"].astype(jnp.float32)).astype(out.dtype)
    if lora is not None:
        # multi-LoRA: per-token adapter index -> bgmv shrink/expand
        # (reference ops csrc/xpu/lora/lora_shrink.cpp / lora_expand.cpp)
        la, lb, idx, scale = lora
        h = ops.bgmv_shrink(x, la, idx, scale)
        out = ops.bgmv_expand(h, lb, out, idx, add_inputs=True)
    if reduce_out:
        out = tp_psum(out, tp_axis)
        if "b" in p:
            # row-parallel layers (o-proj / down-proj) add the bias once,
            # after the psum — adding per-rank would scale it by tp
            out = (out.astype(jnp.float32)
                   + p["b"].astype(jnp.float32)).astype(out.dtype)
    return out


def _mx_linear(x, packed, scales):
    from vllm_xpu_kernels_tpu.registry import use_pallas
    from vllm_xpu_kernels_tpu.kernels import quant_matmul as qmm

    g = packed.shape[0] * 2 // scales.shape[0]
    if use_pallas():
        if x.shape[0] >= 512:
            # prefill shapes: e2m1-decode the weights once, XLA bf16 GEMM
            b16 = qmm.packed_dequant_pallas(packed, scales, g, "fp4sk")
            return jnp.dot(x.astype(jnp.bfloat16), b16,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        return qmm.quant_matmul_pallas(
            x, packed, a_kind="dense", b_kind="fp4sk",
            b_scale=scales, b_group_k=g, out_dtype=x.dtype)
    codes = qmm.unpack_int4_splitk_grouped(packed, g)
    deq = qmm.e2m1_decode_f32(codes) * jnp.repeat(scales, g, axis=0)
    return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def init_params(cfg: LlamaConfig, key=None):
    """Random-initialized parameter pytree (benchmark weights; checkpoint
    loading maps HF tensors onto the same tree)."""
    assert not cfg.gu256 or cfg.quant in ("w8a8", "fp8-int8"), (
        "gu256 serves the s8-tree gated-act epilogue only", cfg.quant)
    key = key if key is not None else jax.random.PRNGKey(0)
    e = cfg.hidden_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size
    n_lin = 7
    keys = jax.random.split(key, cfg.num_layers * n_lin + 2)

    # Per-layer dicts (NOT stacked): each weight is its own buffer, so
    # Pallas kernels consume it directly.  A stacked [L, ...] layout under
    # lax.scan forces XLA to materialize a copy of every weight slice per
    # layer per step (a pallas_call operand cannot alias a dynamic slice),
    # which halves effective weight bandwidth — measured 154 vs 295 GB/s.
    # Projections are fused (qkv together, gate+up together): 4 GEMMs per
    # layer instead of 7 — fewer kernel launches and wider N tiles.
    layers = []
    for li in range(cfg.num_layers):
        lp = {
            "ln1": jnp.ones((e,), cfg.jdtype),
            "ln2": jnp.ones((e,), cfg.jdtype),
            "wqkv": _init_linear(keys[li * n_lin + 0], e,
                                 (hq + 2 * hkv) * d, cfg),
            "wo": _init_linear(keys[li * n_lin + 3], hq * d, e, cfg),
            "wgu": (apply_gu256(
                _init_linear(keys[li * n_lin + 4], e, 2 * i, cfg), i)
                if cfg.gu256
                else _init_linear(keys[li * n_lin + 4], e, 2 * i, cfg)),
            "wd": _init_linear(keys[li * n_lin + 6], i, e, cfg),
        }
        if cfg.qkv_bias:
            # Qwen2: bias on q/k/v only (o/gate/up/down are bias-free)
            lp["wqkv"]["b"] = (jax.random.normal(
                keys[li * n_lin + 1], ((hq + 2 * hkv) * d,), jnp.float32)
                * 0.02).astype(cfg.jdtype)
        if cfg.qk_norm:
            # Qwen3: per-head RMSNorm weights on q and k (pre-RoPE)
            lp["qnorm"] = jnp.ones((d,), cfg.jdtype)
            lp["knorm"] = jnp.ones((d,), cfg.jdtype)
        layers.append(lp)
    embed = (jax.random.normal(keys[-2], (cfg.vocab_size, e), jnp.float32)
             * 0.02).astype(cfg.jdtype)
    params = {
        "layers": layers,
        "embed": embed,                       # tied with lm_head
        "final_ln": jnp.ones((e,), cfg.jdtype),
        "rope": _rope_cache(cfg),
    }
    if cfg.quant in ("w8a8", "w4a8", "fp8-int8"):
        # per-vocab-channel int8 logits head: halves the largest single
        # weight read of the decode step (vocab*E bf16); the bf16 embed
        # stays for token-row lookups.
        params["lm_head_q"] = quantize_linear(
            embed.T.astype(jnp.float32), "w8a8")
    return params


def quantize_params(cfg_q: LlamaConfig, params):
    """bf16 parameter tree (quant='none') -> tree quantized per
    ``cfg_q.quant``, SAME underlying weights (quantize-on-load applied to
    an in-memory tree).  Isolates quantization error for numerics
    studies (benchmark/benchmark_ppl.py)."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for name in ("wqkv", "wo", "wgu", "wd"):
            if name in lp:
                q = quantize_linear(
                    lp[name]["w"].astype(jnp.float32), cfg_q.quant,
                    cfg_q.jdtype)
                if "b" in lp[name]:
                    q["b"] = lp[name]["b"]
                if name == "wgu" and cfg_q.gu256:
                    q = apply_gu256(q, cfg_q.intermediate_size)
                nlp[name] = q
        out["layers"].append(nlp)
    if cfg_q.quant in ("w8a8", "w4a8", "fp8-int8") and "lm_head_q" not in out:
        # vocab-sized f32 temporaries of a whole-matrix quantize OOM a
        # chip that's already holding two model copies — chunk columns
        et = params["embed"].T
        chunks = [quantize_linear(
            et[:, i:i + 16384].astype(jnp.float32), "w8a8")
            for i in range(0, et.shape[1], 16384)]
        out["lm_head_q"] = {
            "w": jnp.concatenate([c["w"] for c in chunks], axis=1),
            "s8": jnp.concatenate([c["s8"] for c in chunks]),
        }
    return out


def init_kv_cache(cfg: LlamaConfig, num_blocks: int, kv_dtype=None):
    """Paged KV cache: per-layer lists of [nb, Hkv, bs, D] buffers (TPU-
    native page layout, kernels/flash_attention.py).  Separate buffers per
    layer — a stacked [L, ...] cache forces XLA to copy each layer's slice
    for every Pallas operand and scatter (measured ~45 ms/step on 8B).

    With ``cfg.kv_fused`` (and lane-aligned head_dim) K and V share one
    [nb, Hkv, bs, 2*D] buffer per layer — one DMA per page in the decode
    kernel, one row-scatter per cache write — and the returned v list is
    all-None (the layer code detects the layout from that)."""
    kv_dtype = kv_dtype or cfg.jdtype
    if cfg.kv_fused and (2 * cfg.head_dim) % 128 == 0:
        shape = (num_blocks, cfg.num_kv_heads, cfg.block_size,
                 2 * cfg.head_dim)
        kvs = [jnp.zeros(shape, kv_dtype) for _ in range(cfg.num_layers)]
        return kvs, [None] * cfg.num_layers
    shape = (num_blocks, cfg.num_kv_heads, cfg.block_size, cfg.head_dim)
    ks = [jnp.zeros(shape, kv_dtype) for _ in range(cfg.num_layers)]
    vs = [jnp.zeros(shape, kv_dtype) for _ in range(cfg.num_layers)]
    return ks, vs


def param_tp_specs(cfg: LlamaConfig, tp_axis: str = "tp",
                   untied_head: bool = False):
    """PartitionSpec pytree matching init_params: column-parallel
    projections shard outputs over tp, row-parallel shard inputs
    (Megatron layout; collectives inserted by the psum calls in the
    layer body when running under shard_map)."""
    from jax.sharding import PartitionSpec as P

    col = {"w": P(None, tp_axis)}
    row = {"w": P(tp_axis, None)}
    if cfg.quant in ("fp8", "int8", "w8a8", "fp8-int8"):
        sk = "s" if cfg.quant in ("fp8", "int8") else "s8"
        col = {"w": P(None, tp_axis), sk: P(tp_axis)}
        row = {"w": P(tp_axis, None), sk: P()}
    elif cfg.quant == "mxfp4":
        col = {"w": P(None, tp_axis), "s": P(None, tp_axis)}
        row = {"w": P(tp_axis, None), "s": P(tp_axis, None)}
    elif cfg.quant == "w4a8":
        col = {"w": P(None, tp_axis), "s4": P(None, tp_axis)}
        row = {"w": P(tp_axis, None), "s4": P(tp_axis, None)}
    layer = {
        "ln1": P(), "ln2": P(),
        "wqkv": dict(col),
        "wo": dict(row),
        "wgu": dict(col),
        "wd": dict(row),
    }
    if cfg.qkv_bias:
        layer["wqkv"]["b"] = P(tp_axis)   # column-parallel bias
    if cfg.qk_norm:
        layer["qnorm"] = P()
        layer["knorm"] = P()
    tree = {
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
        "embed": P(),
        "final_ln": P(),
        "rope": P(),
    }
    if untied_head:
        tree["lm_head"] = P()
    if cfg.quant in ("w8a8", "w4a8", "fp8-int8"):
        tree["lm_head_q"] = {"w": P(), "s8": P()}
    return tree


def params_for_tp(params, cfg: LlamaConfig, tp: int):
    """Permute the fused projection columns into rank-blocked order so a
    plain column sharding gives every TP rank its own [q|k|v] (and
    [gate|up]) slice.  Pure column permutation — logical weights unchanged.
    Must be applied before shard_map when tp > 1."""
    if tp == 1:
        return params
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size

    def block_perm(sizes):
        """Column permutation: [A|B|C] -> per-rank [A_r|B_r|C_r] blocks."""
        import numpy as np

        perm = []
        offs = np.cumsum([0] + sizes[:-1])
        for r in range(tp):
            for off, sz in zip(offs, sizes):
                per = sz // tp
                perm.extend(range(off + r * per, off + (r + 1) * per))
        return np.asarray(perm, np.int64)

    qkv_perm = block_perm([hq * d, hkv * d, hkv * d])
    if cfg.gu256:
        # stored layout is gu256(global [g|u]); the target is per-rank
        # blocks each in gu256 of ITS [g_r|u_r].  Compose the column
        # maps: target col j holds plain col B[j], stored col s holds
        # plain col A[s] => gather index perm[j] = A^-1[B[j]].
        import numpy as np
        from vllm_xpu_kernels_tpu.kernels.quant_matmul import gu256_perm

        A = gu256_perm(i)
        inv_A = np.argsort(A)
        per = i // tp
        B = []
        for r in range(tp):
            base = np.concatenate([np.arange(r * per, (r + 1) * per),
                                   i + np.arange(r * per, (r + 1) * per)])
            B.append(base[gu256_perm(per)])
        gu_perm = inv_A[np.concatenate(B)]
    else:
        gu_perm = block_perm([i, i])

    def apply(p, perm):
        out = {"w": p["w"][:, perm]}
        for sk in ("s", "s8", "s4"):
            if sk in p:
                # 1-D per-channel scales [N] or 2-D group scales [K/g, N]:
                # the permutation is over output columns either way
                out[sk] = (p[sk][:, perm] if p[sk].ndim == 2
                           else p[sk][perm])
        if "b" in p:
            out["b"] = p["b"][perm]
        return out

    new_layers = []
    for lp in params["layers"]:
        nl = dict(lp)
        nl["wqkv"] = apply(lp["wqkv"], qkv_perm)
        nl["wgu"] = apply(lp["wgu"], gu_perm)
        new_layers.append(nl)
    return {**params, "layers": new_layers}


def kv_cache_tp_spec(tp_axis: str = "tp", dp_axis=None):
    """Per-layer cache [nb, Hkv, bs, D]: KV heads sharded over tp; with
    dp, the block pool itself is sharded (each dp replica owns its own
    pages; block tables index the local pool).  Returned as a pytree
    prefix — it applies to every layer's buffer."""
    from jax.sharding import PartitionSpec as P

    return P(dp_axis, tp_axis)


def _lora_for(lora_layer, name, lora_idx):
    if lora_layer is None or name not in lora_layer:
        return None
    la = lora_layer[name]
    return (la["a"], la["b"], lora_idx, la.get("scale", 1.0))


def _attention_block(cfg, lp, x, positions, rope, kc_l, vc_l, slot_mapping,
                     block_table, kv_lens, cu_q, max_q, max_k, tp_axis,
                     k_scale=None, v_scale=None, lora_layer=None,
                     lora_idx=None, fresh_prefill=False, a_q=None,
                     window=None, decode_tail=0):
    t = (x if x is not None else a_q[0]).shape[0]
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = _linear(x, lp["wqkv"], a_q=a_q,
                  lora=_lora_for(lora_layer, "wqkv", lora_idx))
    if "qnorm" in lp:
        # Qwen3-style per-head QK RMSNorm fused with RoPE on packed qkv
        # (reference op csrc/fused_qknorm_rope.cpp:20-535)
        qkv = ops.fused_qk_norm_rope(
            qkv, hq, hkv, hkv, d, cfg.rms_eps, lp["qnorm"], lp["knorm"],
            rope, True, positions)
        q = qkv[:, : hq * d]
        k = qkv[:, hq * d: (hq + hkv) * d]
        v = qkv[:, (hq + hkv) * d:]
    else:
        q = qkv[:, : hq * d]
        k = qkv[:, hq * d: (hq + hkv) * d]
        v = qkv[:, (hq + hkv) * d:]
        q, k = ops.rotary_embedding(positions, q, k, d, rope, is_neox=True)
    fp8kv = kc_l.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)
    fused = vc_l is None        # fused [nb, Hkv, bs, 2*D] page layout
    kv_dt = "fp8" if fp8kv else "auto"
    if fresh_prefill:
        # fresh full prefill: page-granular writes (see
        # ops.reshape_and_cache_tpu_prefill for the safety argument)
        if fused:
            kc_l = ops.reshape_and_cache_tpu_prefill_fused(
                k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l,
                block_table, cu_q, max_q, kv_cache_dtype=kv_dt,
                k_scale=k_scale, v_scale=v_scale)
        else:
            kc_l, vc_l = ops.reshape_and_cache_tpu_prefill(
                k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l, vc_l,
                block_table, cu_q, max_q, kv_cache_dtype=kv_dt,
                k_scale=k_scale, v_scale=v_scale)
    elif fused and max_q == 1 and envs.VXK_DECODE_FRESH_KV():
        # decode fast path: hand the quantized current-token row straight
        # to the attention kernel, which folds it into the online-softmax
        # epilogue AND writes the cache row itself (in-place page-window
        # writeback — the XLA row scatter disappears entirely; see
        # kernels/flash_attention._decode_kernel_dma).  For int8
        # o-projections the per-token output quant fuses into the same
        # epilogue (out_quant).
        from vllm_xpu_kernels_tpu.ops.cache import quantize_for_kv_cache

        oq_ok = (lora_layer is None and envs.VXK_ATTN_OUT_QUANT()
                 and ("s8" in lp["wo"] or "s4" in lp["wo"]))
        kq = quantize_for_kv_cache(
            k.reshape(t, hkv, d), kv_dt, k_scale, kc_l.dtype)
        vq = quantize_for_kv_cache(
            v.reshape(t, hkv, d), kv_dt, v_scale, kc_l.dtype)
        attn, kc_l = ops.flash_attn_varlen_func(
            q.reshape(t, hq, d), kc_l, None, max_q, cu_q, max_k,
            seqused_k=kv_lens, block_table=block_table, causal=True,
            kv_layout="fused", k_descale=k_scale, v_descale=v_scale,
            window_size=window, s_aux=lp.get("sinks"),
            fresh_kv=jnp.concatenate([kq, vq], axis=-1),
            fresh_slots=slot_mapping, out_quant=oq_ok)
        if oq_ok:
            attn, attn_s = attn
            if attn_s is not None:
                out = _linear(None, lp["wo"], tp_axis, reduce_out=True,
                              a_q=(attn.reshape(t, hq * d), attn_s))
                return out, kc_l, vc_l
        out = _linear(attn.reshape(t, hq * d), lp["wo"], tp_axis,
                      reduce_out=True,
                      lora=_lora_for(lora_layer, "wo", lora_idx))
        return out, kc_l, vc_l
    elif fused:
        kc_l = ops.reshape_and_cache_tpu_fused(
            k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l,
            slot_mapping, kv_cache_dtype=kv_dt,
            k_scale=k_scale, v_scale=v_scale,
            unique_pages=(max_q == 1))
    else:
        kc_l, vc_l = ops.reshape_and_cache_tpu(
            k.reshape(t, hkv, d), v.reshape(t, hkv, d), kc_l, vc_l,
            slot_mapping, kv_cache_dtype=kv_dt,
            k_scale=k_scale, v_scale=v_scale)
    layout = "fused" if fused else "bhsd"
    vin = None if fused else vc_l
    if decode_tail > 0 and max_q > 1:
        # mixed-batch split routing (reference flash_api.cpp:236-322):
        # the batch's LAST ``decode_tail`` sequences are 1-token decode
        # rows — sending them through the prefill kernel costs a full
        # bq-padded q tile each; route them to the decode kernel and
        # concatenate.  ``decode_tail`` is static (a jit specialization
        # key, like max_q).
        nd = decode_tail
        bp = int(cu_q.shape[0]) - 1 - nd
        q3 = q.reshape(t, hq, d)
        attn_p = ops.flash_attn_varlen_func(
            q3[: t - nd], kc_l, vin, max_q, cu_q[: bp + 1], max_k,
            seqused_k=kv_lens[:bp], block_table=block_table[:bp],
            causal=True, kv_layout=layout,
            k_descale=k_scale, v_descale=v_scale,
            window_size=window, s_aux=lp.get("sinks"))
        attn_d = ops.flash_attn_varlen_func(
            q3[t - nd:], kc_l, vin, 1,
            jnp.arange(nd + 1, dtype=jnp.int32), max_k,
            seqused_k=kv_lens[bp:], block_table=block_table[bp:],
            causal=True, kv_layout=layout,
            k_descale=k_scale, v_descale=v_scale,
            window_size=window, s_aux=lp.get("sinks"))
        attn = jnp.concatenate([attn_p, attn_d], axis=0)
        out = _linear(attn.reshape(t, hq * d), lp["wo"], tp_axis,
                      reduce_out=True,
                      lora=_lora_for(lora_layer, "wo", lora_idx))
        return out, kc_l, vc_l
    oq_ok = (max_q == 1 and lora_layer is None
             and envs.VXK_ATTN_OUT_QUANT()
             and ("s8" in lp["wo"] or "s4" in lp["wo"]))
    attn = ops.flash_attn_varlen_func(
        q.reshape(t, hq, d), kc_l, vin,
        max_q, cu_q, max_k,
        seqused_k=kv_lens, block_table=block_table, causal=True,
        kv_layout=layout,
        k_descale=k_scale, v_descale=v_scale,
        window_size=window, s_aux=lp.get("sinks"), out_quant=oq_ok)
    if oq_ok:
        attn, attn_s = attn
        if attn_s is not None:
            out = _linear(None, lp["wo"], tp_axis, reduce_out=True,
                          a_q=(attn.reshape(t, hq * d), attn_s))
            return out, kc_l, vc_l
    out = _linear(attn.reshape(t, hq * d), lp["wo"], tp_axis,
                  reduce_out=True,
                  lora=_lora_for(lora_layer, "wo", lora_idx))
    return out, kc_l, vc_l


def _mlp_block(cfg, lp, x, tp_axis, lora_layer=None, lora_idx=None,
               a_q=None):
    if cfg.gu256 and "s8" in lp["wgu"] and lora_layer is None:
        # gu256 layout: GEMM1's epilogue applies silu(gate)*up in-block
        # — the [T, 2I] intermediate never lands in HBM
        if a_q is not None:
            q, a_s = a_q
        else:
            q, a_s = ops.dynamic_per_token_scaled_int8_quant(x)
        act = ops.int8_gemm_w8a8_silu_mul(
            q, lp["wgu"]["w"], a_s, lp["wgu"]["s8"])
        dq, ds = ops.dynamic_per_token_scaled_int8_quant(act)
        return _linear(None, lp["wd"], tp_axis, reduce_out=True,
                       a_q=(dq, ds), out_dtype=act.dtype)
    gu = _linear(x, lp["wgu"], a_q=a_q,
                 lora=_lora_for(lora_layer, "wgu", lora_idx))
    if ("s8" in lp["wd"] or "s4" in lp["wd"]) and lora_layer is None:
        dq, ds = ops.silu_and_mul_per_token_quant(gu)
        return _linear(None, lp["wd"], tp_axis, reduce_out=True,
                       a_q=(dq, ds), out_dtype=gu.dtype)
    act = ops.silu_and_mul(gu)
    return _linear(act, lp["wd"], tp_axis, reduce_out=True,
                   lora=_lora_for(lora_layer, "wd", lora_idx))


def _forward_tokens(cfg, params, token_ids, positions, slot_mapping,
                    block_table, kv_lens, cu_q, max_q, max_k,
                    k_cache, v_cache, tp_axis, k_scale=None, v_scale=None,
                    lora_params=None, lora_idx=None, fresh_prefill=False,
                    mlp_fn=None, decode_tail=0, head_mode="logits",
                    logits_rows=None):
    """Shared prefill/decode body over packed tokens [T].

    ``mlp_fn(cfg, lp, x, tp_axis)`` replaces the dense gated MLP when a
    family swaps it out (MoE models: GPT-OSS); attention / norm / cache
    plumbing stays shared."""
    x = jnp.take(params["embed"], token_ids, axis=0)
    x = tp_psum(x, None)  # embed replicated; no-op
    rope = params["rope"]

    # Unrolled layer loop with per-layer cache buffers (see init_params /
    # init_kv_cache for why nothing is stacked).
    residual = jnp.zeros_like(x)
    k_cache = list(k_cache)
    v_cache = list(v_cache)
    for li, lp in enumerate(params["layers"]):
        ll = (lora_params["layers"][li] if lora_params is not None
              else None)
        # w8a8 without LoRA: norm + per-token int8 quant fused in one
        # Pallas pass (ops.rms_norm_dynamic_per_token_quant int8 tier);
        # LoRA needs the bf16 normed activations, so it keeps the split.
        fuse8 = (("s8" in lp["wqkv"] or "s4" in lp["wqkv"])
                 and ll is None)
        if fuse8:
            hq8, hs8, residual = ops.rms_norm_dynamic_per_token_quant(
                x, lp["ln1"], cfg.rms_eps, jnp.int8, residual=residual)
            h, aq1 = None, (hq8, hs8)
        else:
            h, residual = ops.fused_add_rms_norm(
                x, residual, lp["ln1"], cfg.rms_eps)
            aq1 = None
        attn, kc_l, vc_l = _attention_block(
            cfg, lp, h, positions, rope, k_cache[li], v_cache[li],
            slot_mapping, block_table, kv_lens, cu_q, max_q, max_k,
            tp_axis, k_scale, v_scale, ll, lora_idx,
            fresh_prefill=fresh_prefill, a_q=aq1,
            window=cfg.attn_window(li), decode_tail=decode_tail)
        if fuse8 and mlp_fn is None:
            h2q8, h2s8, residual = ops.rms_norm_dynamic_per_token_quant(
                attn, lp["ln2"], cfg.rms_eps, jnp.int8, residual=residual)
            x = _mlp_block(cfg, lp, None, tp_axis, ll, lora_idx,
                           a_q=(h2q8, h2s8))
        else:
            h2, residual = ops.fused_add_rms_norm(
                attn, residual, lp["ln2"], cfg.rms_eps)
            x = (mlp_fn(cfg, lp, h2, tp_axis) if mlp_fn is not None
                 else _mlp_block(cfg, lp, h2, tp_axis, ll, lora_idx))
        k_cache[li] = kc_l
        v_cache[li] = vc_l
    x = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    x = ops.rms_norm(x, params["final_ln"], cfg.rms_eps)
    # lm_head when the checkpoint is untied (Llama-3), else tied embed;
    # both replicated across tp so logits already agree.  w8a8 trees carry
    # a pre-quantized int8 head ([E, V] + per-vocab scales).
    if head_mode == "argmax" and "lm_head_q" in params:
        from vllm_xpu_kernels_tpu.registry import use_pallas

        if use_pallas():
            from vllm_xpu_kernels_tpu.kernels.quant_matmul import (
                int8_lm_head_argmax_pallas)

            hq8, _ = ops.dynamic_per_token_scaled_int8_quant(x)
            ids = int8_lm_head_argmax_pallas(
                hq8, params["lm_head_q"]["w"], params["lm_head_q"]["s8"])
            return ids, k_cache, v_cache
        logits = _linear(x, params["lm_head_q"]).astype(jnp.float32)
        return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                k_cache, v_cache)
    if head_mode == "argmax":
        # bf16-head trees: contract still returns token ids
        head = params.get("lm_head", params["embed"])
        logits = jnp.dot(x, head.T, preferred_element_type=jnp.float32)
        return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                k_cache, v_cache)
    if logits_rows is not None:
        # serving prefill only reads the last row of each sequence; at
        # 4x1024 prefill the full-row int8 lm_head GEMM is ~4.3 TFLOP
        # (~12 ms on v5e) of pure waste — slice BEFORE the head
        x = jnp.take(x, logits_rows, axis=0)
    if "lm_head_q" in params:
        logits = _linear(x, params["lm_head_q"]).astype(jnp.float32)
    else:
        head = params.get("lm_head", params["embed"])
        logits = jnp.dot(x, head.T, preferred_element_type=jnp.float32)
    return logits, k_cache, v_cache


def decode_step(
    cfg: LlamaConfig,
    params,
    token_ids: jax.Array,       # [B]
    positions: jax.Array,       # [B] (== kv_lens - 1)
    slot_mapping: jax.Array,    # [B] global cache slots for the new token
    block_table: jax.Array,     # [B, max_blocks]
    kv_lens: jax.Array,         # [B] (including the new token)
    k_cache, v_cache,
    max_seqlen_k: int,
    tp_axis: Optional[str] = None,
    k_scale=None, v_scale=None,
    lora_params=None, lora_idx=None,
    head_mode: str = "logits",   # "logits" | "argmax" (greedy token ids)
):
    """One continuous-batching decode step -> (logits [B, V], caches).

    ``head_mode="argmax"`` (greedy serving, int8-head trees): the lm_head
    GEMM and the argmax fuse into one Pallas kernel and the first return
    is the token ids [B] int32 — the [B, V] f32 logits (32 MB at 8B
    batch 32) never touch HBM.  Falls back to logits+argmax when the
    tree has no int8 head or the ref tier is forced."""
    b = token_ids.shape[0]
    cu_q = jnp.arange(b + 1, dtype=jnp.int32)
    return _forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_q, 1, max_seqlen_k, k_cache, v_cache, tp_axis,
        k_scale, v_scale, lora_params, lora_idx, head_mode=head_mode)


def prefill_step(
    cfg: LlamaConfig,
    params,
    token_ids: jax.Array,       # [T] packed varlen
    positions: jax.Array,       # [T]
    cu_seqlens_q: jax.Array,    # [B+1]
    slot_mapping: jax.Array,    # [T]
    block_table: jax.Array,
    kv_lens: jax.Array,
    k_cache, v_cache,
    max_seqlen_q: int,
    max_seqlen_k: int,
    tp_axis: Optional[str] = None,
    k_scale=None, v_scale=None,
    lora_params=None, lora_idx=None,
    fresh_prefill: bool = False,
    decode_tail: int = 0,
    logits_rows=None,           # [R] int32: only these rows' logits
):
    """Chunked/whole prefill over packed sequences -> (logits [T, V],
    caches).  Set ``fresh_prefill=True`` (static) when every sequence in
    the batch starts at position 0 — enables page-granular cache writes
    (ops.reshape_and_cache_tpu_prefill).

    ``decode_tail`` (static): the batch's last N sequences are 1-token
    decode rows of a MIXED batch — their attention routes to the paged
    decode kernel instead of paying a padded prefill q tile
    (reference flash_api.cpp:236-322 mix_batch split).  Measured 4.4x
    on a 1024-token chunk + 31 decode riders (16-layer 8B shapes,
    1xv5e: 330 -> 75 ms/step — the varlen prefill kernel pads every
    rider to max_seqlen_q q rows)."""
    return _forward_tokens(
        cfg, params, token_ids, positions, slot_mapping, block_table,
        kv_lens, cu_seqlens_q, max_seqlen_q, max_seqlen_k,
        k_cache, v_cache, tp_axis, k_scale, v_scale,
        lora_params, lora_idx, fresh_prefill=fresh_prefill,
        decode_tail=decode_tail, logits_rows=logits_rows)

"""Multi-LoRA serving adapters for the Llama model family.

The reference ships the batched-gather matvec kernels (bgmv_shrink /
bgmv_expand / bgmv_expand_slice, csrc/xpu/lora/) and vLLM owns adapter
management; here both live in one place.  Adapters are stacked per slot
([n_lora, ...]) and every token carries an adapter index (-1 = base
model), so one batch can serve many adapters — the bgmv contract.

Layouts (matching ops.lora):
  a: [L, R, K]   shrink weights  (out[t,r] = Σ_h x[t,h]·a[idx_t,r,h])
  b: [L, N, R]   expand weights  (Δ[t,n]  = Σ_r h[t,r]·b[idx_t,n,r])
  effective ΔW for adapter l = scale · a[l].T @ b[l].T  ([K, N])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


TARGETS = ("wqkv", "wo", "wgu", "wd")


def init_lora_adapters(cfg, n_lora: int, rank: int, key=None,
                       alpha: float | None = None,
                       targets=TARGETS, dtype=jnp.bfloat16):
    """Random-initialized adapter stack pytree matching
    ``models.llama`` layer shapes; ``b`` starts at zero (standard LoRA
    init: adapters are a no-op until trained/loaded)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    e = cfg.hidden_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size
    dims = {"wqkv": (e, (hq + 2 * hkv) * d), "wo": (hq * d, e),
            "wgu": (e, 2 * i), "wd": (i, e)}
    scale = float(alpha if alpha is not None else rank) / rank
    layers = []
    keys = jax.random.split(key, cfg.num_layers * len(targets))
    ki = iter(keys)
    for _ in range(cfg.num_layers):
        lp = {}
        for name in targets:
            k_dim, n_dim = dims[name]
            a = (jax.random.normal(next(ki), (n_lora, rank, k_dim),
                                   jnp.float32) * (1.0 / k_dim ** 0.5))
            lp[name] = {
                "a": a.astype(dtype),
                "b": jnp.zeros((n_lora, n_dim, rank), dtype),
                "scale": scale,
            }
        layers.append(lp)
    return {"layers": layers}


def merge_adapter(params, lora_params, slot: int):
    """Fold one adapter slot into dense weights -> a new param tree
    (test / single-adapter deployment helper).  Only valid for
    unquantized trees."""
    out_layers = []
    for lp, ll in zip(params["layers"], lora_params["layers"]):
        nl = dict(lp)
        for name, ad in ll.items():
            assert "s" not in lp[name] and "s8" not in lp[name], (
                "merge_adapter needs an unquantized base tree")
            a = ad["a"][slot].astype(jnp.float32)     # [R, K]
            b = ad["b"][slot].astype(jnp.float32)     # [N, R]
            dw = ad["scale"] * (a.T @ b.T)            # [K, N]
            nl[name] = {"w": (lp[name]["w"].astype(jnp.float32) + dw
                              ).astype(lp[name]["w"].dtype)}
        out_layers.append(nl)
    return {**params, "layers": out_layers}

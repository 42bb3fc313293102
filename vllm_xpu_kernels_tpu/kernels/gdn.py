"""Pallas kernel for the chunked gated delta rule (GDN / Qwen3-Next).

TPU-native replacement for the reference's 6-sub-kernel chunked scan
(prepare / compute_A / UT-inverse / compute_wu / fwd_o with inter-chunk
state recurrence, reference:
csrc/xpu/gdn_attn/xe_2/chunk_gated_delta_rule_kernels_xe2.hpp:53-1503).

One grid step = one (batch·value-head, chunk): the whole WY-transform
chain runs on VMEM-resident [C, ·] tiles with the inter-chunk state
S [Hv, Hk] carried in scratch — no HBM round-trips between the chain's
matmuls, which is the point vs the XLA scan formulation (ops/gdn.py
``_chunked_delta_rule``) whose per-chunk intermediates (ratio, A, ρ …)
each cross HBM between ops.

The unit-lower-triangular solve (I + A)ρ = rhs is materialized as an
explicit inverse by geometric-series doubling — A is strictly lower
triangular, hence nilpotent (A^C = 0), so

    (I + A)^{-1} = Σ_{i<C} (-A)^i = Π_{m} (I + (-A)^{2^m})

computed with 2·log2(C) [C, C] MXU matmuls (the reference's UT-inverse
kernel plays this role).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.registry import interpret_mode


def _gdn_chunk_kernel(spec, cs_ref, beta_ref, q_ref, k_ref, v_ref, s0_ref,
                      o_ref, sfin_ref, s_ref):
    import jax.experimental.pallas as pl

    c = spec["chunk"]
    jc = pl.program_id(1)

    @pl.when(jc == 0)
    def _():
        s_ref[...] = s0_ref[0].astype(jnp.float32)       # [Hv, Hk]

    s = s_ref[...]
    cs = cs_ref[0, :, 0]                                 # [C] cumsum log g
    beta = beta_ref[0, :, 0]                             # [C]
    qh = q_ref[0].astype(jnp.float32)                    # [C, Hk] (q·scale)
    kh = k_ref[0].astype(jnp.float32)                    # [C, Hk]
    vh = v_ref[0].astype(jnp.float32)                    # [C, Hv]

    ii = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    dif = cs[:, None] - cs[None, :]                      # log G_i/G_j
    # mask BEFORE exp: upper-triangle ratios overflow (cs decreasing)
    ratio_lo = jnp.exp(jnp.where(ii > jj, dif, -jnp.inf))   # strict lower
    ratio_inc = jnp.exp(jnp.where(ii >= jj, dif, -jnp.inf))  # incl. diag

    kk = jax.lax.dot_general(kh, kh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a = beta[:, None] * kk * ratio_lo                    # strictly lower

    # (I + A)^-1 by nilpotent geometric-series doubling
    eye = (ii == jj).astype(jnp.float32)
    m = -a
    t_inv = eye + m
    n_lvl = max(int(c - 1).bit_length() - 1, 0)
    for _ in range(n_lvl):
        m = jnp.dot(m, m, preferred_element_type=jnp.float32)
        t_inv = t_inv + jnp.dot(t_inv, m,
                                preferred_element_type=jnp.float32)

    gfull = jnp.exp(cs)[:, None]                         # [C, 1] G_i
    ks0 = jax.lax.dot_general(kh, s, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [C,Hv]
    rhs = beta[:, None] * (vh - gfull * ks0)
    rho = jnp.dot(t_inv, rhs, preferred_element_type=jnp.float32)  # [C,Hv]

    qk = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mmat = qk * ratio_inc
    qs0 = jax.lax.dot_general(qh, s, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o = gfull * qs0 + jnp.dot(mmat, rho,
                              preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)

    g_c = jnp.exp(cs[c - 1])
    k_dec = kh * jnp.exp(cs[c - 1] - cs)[:, None]        # (G_C/G_j) k_j
    s_new = g_c * s + jax.lax.dot_general(
        rho, k_dec, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Hv, Hk]
    s_ref[...] = s_new

    @pl.when(jc == pl.num_programs(1) - 1)
    def _():
        sfin_ref[0] = s_new.astype(sfin_ref.dtype)


def chunked_delta_rule_pallas(q, k, v, beta, g, s0, chunk: int = 64):
    """Same contract as ops.gdn._chunked_delta_rule: q/k [B, T, NV, Hk]
    (q pre-scaled), v [B, T, NV, Hv], beta/g [B, T, NV],
    s0 [B, NV, Hv, Hk]; T a multiple of ``chunk`` with masked tail tokens
    given beta=0, g=1 (and q zeroed).  -> (o [B, T, NV, Hv], s_final)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, nv, hk = k.shape
    hv = v.shape[-1]
    c = chunk
    nc = t // c
    bv = b * nv

    def fold(x):     # [B, T, NV, H] -> [B*NV, T, H]
        return x.transpose(0, 2, 1, 3).reshape(bv, t, x.shape[-1])

    qf = fold(q).astype(jnp.float32)
    kf = fold(k).astype(jnp.float32)
    vf = fold(v).astype(jnp.float32)
    # per-chunk cumulative log-decay, computed once in XLA (elementwise +
    # cumsum fuse); the kernel consumes cs directly
    lg = jnp.log(jnp.maximum(g, 1e-30)).transpose(0, 2, 1).reshape(
        bv, nc, c)
    cs = jnp.cumsum(lg, axis=-1).reshape(bv, t, 1)
    bf = beta.transpose(0, 2, 1).reshape(bv, t, 1)
    s0f = s0.reshape(bv, hv, hk)

    spec = dict(chunk=c)
    grid = (bv, nc)

    def tmap(i, j):
        return (i, j, 0)

    o, s_fin = pl.pallas_call(
        functools.partial(_gdn_chunk_kernel, spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, 1), tmap),               # cs
            pl.BlockSpec((1, c, 1), tmap),               # beta
            pl.BlockSpec((1, c, hk), tmap),              # q
            pl.BlockSpec((1, c, hk), tmap),              # k
            pl.BlockSpec((1, c, hv), tmap),              # v
            pl.BlockSpec((1, hv, hk), lambda i, j: (i, 0, 0)),   # s0
        ],
        out_specs=[
            pl.BlockSpec((1, c, hv), tmap),              # o
            pl.BlockSpec((1, hv, hk), lambda i, j: (i, 0, 0)),   # s_final
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bv, t, hv), jnp.float32),
            jax.ShapeDtypeStruct((bv, hv, hk), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((hv, hk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(cs, bf, qf, kf, vf, s0f)

    o4 = o.reshape(b, nv, t, hv).transpose(0, 2, 1, 3)
    return o4, s_fin.reshape(b, nv, hv, hk)

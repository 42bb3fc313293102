"""Expert-parallel fused MoE over a mesh axis.

The reference bakes EP into op contracts (init_expert_map, ep_rank/ep_size
args, expert_map filtering — SURVEY.md §2.17) and leaves the collectives to
vLLM.  Here the full EP forward is provided: inside ``shard_map``, each
rank holds its batch shard and its local experts; tokens are exchanged with
XLA collectives over ICI and each rank's local contribution is combined
with a reduce.

Two dispatch strategies:

- ``gather`` (default): all_gather the token shard over the EP axis, run
  the local-expert fused MoE on the full batch (non-local experts masked
  by the expert map), then reduce_scatter the partial outputs back.  Two
  collectives, perfectly load-balanced compute, no capacity limits — the
  right trade below ~10k tokens/rank where MoE is weight-bandwidth-bound
  anyway.
- ``a2a``: capacity-bucketed all-to-all token dispatch (the reference's
  EP contract — fused_moe_prologue/init_expert_map/remap_hidden_states
  exist exactly to move only ROUTED tokens, csrc/moe/
  fused_moe_prologue.hpp:155-559, remap_hidden_states.cpp:9-415).  Each
  rank sorts its (token, k) slots by destination rank, packs them into
  per-destination capacity buckets, exchanges with ``lax.all_to_all``,
  computes the received slots against its local experts (K==1 routing),
  and a second all-to-all returns the weighted contributions, which a
  segment-sum lands back in token order.

ICI-byte accounting (why a2a wins at prefill scale): per rank, gather
moves ``ep·T·D`` bytes in (all_gather) and ``ep·T·D`` out (psum_scatter's
ring traffic).  a2a moves ``ep·C·D ≈ cf·topk·T·D`` each way, i.e. a
``cf·topk/ep`` fraction — at ep=8, topk=2, cf=1.25 that is ~3.2x fewer
ICI bytes, and the local GEMM batch shrinks from ``ep·T`` rows to
``ep·C ≈ cf·topk·T`` rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ep_fused_moe(
    hidden_states: jax.Array,      # [T_local, D] this rank's token shard
    w13_local: jax.Array,          # [E_local, D, 2I] this rank's experts
    w2_local: jax.Array,           # [E_local, I, D]
    topk_weights: jax.Array,       # [T_local, K]
    topk_ids: jax.Array,           # [T_local, K] GLOBAL expert ids
    axis: str,                     # EP mesh axis (inside shard_map)
    *,
    activation: str = "silu",
    quant: str = "none",
    w13_scales=None, w2_scales=None,
    w13_bias=None, w2_bias=None,
    group_size: int = 0,
    block_m: int = 128,
    strategy: str = "gather",      # gather | a2a
    capacity: Optional[int | str] = None,
    return_dropped: bool = False,
    gate_up_layout: str = "interleaved",
) -> jax.Array:
    """-> [T_local, D]: each token's full MoE output (sum over its top-k
    experts, wherever they live).

    ``strategy="a2a"``: all-to-all token dispatch.  ``capacity`` is the
    per-(src, dst)-rank slot budget:

    - ``None`` (default): ``ceil(cf·K·T_local/ep_size)`` with the
      capacity factor ``cf`` from ``VXK_EP_A2A_CF`` (default 1.25) —
      the standard capacity-factor MoE contract.  This is what makes
      a2a beat gather on ICI bytes BY DEFAULT: per rank and direction
      it moves ``ep·C·D ≈ cf·K·T·D`` bytes vs gather's ``ep·T·D``,
      a ``cf·K/ep`` fraction (~3.2x fewer at ep=8, K=2, cf=1.25).
    - ``"exact"``: the lossless worst case ``T_local·K`` (no token can
      ever drop, every slot of one rank could route to one
      destination) — ICI bytes then equal ``ep·K·T·D``, i.e. a2a only
      ties gather at K==ep; use for correctness baselines.
    - an int: explicit budget.

    Overflow slots beyond capacity are dropped (that expert's
    contribution is lost for that token; the other top-k contributions
    survive).  Drops are OBSERVABLE: with ``return_dropped=True`` the
    return is ``(out, dropped)`` where ``dropped`` is this rank's
    count of valid routing slots that exceeded their bucket — psum it
    over the axis for the global count and alert when it is nonzero.
    ``strategy="gather"`` never drops (dropped == 0)."""
    if strategy == "a2a":
        out = _ep_fused_moe_a2a(
            hidden_states, w13_local, w2_local, topk_weights, topk_ids,
            axis, activation=activation, quant=quant,
            w13_scales=w13_scales, w2_scales=w2_scales,
            w13_bias=w13_bias, w2_bias=w2_bias, group_size=group_size,
            block_m=block_m, capacity=capacity,
            gate_up_layout=gate_up_layout)
        return out if return_dropped else out[0]
    from vllm_xpu_kernels_tpu.ops.moe import tpu_fused_moe

    ep_size = jax.lax.axis_size(axis)
    ep_rank = jax.lax.axis_index(axis)
    e_local = w13_local.shape[0]

    # gather every rank's tokens + routing (tokens are small next to
    # expert weights; this rides ICI)
    x_all = jax.lax.all_gather(hidden_states, axis, tiled=True)
    tw_all = jax.lax.all_gather(topk_weights, axis, tiled=True)
    ti_all = jax.lax.all_gather(topk_ids, axis, tiled=True)

    # local contribution: only this rank's experts count (expert_map
    # sends non-local ids to -1 inside the fused pipeline)
    partial = tpu_fused_moe(
        x_all, w13_local, w2_local, tw_all, ti_all,
        activation=activation, quant=quant,
        w13_scales=w13_scales, w2_scales=w2_scales,
        w13_bias=w13_bias, w2_bias=w2_bias, group_size=group_size,
        num_experts=e_local * ep_size, ep_rank=ep_rank, ep_size=ep_size,
        block_m=block_m, gate_up_layout=gate_up_layout)

    # sum partials across ranks, landing each rank's own token shard
    out = jax.lax.psum_scatter(
        partial.astype(jnp.float32), axis, scatter_dimension=0, tiled=True)
    out = out.astype(hidden_states.dtype)
    if return_dropped:
        return out, jnp.zeros((), jnp.int32)
    return out


def _ep_fused_moe_a2a(
    hidden_states, w13_local, w2_local, topk_weights, topk_ids, axis, *,
    activation, quant, w13_scales, w2_scales, w13_bias, w2_bias,
    group_size, block_m, capacity, gate_up_layout="interleaved",
):
    """All-to-all EP dispatch (see module docstring for the ICI-byte
    accounting).  Runs inside ``shard_map`` on ``axis``.

    Slot plumbing: the ``T·K`` routing slots are stable-sorted by
    destination rank; slot ``i`` of destination ``r`` lands in send
    buffer row ``r·C + i``.  ``all_to_all`` is self-inverse on that
    layout, so the returned contributions sit at exactly the send
    positions and a gather + segment-sum restores token order — no
    index traffic crosses the ICI except the (expert id, weight) row
    metadata itself."""
    from vllm_xpu_kernels_tpu.ops.moe import tpu_fused_moe

    ep = jax.lax.axis_size(axis)
    e_local = w13_local.shape[0]
    t, d = hidden_states.shape
    k = topk_ids.shape[1]
    n = t * k
    if capacity is None:
        from vllm_xpu_kernels_tpu.envs import VXK_EP_A2A_CF

        cap = min(-(-int(VXK_EP_A2A_CF() * n) // ep), n)
    elif capacity == "exact":
        cap = n
    else:
        cap = min(int(capacity), n)

    ids = topk_ids.astype(jnp.int32).reshape(n)
    w = topk_weights.astype(jnp.float32).reshape(n)
    valid = ids >= 0
    dest = jnp.where(valid, ids // e_local, ep)           # ep == drop
    # stable sort by destination; position within the destination's
    # segment = rank of the slot among equals
    order = jnp.argsort(dest, stable=True)
    dest_s = dest[order]
    counts = jnp.bincount(dest_s, length=ep + 1)
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    pos_in_seg = jnp.arange(n) - seg_start[dest_s]
    ok = (dest_s < ep) & (pos_in_seg < cap)
    send_slot = jnp.where(ok, dest_s * cap + pos_in_seg, ep * cap)

    src_tok = order // k                                  # token of slot
    rows = jnp.take(hidden_states, src_tok, axis=0)       # [n, D]
    send_x = jnp.zeros((ep * cap, d), hidden_states.dtype
                       ).at[send_slot].set(rows, mode="drop",
                                           unique_indices=True)
    # row metadata: LOCAL expert id on the destination rank + routing
    # weight.  Unused capacity slots carry (expert 0, weight 0, zero
    # row) — an exact no-op contribution that needs no sentinel
    # plumbing in the fused pipeline.
    send_e = jnp.zeros((ep * cap,), jnp.int32).at[send_slot].set(
        ids[order] % e_local, mode="drop", unique_indices=True)
    send_w = jnp.zeros((ep * cap,), jnp.float32).at[send_slot].set(
        w[order], mode="drop", unique_indices=True)

    recv_x = jax.lax.all_to_all(send_x, axis, split_axis=0,
                                concat_axis=0, tiled=True)
    recv_e = jax.lax.all_to_all(send_e, axis, split_axis=0,
                                concat_axis=0, tiled=True)
    recv_w = jax.lax.all_to_all(send_w, axis, split_axis=0,
                                concat_axis=0, tiled=True)

    # local compute: received slots are single-expert "tokens" (K == 1)
    contrib = tpu_fused_moe(
        recv_x, w13_local, w2_local,
        recv_w[:, None], recv_e[:, None],
        activation=activation, quant=quant,
        w13_scales=w13_scales, w2_scales=w2_scales,
        w13_bias=w13_bias, w2_bias=w2_bias, group_size=group_size,
        num_experts=e_local, block_m=block_m,
        gate_up_layout=gate_up_layout).astype(jnp.float32)

    # return contributions to their source ranks; all_to_all restores
    # the send-buffer layout exactly
    back = jax.lax.all_to_all(contrib, axis, split_axis=0,
                              concat_axis=0, tiled=True)
    back = jnp.concatenate([back, jnp.zeros((1, d), back.dtype)])
    y = back[jnp.where(ok, send_slot, ep * cap)]          # [n, D]
    out = jax.ops.segment_sum(y, src_tok, num_segments=t)
    dropped = jnp.sum((dest_s < ep) & ~ok).astype(jnp.int32)
    return out.astype(hidden_states.dtype), dropped

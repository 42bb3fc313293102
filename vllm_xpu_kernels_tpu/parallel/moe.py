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
- an all-to-all dispatch (token routing with capacity buckets) is the
  planned optimization for prefill-scale batches; the op signature stays
  the same.
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
) -> jax.Array:
    """-> [T_local, D]: each token's full MoE output (sum over its top-k
    experts, wherever they live)."""
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
        block_m=block_m)

    # sum partials across ranks, landing each rank's own token shard
    out = jax.lax.psum_scatter(
        partial.astype(jnp.float32), axis, scatter_dimension=0, tiled=True)
    return out.astype(hidden_states.dtype)

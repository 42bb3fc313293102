"""Collective/compute overlap primitives for the TP layer.

The north star prescribes "all-gather/reduce-scatter collectives
overlapped with dequant+matmul" (SURVEY.md §2.17 comm-backend row).  On
TPU the mechanism is NOT manual comm threads (the reference delegates
comms to vLLM/NCCL; we delegate to XLA): collectives lower to
``*-start``/``*-done`` async pairs and the latency-hiding scheduler
moves independent compute between them.  What the scheduler CANNOT do
is overlap a collective with compute that *depends on it* — and a
Megatron row-parallel matmul's ``psum`` has exactly that shape: one
monolithic GEMM, one psum on the critical path, nothing to hide behind.

These helpers restructure the matmul so overlap is POSSIBLE: the output
(or gather) dimension splits into C chunks, giving the scheduler C-1
windows where chunk i's collective flies while chunk i+1's GEMM runs.
Numerics are exact (same contractions, same f32 psum reductions — only
the grouping changes).  See docs/overlap_design.md for the measured HLO
schedules and when to enable this (single-chip hardware cannot measure
the win; the dryrun mesh verifies semantics + schedule structure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_parallel_matmul_overlapped(
    x: jax.Array,          # [T, K_local] this rank's activation shard
    w: jax.Array,          # [K_local, N] row-sharded weight
    axis: str,             # TP mesh axis (inside shard_map)
    n_chunks: int = 4,
) -> jax.Array:
    """Row-parallel ``psum_r(x_r @ w_r)`` with the output N dimension
    split into ``n_chunks`` independent (GEMM → psum) pairs: chunk i's
    psum overlaps chunk i+1's GEMM under XLA's latency-hiding scheduler.
    Exact: each output column sees the identical contraction and psum.

    -> [T, N] f32 (caller casts; matches ``tp_psum`` composition)."""
    n = w.shape[1]
    c = max(1, min(n_chunks, n))
    while n % c:
        c -= 1
    outs = []
    for i in range(c):
        wc = jax.lax.slice_in_dim(w, i * (n // c), (i + 1) * (n // c),
                                  axis=1)
        part = jnp.dot(x, wc, preferred_element_type=jnp.float32)
        outs.append(jax.lax.psum(part, axis))
    return jnp.concatenate(outs, axis=1)


def allgather_matmul_overlapped(
    x: jax.Array,          # [T_local, K] this rank's token shard
    w: jax.Array,          # [K, N] replicated (or column shard)
    axis: str,
) -> jax.Array:
    """Ring all-gather-matmul: instead of ``all_gather(x) @ w`` (the
    whole gather lands before any compute), rotate the token shards
    around the ring with ``ppermute`` and multiply each arriving shard
    immediately — step s's ppermute overlaps step s-1's GEMM.  The
    classic decomposition (scaling-book collective-matmul); exact, same
    per-shard contractions.

    -> [T_local * tp, N] in ring order (row block r holds the shard of
    rank ``(my_rank - r) mod tp`` — callers that need rank order roll
    it; reductions over tokens don't care)."""
    tp = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    perm = [(r, (r + 1) % tp) for r in range(tp)]
    outs = []
    cur = x
    for s in range(tp):
        outs.append(jnp.dot(cur, w, preferred_element_type=jnp.float32))
        if s + 1 < tp:
            cur = jax.lax.ppermute(cur, axis, perm)
    out = jnp.concatenate(outs, axis=0)
    # restore global token order: block r of the ring output is the
    # shard of rank (idx - r) mod tp; a gather by block index fixes it
    order = (idx - jnp.arange(tp)) % tp
    inv = jnp.zeros((tp,), jnp.int32).at[order].set(
        jnp.arange(tp, dtype=jnp.int32))
    t_loc = x.shape[0]
    blocks = out.reshape(tp, t_loc, -1)
    return jnp.take(blocks, inv, axis=0).reshape(tp * t_loc, -1)

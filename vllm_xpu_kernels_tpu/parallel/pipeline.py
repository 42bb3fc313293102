"""Pipeline parallelism: GPipe-style stage-sharded execution over a mesh
axis.

The reference delegates PP to vLLM entirely (SURVEY.md §2.17: "PP: none —
kernel library").  Here stage parallelism is a first-class mesh axis:
layers are partitioned into ``n`` contiguous stages, stage ``i`` lives on
mesh slice ``pp=i``, and microbatches stream through the ring with
``ppermute`` hops over ICI.  All devices run the same program (SPMD);
bubble steps compute on garbage that is never read — the standard GPipe
schedule expressed for XLA's static-shape world.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

AXIS_PP = "pp"


def gpipe_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,              # [M, mb, ...] microbatched input (replicated)
    axis: str = AXIS_PP,
    *,
    collect: bool = True,
):
    """Run ``stage_fn(stage_params, mb)`` as a pipeline of ``n`` stages
    (``n`` = size of mesh axis ``axis``; must be called inside
    ``shard_map``).

    ``stage_params`` is this device's stage's parameters (shard the
    stacked [n_stages, ...] pytree over ``axis`` and index ``[0]`` before
    calling, or build per-stage params directly).  ``stage_fn`` must
    preserve the microbatch shape/dtype (homogeneous stages — the usual
    transformer-layer case).

    Schedule: M + n - 1 steps; at step ``s`` this device processes
    microbatch ``s - stage_index`` (when in range).  Activations hop
    stage i -> i+1 with ``ppermute``.  Returns [M, mb, ...]: with
    ``collect=True`` the final outputs are broadcast to every stage via
    ``psum`` (bubble shards contribute zeros), else only the last stage
    holds real data.
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    m = x.shape[0]
    steps = m + n - 1
    outs = jnp.zeros(x.shape, x.dtype)
    recv = jnp.zeros(x.shape[1:], x.dtype)
    perm = [(i, i + 1) for i in range(n - 1)]

    for s in range(steps):
        mb_idx = min(s, m - 1)
        inp = jnp.where(idx == 0, x[mb_idx], recv)
        act = stage_fn(stage_params, inp)
        done = s - (n - 1)
        if done >= 0:
            keep = (idx == n - 1)
            outs = outs.at[done].set(
                jnp.where(keep, act, outs[done]))
        if s < steps - 1:
            recv = jax.lax.ppermute(act, axis, perm)
    if collect:
        outs = jax.lax.psum(
            jnp.where(idx == n - 1, outs, jnp.zeros_like(outs)), axis)
    return outs


def stack_stage_params(per_layer_params: list, n_stages: int):
    """[L layers of pytree] -> pytree stacked [n_stages, L/n, ...] for
    sharding over the pp axis (leading dim = stage)."""
    l = len(per_layer_params)
    assert l % n_stages == 0, (l, n_stages)
    per_stage = l // n_stages
    groups = [per_layer_params[i * per_stage:(i + 1) * per_stage]
              for i in range(n_stages)]
    stacked_stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *g) for g in groups]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_stages)

"""Mesh construction + sharding helpers.

Axis conventions (the TP guidance baked into the reference's op contracts —
per-rank head counts, `tp_size` args, EP expert maps — becomes explicit
axes here; reference: csrc/flash_attn/flash_api.cpp:349-360,
csrc/moe/init_expert_map.cpp:9-78):

- ``dp``: data/batch parallel (requests sharded across replicas)
- ``tp``: tensor parallel (attention heads / MLP columns / experts' inner
  dims sharded; all-reduce after row-parallel projections)
- ``ep``: expert parallel (MoE experts sharded; all-to-all dispatch)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_TP = "tp"
AXIS_EP = "ep"


def make_mesh(
    dp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(dp, tp) mesh over the available devices; tp defaults to
    n_devices // dp.  TP should map to the fastest (ICI) axis — on a
    multi-host slice put tp innermost, which this layout does."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if tp is None:
        tp = n // dp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(devs.reshape(dp, tp), (AXIS_DP, AXIS_TP))


def tp_psum(x, axis: Optional[str]):
    """All-reduce over the TP axis when running inside shard_map; no-op
    outside (single-device path)."""
    if axis is None:
        return x
    return jax.lax.psum(x, axis)


def shard_leading(mesh: Mesh, axis: str):
    """NamedSharding that shards an array's leading dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())

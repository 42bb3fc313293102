"""Mesh construction + sharding helpers.

Axis conventions (the TP guidance baked into the reference's op contracts —
per-rank head counts, `tp_size` args, EP expert maps — becomes explicit
axes here; reference: csrc/flash_attn/flash_api.cpp:349-360,
csrc/moe/init_expert_map.cpp:9-78):

- ``dp``: data/batch parallel (requests sharded across replicas)
- ``tp``: tensor parallel (attention heads / MLP columns / experts' inner
  dims sharded; all-reduce after row-parallel projections)
- ``ep``: expert parallel (MoE experts sharded; all-to-all dispatch)
- ``dcn``: the cross-host data-center-network axis (multi-host
  deployments).  ALWAYS outermost: DCN is orders of magnitude slower
  than ICI, so only embarrassingly-parallel work (DP over independent
  request shards) may span it — TP/EP/CP collectives must stay inside a
  host's ICI domain.  ``make_hybrid_mesh`` enforces the layout.
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


AXIS_DCN = "dcn"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bring up the cross-host runtime (call once per host, before any
    jax op).  Thin wrapper over ``jax.distributed.initialize`` — on TPU
    pods the three arguments auto-detect from the metadata server, so a
    bare ``initialize_multihost()`` works; explicit args serve CPU/GPU
    fleets.  Returns this host's process index.  Safe to call in
    single-process runs (no coordinator configured -> no-op, returns 0).

    The reference's per-rank op contracts (ep_rank/ep_size args,
    csrc/moe/init_expert_map.cpp:9-78; per-rank head counts,
    csrc/flash_attn/flash_api.cpp:349-360) are driven above this layer:
    after initialize, ``jax.devices()`` is the GLOBAL device list and
    ``make_hybrid_mesh`` lays hosts out on the dcn axis.
    """
    if jax.process_count() > 1:
        return jax.process_index()          # already initialized
    if coordinator_address is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ and \
                "COORDINATOR_ADDRESS" not in os.environ:
            return 0                        # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def make_hybrid_mesh(
    hosts: Optional[int] = None,
    dp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Hybrid ICI x DCN mesh with axes ``("dcn", "dp", "tp")`` — dcn
    outermost (slowest network), tp innermost (fastest, ICI).

    On real multi-host hardware (``jax.process_count() > 1``) the device
    grid comes from ``mesh_utils.create_hybrid_device_mesh``, which
    keeps each host's devices contiguous in the inner (dp, tp) plane so
    ONLY the dcn axis crosses hosts.  Under a single process (the
    8-device virtual CPU mesh, or one chip) the flat device list is
    grouped into ``hosts`` simulated hosts of ``n/hosts`` contiguous
    devices each — the same locality structure, so collective
    replica-groups can be asserted host-local in tests (see
    tests/test_multihost.py).

    Per-step byte budget this layout buys (docs/multihost_design.md):
    TP psums ride ICI only; the decode step moves ZERO bytes over DCN —
    cross-host traffic is the serving layer's request/token routing
    (~8 B per sequence per step), which is why DP-over-DCN scales at
    ~100% modulo load imbalance.
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    n = devs.size
    if hosts is None:
        hosts = max(1, jax.process_count())
    assert n % hosts == 0, (n, hosts)
    per_host = n // hosts
    if tp is None:
        tp = per_host // dp
    assert dp * tp == per_host, (hosts, dp, tp, n)
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, dp, tp), (hosts, 1, 1), devices=list(devs))
    else:
        grid = devs.reshape(hosts, dp, tp)
    return Mesh(grid, (AXIS_DCN, AXIS_DP, AXIS_TP))


def host_local_replica_groups(mesh: Mesh, axis: str = AXIS_DCN):
    """Device-id groups that each collective over the non-``axis`` axes
    may span — i.e. the per-host groups.  Test helper for asserting that
    a compiled step's collectives never cross the dcn axis."""
    devs = mesh.devices
    h = devs.shape[list(mesh.axis_names).index(axis)]
    flat = devs.reshape(h, -1)
    return [sorted(d.id for d in row) for row in flat]


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

"""Multi-host serving: DP over DCN with per-host continuous batching.

The north-star clause the reference delegates to vLLM (SURVEY.md §2.17 DP
row: "multi-host continuous batching in our serving layer; per-host
request queues over DCN").  Architecture:

- **Within a host**: the model step runs TP over the host's ICI domain
  (parallel/mesh.make_mesh or the inner (dp, tp) plane of
  make_hybrid_mesh); the host owns a private KV page pool
  (BlockManager), Scheduler, and jit caches.  Exactly the single-host
  serving stack — `serve()` — unchanged.
- **Across hosts**: requests are sharded by a ``HostRouter`` (least
  total pending tokens wins, the balance criterion that bounds the
  straggler gap), and each host drives its own continuous-batching loop
  independently.  NO model tensor ever crosses DCN: per decode step the
  cross-host traffic is the routing metadata itself — the prompt on the
  way in, ~8 B (one token id + seq id) per sequence per step on the way
  out.  That is why DP-over-DCN scales at ~100% of per-host throughput
  modulo load imbalance (docs/multihost_design.md has the per-step byte
  budget; ``dcn_ici_byte_report`` computes both sides for a config).

On real hardware each host process calls ``initialize_multihost()``,
builds the SAME router (the request stream is deterministic, so every
host computes identical assignments), and runs ``serve`` only for
``host == jax.process_index()``.  In a single process (tests, the
8-device virtual CPU mesh) ``serve_multihost`` drives all simulated
hosts' loops in one loop — the same code path minus the network.

Reference contracts driven at scale by this layer:
csrc/moe/init_expert_map.cpp:9-78 (EP ranks inside a host),
csrc/flash_attn/flash_api.cpp:349-360 (per-rank head counts under TP).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from vllm_xpu_kernels_tpu.models.runtime import BlockManager
from vllm_xpu_kernels_tpu.models.scheduler import Request, Scheduler, serve


class HostRouter:
    """Shards requests across per-host queues (DP over DCN).

    Deterministic least-loaded assignment: a request goes to the host
    with the fewest TOTAL pending tokens (prompt + max_new), ties to the
    lowest host id — so every host, replaying the same request stream,
    computes the same assignment without any cross-host agreement
    traffic beyond the stream itself.
    """

    def __init__(self, n_hosts: int):
        assert n_hosts >= 1
        self.n_hosts = n_hosts
        self.pending = [0] * n_hosts
        self.assignment: dict[int, int] = {}

    def route(self, req: Request) -> int:
        host = int(np.argmin(self.pending))
        cost = len(req.prompt) + req.max_new_tokens
        self.pending[host] += cost
        self.assignment[req.seq_id] = host
        return host

    def complete(self, req: Request):
        host = self.assignment[req.seq_id]
        self.pending[host] -= len(req.prompt) + req.max_new_tokens


@dataclasses.dataclass
class HostStats:
    host: int
    n_requests: int
    n_preemptions: int
    dcn_bytes: int          # routing metadata this host exchanged


def dcn_ici_byte_report(cfg, batch: int, tp: int, steps: int = 1):
    """Per-step byte budget of the hybrid layout (the measurable proxy
    for multi-host scaling efficiency in a single-process environment).

    ICI (within-host): the TP decode step all-reduces the [B, D] hidden
    twice per layer (attention-out + MLP-down row-parallel psums); a
    ring all-reduce moves 2*(tp-1)/tp of the buffer per link.
    DCN (cross-host): one generated token id (4 B) + seq id (4 B) per
    sequence per step — the model step itself moves ZERO DCN bytes.
    """
    d = cfg.hidden_size
    elt = 2                                   # bf16 activations
    psum_buf = batch * d * elt
    ici = steps * cfg.num_layers * 2 * psum_buf * 2 * (tp - 1) // max(tp, 1)
    dcn = steps * batch * 8
    return {"ici_bytes": int(ici), "dcn_bytes": int(dcn),
            "dcn_over_ici": (dcn / ici) if ici else float("inf")}


def serve_multihost(
    cfg,
    params_per_host,            # list of per-host param trees (replicas)
    caches_per_host,            # list of (kc, vc) per host
    requests: List[Request],
    *,
    prefill_step: Callable,
    decode_step: Callable,
    num_blocks: int,
    n_hosts: Optional[int] = None,
    max_steps: int = 10_000,
    sample=None,
):
    """Drive requests over N hosts (simulated in-process, or 1 real host
    of a pod when ``params_per_host`` has a single entry and the caller
    pre-filtered requests by ``HostRouter`` assignment).

    Returns (results {seq_id: [tokens]}, [HostStats]).
    """
    if n_hosts is None:
        n_hosts = len(params_per_host)
    assert len(params_per_host) == n_hosts
    router = HostRouter(n_hosts)
    shards: list[list[Request]] = [[] for _ in range(n_hosts)]
    for req in requests:
        shards[router.route(req)].append(req)

    results: dict[int, list] = {}
    stats: list[HostStats] = []
    for h in range(n_hosts):
        if not shards[h]:
            stats.append(HostStats(h, 0, 0, 0))
            continue
        mgr = BlockManager(num_blocks, cfg.block_size)
        sched = Scheduler(mgr)
        kc, vc = caches_per_host[h]
        out, sched = serve(
            cfg, params_per_host[h], kc, vc, shards[h],
            prefill_step=prefill_step, decode_step=decode_step,
            scheduler=sched, mgr=mgr, max_steps=max_steps, sample=sample)
        results.update(out)
        dcn = sum(len(r.prompt) * 4 + len(r.out) * 8 for r in shards[h])
        stats.append(HostStats(h, len(shards[h]), sched.n_preemptions,
                               dcn))
        for r in shards[h]:
            router.complete(r)
    return results, stats

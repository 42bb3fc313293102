"""Multi-host tier: hybrid ICI x DCN mesh layout, request routing, and
host-sharded serving equivalence (SURVEY.md §2.17 DP row — "multi-host
continuous batching; per-host request queues over DCN").

Every cross-host scheduling decision must be invisible in the output:
sharding requests over N simulated hosts (each with a private
BlockManager + Scheduler + KV pool) must emit exactly the single-host
streams, and the compiled hybrid-mesh decode step must keep every
collective inside one host's ICI domain (DCN carries only routing
metadata)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_xpu_kernels_tpu.models import (
    LlamaConfig, init_params, init_kv_cache, decode_step, prefill_step)
from vllm_xpu_kernels_tpu.models.scheduler import Request, serve
from vllm_xpu_kernels_tpu.models.runtime import BlockManager
from vllm_xpu_kernels_tpu.models.scheduler import Scheduler
from vllm_xpu_kernels_tpu.models.multihost import (
    HostRouter, dcn_ici_byte_report, serve_multihost)
from vllm_xpu_kernels_tpu.parallel import (
    make_hybrid_mesh, host_local_replica_groups, initialize_multihost)

CFG = LlamaConfig(
    hidden_size=128, num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, vocab_size=256,
    max_position=256, quant="none", block_size=16)


def test_hybrid_mesh_layout():
    """Axes (dcn, dp, tp) with dcn outermost and contiguous per-host
    device groups — the invariant that keeps TP collectives off DCN."""
    mesh = make_hybrid_mesh(hosts=2, dp=1, tp=4)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.devices.shape == (2, 1, 4)
    groups = host_local_replica_groups(mesh)
    assert len(groups) == 2
    # contiguous, disjoint halves of the flat device list
    all_ids = sorted(d.id for d in mesh.devices.reshape(-1))
    assert groups[0] == all_ids[:4] and groups[1] == all_ids[4:]
    # dp > 1 inside a host also works
    mesh2 = make_hybrid_mesh(hosts=2, dp=2, tp=2)
    assert mesh2.devices.shape == (2, 2, 2)


def test_initialize_multihost_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() == 0


def test_host_router_balance_and_determinism():
    rng = np.random.default_rng(0)
    reqs = [Request(i, rng.integers(0, 100, int(n)).astype(np.int64), 8)
            for i, n in enumerate(rng.integers(4, 200, 40))]
    r1, r2 = HostRouter(4), HostRouter(4)
    a1 = [r1.route(q) for q in reqs]
    a2 = [r2.route(q) for q in reqs]
    assert a1 == a2, "routing must be deterministic (replayable per host)"
    # least-loaded keeps the pending spread within one max request cost
    costs = [len(q.prompt) + q.max_new_tokens for q in reqs]
    assert max(r1.pending) - min(r1.pending) <= max(costs)
    # completion returns capacity
    for q in reqs:
        r1.complete(q)
    assert r1.pending == [0, 0, 0, 0]


def test_dcn_byte_report_tiny_fraction():
    rep = dcn_ici_byte_report(CFG, batch=16, tp=4)
    assert rep["dcn_bytes"] < rep["ici_bytes"] * 1e-2


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(7))


def test_multihost_serve_matches_single_host(params):
    """DP over DCN is exact: the multi-host results equal the single-host
    serve() streams request-for-request (greedy decoding)."""
    rng = np.random.default_rng(5)
    lens = [13, 30, 5, 22, 9, 17, 41, 7]
    n_new = [4, 3, 6, 2, 5, 3, 2, 4]
    mk_reqs = lambda: [
        Request(i, rng2.integers(0, CFG.vocab_size, n).astype(np.int64), m)
        for rng2 in [np.random.default_rng(5)]
        for i, (n, m) in enumerate(zip(lens, n_new))]

    # single host
    reqs_a = mk_reqs()
    mgr = BlockManager(64, CFG.block_size)
    kc, vc = init_kv_cache(CFG, 64)
    single, _ = serve(CFG, params, kc, vc, reqs_a,
                      prefill_step=prefill_step, decode_step=decode_step,
                      scheduler=Scheduler(mgr), mgr=mgr)

    # two simulated hosts, each with its OWN half-size KV pool
    reqs_b = mk_reqs()
    caches = [init_kv_cache(CFG, 32), init_kv_cache(CFG, 32)]
    multi, stats = serve_multihost(
        CFG, [params, params], caches, reqs_b,
        prefill_step=prefill_step, decode_step=decode_step,
        num_blocks=32, n_hosts=2)
    assert multi == single
    assert sum(s.n_requests for s in stats) == len(lens)
    assert all(s.n_requests > 0 for s in stats), "router left a host idle"
    assert all(s.dcn_bytes > 0 for s in stats if s.n_requests)


def test_hybrid_decode_step_collectives_host_local(params):
    """Compile the TP decode step on the 2-host hybrid mesh and assert
    no collective replica group crosses the host boundary."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from vllm_xpu_kernels_tpu.models.llama import (
        param_tp_specs, kv_cache_tp_spec, params_for_tp)

    hosts, tp = 2, 2            # CFG has 2 kv heads -> tp <= 2
    mesh = make_hybrid_mesh(hosts=hosts, dp=1, tp=tp,
                            devices=jax.devices()[:hosts * tp])
    cfg_local = CFG.tp_slice(tp)
    p_tp = params_for_tp(params, CFG, tp)
    kc, vc = init_kv_cache(CFG, 8 * hosts)
    batch = 2 * hosts
    kv_len, bs = 20, CFG.block_size
    tok = jnp.zeros((batch,), jnp.int32)
    kv_lens = jnp.full((batch,), kv_len, jnp.int32)
    positions = kv_lens - 1
    nb = -(-kv_len // bs)
    tbl = jnp.asarray((np.arange(batch * nb) % 8).reshape(batch, nb)
                      .astype(np.int32))
    slots = (tbl[jnp.arange(batch), (kv_len - 1) // bs] * bs
             + (kv_len - 1) % bs).astype(jnp.int32)

    def step(params, tok, positions, slots, tbl, kv_lens, kc, vc):
        return decode_step(cfg_local, params, tok, positions, slots, tbl,
                           kv_lens, kc, vc, max_seqlen_k=32, tp_axis="tp")

    sharded = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(param_tp_specs(CFG), P("dcn"), P("dcn"), P("dcn"),
                  P("dcn"), P("dcn"), kv_cache_tp_spec(dp_axis="dcn"),
                  kv_cache_tp_spec(dp_axis="dcn")),
        out_specs=(P("dcn"), kv_cache_tp_spec(dp_axis="dcn"),
                   kv_cache_tp_spec(dp_axis="dcn")),
        check_rep=False))
    args = (p_tp, tok, positions, slots, tbl, kv_lens, kc, vc)
    compiled = sharded.lower(*args).compile()
    logits, _, _ = compiled(*args)
    assert not bool(jnp.isnan(logits).any())

    host_groups = [set(g) for g in host_local_replica_groups(mesh)]
    n_groups = 0
    for m in re.finditer(r"replica_groups=\{\{([0-9,{} ]*)\}\}",
                         compiled.as_text()):
        for grp in m.group(1).split("},{"):
            ids = {int(x) for x in grp.replace("{", "").replace(
                "}", "").split(",") if x.strip() != ""}
            if len(ids) <= 1:
                continue
            n_groups += 1
            assert any(ids <= hg for hg in host_groups), ids
    assert n_groups > 0, "expected TP collectives in the decode step"

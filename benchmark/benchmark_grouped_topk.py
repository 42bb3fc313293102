"""Dedicated grouped-topk (DeepSeek node-limited routing) benchmark.

Role of the reference's benchmark_grouped_topk.py.  Its sweep grid
(/root/reference/benchmark/benchmark_grouped_topk.py:77-83) is tokens
{1,64,256} x experts {16,64,128} x topk {2,4} x topk_group {4,8} x
scoring {sigmoid,softmax}; this script INTENTIONALLY subsets it to
tokens {1,64,256} x experts {64,128} (E=16 is covered by the production
row below and adds no new code path — gating is a [T, E] f32 reduction
regardless, and the op computes in f32 for every input dtype), plus the
DeepSeek-V3 production shape (256 experts, 8 groups, k=8).  Gating is
VPU/latency-bound at these sizes; report per-call latency and GB/s on
the gating matrix.

Usage: python benchmark/benchmark_grouped_topk.py [--quick] [--cpu]
"""

from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    print(f"# chip={detect_chip()} peak {p['hbm_gbps']} GB/s")
    rng = np.random.default_rng(0)

    if args.quick:
        grid = [(256, 128, 4, 8, 4, "sigmoid")]
    else:
        grid = [
            (t, e, k, 8, tg, sf)
            for t, e, k, tg, sf in itertools.product(
                (1, 64, 256), (64, 128), (2, 4), (4, 8),
                ("sigmoid", "softmax"))
        ]
    # DeepSeek-V3 production routing shape (n_group=8, topk_group=4, k=8)
    grid.append((1024, 256, 8, 8, 4, "sigmoid"))

    # anchor BOTH outputs (weights and the int32 topk_ids cast) in the
    # carry so neither can be DCE'd
    fb = lambda y, x, cs: (x * 0.999 + y[0].sum() * 1e-6
                           + y[1].sum().astype(x.dtype) * 1e-9)
    for t, e, k, ng, tg, sf in grid:
        gates = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)

        def step(g, b, _k=k, _ng=ng, _tg=tg, _sf=sf):
            return ops.grouped_topk(
                g, _k, True, _ng, _tg, scoring_func=_sf,
                e_score_correction_bias=b)

        sec = bench_op(step, fb, gates, consts=bias)
        print(report_row(
            f"grouped_topk T={t} E={e} k={k} g={ng}/{tg} {sf}", sec,
            bytes_moved=t * e * 4, peak_gbps=p["hbm_gbps"]))


if __name__ == "__main__":
    main()

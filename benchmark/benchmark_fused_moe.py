"""Fused MoE benchmark (role of reference benchmark/benchmark_fused_moe.py:
Mixtral-style expert shapes, tokens/s and % of weight-bandwidth roofline).

Usage: python benchmark/benchmark_fused_moe.py [--tokens 128] [--quant none]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from presets import preset, detect_chip
from utils import bench_op, report_row
from weight_shapes import WEIGHT_SHAPES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--model", default="mixtral-8x7b-expert",
                    choices=["mixtral-8x7b-expert", "gpt-oss-20b-expert",
                             "gpt-oss-120b-expert"])
    ap.add_argument("--topk", type=int, default=0,
                    help="0 = the model's default (mixtral 2, gpt-oss 4)")
    ap.add_argument("--quant", default="none",
                    choices=["none", "fp8_channel", "w8a8", "mxfp4"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI)")
    ap.add_argument("--gate-up", default="halves",
                    choices=["interleaved", "halves"],
                    help="gpt-oss gate/up column layout: 'halves' is the "
                         "engine's load-time de-interleave (models/"
                         "gpt_oss._expert_params) — swigluoai then runs "
                         "on contiguous slices instead of [0::2] strided "
                         "lane-relayout gathers")
    ap.add_argument("--scale-bytes", action="store_true",
                    help="mxfp4: UE8M0 exponent-byte scales (checkpoint "
                         "layout) instead of the bf16 serving storage")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed run")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu import ops

    p = preset()
    cfg = WEIGHT_SHAPES[args.model]
    gpt_oss = "gpt-oss" in args.model
    act = "swigluoai" if gpt_oss else "silu"
    topk = args.topk or (4 if gpt_oss else 2)
    e = cfg["num_experts"]
    d, i2 = cfg["w13"]
    inter = i2 // 2
    t = args.tokens
    rng = np.random.default_rng(0)
    print(f"# chip={detect_chip()} {args.model} E={e} d={d} I={inter} "
          f"tokens={t} topk={topk} quant={args.quant} act={act}")

    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.bfloat16)
    gating = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    tw, ti = ops.topk_softmax(gating, topk, True)
    kwargs = {}
    if args.quant == "none":
        w13 = jnp.asarray(rng.standard_normal((e, d, i2)) * 0.05,
                          jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((e, inter, d)) * 0.05,
                         jnp.bfloat16)
        wbytes = (w13.size + w2.size) * 2
    elif args.quant == "w8a8":
        w13 = jnp.asarray(
            rng.integers(-127, 128, (e, d, i2), dtype=np.int8))
        w2 = jnp.asarray(
            rng.integers(-127, 128, (e, inter, d), dtype=np.int8))
        kwargs = dict(
            w13_scales=jnp.full((e, i2), 4e-4, jnp.float32),
            w2_scales=jnp.full((e, d), 4e-4, jnp.float32))
        wbytes = w13.size + w2.size
    elif args.quant == "mxfp4":
        # e2m1 codes split-K packed + per-32-group pow2 scales (the
        # gpt-oss released-checkpoint expert recipe)
        g = 32
        w13 = jnp.asarray(
            rng.integers(-128, 128, (e, d // 2, i2), dtype=np.int8))
        w2 = jnp.asarray(
            rng.integers(-128, 128, (e, inter // 2, d), dtype=np.int8))
        # bf16 pow2 scales — the serving storage (models/gpt_oss expands
        # checkpoint UE8M0 bytes to bf16 at load: the in-kernel u8 decode
        # measured -5%; pass --scale-bytes to bench the u8 path)
        sdt = jnp.uint8 if args.scale_bytes else jnp.bfloat16
        sval = 125 if args.scale_bytes else 0.25     # 2^-2 either way
        kwargs = dict(
            w13_scales=jnp.full((e, d // g, i2), sval, sdt),
            w2_scales=jnp.full((e, inter // g, d), sval, sdt),
            group_size=g)
        wbytes = w13.size + w2.size
    else:
        w13 = jnp.asarray(rng.standard_normal((e, d, i2)) * 0.05,
                          jnp.float8_e4m3fn)
        w2 = jnp.asarray(rng.standard_normal((e, inter, d)) * 0.05,
                         jnp.float8_e4m3fn)
        kwargs = dict(
            w13_scales=jnp.ones((e, i2), jnp.float32),
            w2_scales=jnp.ones((e, d), jnp.float32))
        wbytes = w13.size + w2.size

    # weights ride in the carry: closed-over device arrays are lowered
    # as inline MLIR constants (a 1.4 GB host round-trip per compile on
    # the tunnel); carried operands stay real arguments.
    gu_layout = "interleaved"
    if gpt_oss and args.gate_up == "halves":
        from vllm_xpu_kernels_tpu.ops.moe import gate_up_halves_perm

        perm = jnp.asarray(gate_up_halves_perm(i2))
        w13 = jnp.take(w13, perm, axis=-1)
        if "w13_scales" in kwargs:
            kwargs["w13_scales"] = jnp.take(kwargs["w13_scales"], perm,
                                            axis=-1)
        gu_layout = "halves"

    def step(x, cs):
        w13, w2 = cs
        return ops.tpu_fused_moe(x, w13, w2, tw, ti, quant=args.quant,
                                 activation=act, gate_up_layout=gu_layout,
                                 **kwargs)

    def fb(y, x, cs):
        return (x * 0.999 + y * 1e-3).astype(x.dtype)

    tsec = bench_op(step, fb, x, consts=(w13, w2))
    if args.trace:
        from utils import profile_trace
        import jax as _jax

        loop = _jax.jit(lambda xx, cs: fb(step(xx, cs), xx, cs))
        c = loop(x, (w13, w2))
        _ = np.asarray(c.ravel()[0:1])
        with profile_trace(args.trace):
            for _i in range(8):
                c = loop(c, (w13, w2))
            _ = np.asarray(c.ravel()[0:1])
    # tokens route to topk experts; all-expert weight read upper-bounds
    print(report_row(f"fused_moe t={t}", tsec, bytes_moved=wbytes,
                     peak_gbps=p["hbm_gbps"]))
    print(f"tokens/s: {t / tsec:,.0f}")


if __name__ == "__main__":
    main()

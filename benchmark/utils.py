"""Benchmark timing utilities (role of reference benchmark/utils.py:10-60,
which wraps triton.testing.do_bench / torch.utils.benchmark).

Timing protocol for remote-tunnel TPU sessions: chain the op N times inside
ONE jitted fori_loop (per-dispatch tunnel latency is tens of ms and
block_until_ready does not flush remote execution), then report
(t(N+delta) − t(N)) / delta — fixed dispatch/readback overheads cancel.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def bench_op(step: Callable, feedback: Callable, x0, n_base: int = 10,
             n_delta: int = 100, consts=None) -> float:
    """Median-free differential timing -> seconds per `step` invocation.

    ``step(x)`` runs the op; ``feedback(y, x)`` folds the output back into
    a carry of x's shape/dtype so iterations chain (no dead-code
    elimination).

    ``consts``: loop-invariant device arrays (weights, caches) passed as
    ``step(x, consts)`` / ``feedback(y, x, consts)``.  They ride as jit
    ARGUMENTS closed over by the loop body — NOT in the carry (XLA can
    insert a full defensive copy of every carry element per iteration:
    a carried 36 MB weight pair measured 1.2 ms/step of pure copy in the
    fused-MoE bench) and NOT closures (inline MLIR constants round-trip
    through the tunnel compiler)."""
    import jax

    def chain(n):
        if consts is not None:
            def loop(x, cs):
                def body(i, x):
                    return feedback(step(x, cs), x, cs)
                return jax.lax.fori_loop(0, n, body, x)
        else:
            def loop(x):
                def body(i, x):
                    return feedback(step(x), x)
                return jax.lax.fori_loop(0, n, body, x)
        return jax.jit(loop)

    def read_one(out):
        # device->host over the tunnel runs ~70 MB/s: slice ONE element
        # on device before transferring, or the readback noise (hundreds
        # of ms for a large carry) swamps the differential for fast ops.
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0:1])[0]

    f_a, f_b = chain(n_base), chain(n_base + n_delta)
    args = (x0,) if consts is None else (x0, consts)
    for f in (f_a, f_b):
        _ = read_one(f(*args))
    t0 = time.perf_counter()
    _ = read_one(f_a(*args))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = read_one(f_b(*args))
    tb = time.perf_counter() - t0
    return max((tb - ta) / n_delta, 1e-9)


def profile_trace(logdir):
    """Context manager: capture a jax.profiler trace (xprof/TensorBoard)
    around a code block — the TPU-side replacement for the reference's
    triton do_bench+torch.profiler methodology (benchmark/utils.py:10-60).
    No-op when ``logdir`` is falsy (so benchmarks can take --trace DIR)."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        if not logdir:
            yield
            return
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return _cm()


def report_row(name: str, seconds: float, flops: float = 0.0,
               bytes_moved: float = 0.0, peak_tflops: float = 0.0,
               peak_gbps: float = 0.0) -> str:
    tf = flops / seconds / 1e12
    gb = bytes_moved / seconds / 1e9
    parts = [f"{name:<44s} {seconds*1e6:9.1f} us"]
    if flops:
        pct = 100 * tf / peak_tflops if peak_tflops else 0
        parts.append(f"{tf:8.2f} TFLOPS ({pct:5.1f}%)")
    if bytes_moved:
        pct = 100 * gb / peak_gbps if peak_gbps else 0
        parts.append(f"{gb:7.1f} GB/s ({pct:5.1f}%)")
    return "  ".join(parts)

"""GPTQ / AWQ / MX checkpoint layouts -> TPU split-K int4 packing.

Reference behaviour being reproduced (different target layout):

- GPTQ stores weights as int32 words of 8 nibbles along K
  (``qweight [K/8, N] int32``) and zero-points as int32 words of 8 nibbles
  along N (``qzeros [K/g, N/8] int32``)
  (reference: _quantize_convert.py:25-55 ``GPTQUtils.unpack_weight/unpack_zp``).
- AWQ packs nibbles in the order [0,2,4,6,1,3,5,7] along N
  (reference: _quantize_convert.py:94-200 ``AWQUtils``).
- act-order (``g_idx``) is handled by shuffling weight rows so scale groups
  become contiguous, plus a K-permutation applied to activations at run time
  (reference: _quantize_convert.py:12-24 ``convert_idx``, :82-90 ``shuffle``).

Target layout (ours): split-K **within each scale group** of size ``g``:
for group ``G`` (rows ``[G*g, (G+1)*g)``), packed row ``r`` holds
``w4[G*g + r]`` in its low nibble and ``w4[G*g + r + g/2]`` in its high
nibble.  The Pallas kernel steps the K grid one group at a time, so a
packed [g/2, N] tile unpacks to the group's [g, N] with one sublane concat
and every byte is read exactly once.  Zero-points are expanded to dense
[K/g, N] int8 code arrays
(the kernel subtracts then scales).

All functions are numpy (weight conversion is a one-off host-side step, like
the reference's repack utilities which run at model-load time).
"""

from __future__ import annotations

import numpy as np


def pack_int4_splitk(w4: np.ndarray, group_size: int) -> np.ndarray:
    """[K, N] int4 codes (0..15, any int dtype) -> [K/2, N] per-group
    split-K int8 (see module docstring for the layout)."""
    K, N = w4.shape
    g = group_size
    assert K % g == 0 and g % 2 == 0, (K, g)
    w = w4.reshape(K // g, g, N).astype(np.uint8) & 0xF
    lo, hi = w[:, : g // 2], w[:, g // 2 :]
    return (lo | (hi << 4)).reshape(K // 2, N).astype(np.int8)


def unpack_int4_splitk_np(packed: np.ndarray, group_size: int) -> np.ndarray:
    """[K/2, N] per-group split-K int8 -> [K, N] uint8 codes."""
    g = group_size
    K2, N = packed.shape
    p = packed.reshape(K2 * 2 // g, g // 2, N).astype(np.uint8)
    return np.concatenate([p & 0xF, p >> 4], axis=1).reshape(K2 * 2, N)


def gptq_unpack_int32(qweight: np.ndarray, bits: int = 4) -> np.ndarray:
    """GPTQ qweight [K/8, N] int32 -> [K, N] uint8 codes (K-major nibbles)."""
    assert bits == 4
    shifts = np.arange(0, 32, bits, dtype=np.uint32)
    w = (qweight.astype(np.uint32)[:, None, :] >> shifts[None, :, None]) & 0xF
    return w.reshape(-1, qweight.shape[1]).astype(np.uint8)


def gptq_unpack_zp(qzeros: np.ndarray, bits: int = 4) -> np.ndarray:
    """GPTQ qzeros [G, N/8] int32 -> [G, N] uint8 codes (N-major nibbles)."""
    assert bits == 4
    shifts = np.arange(0, 32, bits, dtype=np.uint32)
    z = (qzeros.astype(np.uint32)[:, :, None] >> shifts[None, None, :]) & 0xF
    return z.reshape(qzeros.shape[0], -1).astype(np.uint8)


def gptq_convert_idx(g_idx: np.ndarray, k: int, group_size: int) -> np.ndarray:
    """act-order group index -> K-permutation making groups contiguous.

    Returns ``perm`` such that ``w_shuffled = w[perm]`` groups rows by their
    scale group; activations must then use ``a[:, perm]``
    (reference: _quantize_convert.py:12-24).
    """
    order = np.argsort(g_idx, kind="stable").astype(np.int32)
    assert order.shape == (k,)
    del group_size
    return order


def gptq_repack_for_tpu(
    qweight: np.ndarray,
    qzeros: np.ndarray | None,
    group_size: int,
    g_idx: np.ndarray | None = None,
):
    """GPTQ checkpoint tensors -> (packed_splitk [K/2, N] int8,
    zp_codes [G, N] uint8 | None, perm [K] int32 | None).

    With act-order, weight rows are shuffled so groups are contiguous (the
    returned ``perm`` must be applied to activations:
    ``a_k = a[:, perm]``) — same contract as the reference's
    ``GPTQUtils.shuffle`` + kernel-side g_idx.
    """
    w = gptq_unpack_int32(qweight)  # [K, N] codes
    k = w.shape[0]
    perm = None
    if g_idx is not None:
        perm = gptq_convert_idx(np.asarray(g_idx), k, group_size)
        w = w[perm]
    zp = gptq_unpack_zp(qzeros) if qzeros is not None else None
    return pack_int4_splitk(w, group_size), zp, perm


_AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def awq_unpack_int32(qmatrix: np.ndarray) -> np.ndarray:
    """AWQ column-packed [R, C/8] int32 -> [R, C] uint8 codes in logical
    order (undoes the AWQ pack order [0,2,4,6,1,3,5,7])."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    m = (qmatrix.astype(np.uint32)[:, :, None] >> shifts[None, None, :]) & 0xF
    m = m.reshape(qmatrix.shape[0], -1, 8)[:, :, _AWQ_REVERSE_ORDER]
    return m.reshape(qmatrix.shape[0], -1).astype(np.uint8)


def awq_repack_for_tpu(qweight: np.ndarray, qzeros: np.ndarray | None,
                       group_size: int):
    """AWQ checkpoint tensors (qweight [K, N/8], qzeros [G, N/8]) ->
    (packed_splitk [K/2, N] int8, zp_codes [G, N] uint8 | None)."""
    w = awq_unpack_int32(qweight)
    zp = awq_unpack_int32(qzeros) if qzeros is not None else None
    return pack_int4_splitk(w, group_size), zp


def pack_fp4_splitk(codes: np.ndarray, group_size: int = 32) -> np.ndarray:
    """[K, N] e2m1 codes -> [K/2, N] per-group split-K packed int8 (weights
    for fp4_gemm; MX group size 32)."""
    return pack_int4_splitk(codes, group_size)


def fp8_transcode_w8a8(p):
    """FP8-checkpoint linear ({'w': e4m3 [K, N], 's': [N] f32}) ->
    w8a8-served tree ({'w': int8, 's8': [N] f32}): serve FP8 checkpoints
    at the 740 GB/s native-int8 weight stream instead of the 369 GB/s
    e4m3 in-GEMM upcast ceiling (docs/quant_recipes.md; reference role:
    csrc/xpu/onednn/fp8_gemm_w8a16.h:13-99).

    LOSSY (int8 is a uniform grid, e4m3 a log one), but per COLUMN the
    stored scale cancels: codes' = round(q_e4m3 * 127 / max|q_e4m3|_col),
    s8 = max|q_e4m3|_col * s / 127 — the transcode touches only the e4m3
    code magnitudes, so any per-channel-scaled checkpoint transcodes
    identically.  Certified against the <=0.1-Δppl gate in BASELINE.md;
    keep quant='fp8' (exact e4m3 weight-only) when losslessness matters.
    Bias and other keys pass through.
    """
    import jax.numpy as jnp

    q = p["w"]
    assert q.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2), q.dtype
    qf = q.astype(jnp.float32)
    colmax = jnp.maximum(jnp.max(jnp.abs(qf), axis=0), 1e-8)
    codes = jnp.clip(jnp.round(qf * (127.0 / colmax)[None, :]),
                     -127, 127).astype(jnp.int8)
    s8 = (colmax * p["s"].astype(jnp.float32) / 127.0).astype(jnp.float32)
    out = {k: v for k, v in p.items() if k not in ("w", "s")}
    out["w"] = codes
    out["s8"] = s8
    return out

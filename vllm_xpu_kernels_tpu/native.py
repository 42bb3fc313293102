"""Loader + ctypes bindings for the native host runtime (csrc/host_runtime.cpp).

The reference builds five compiled extensions through CMake (setup.py:550-580);
here the single host-side C++ library is compiled on demand with g++ and
cached next to the source (no torch, no pybind — plain C ABI + ctypes, as
the environment provides no pybind11).  Python fallbacks exist for every
entry point (models/runtime.py), so a missing toolchain degrades gracefully
— the same philosophy as the reference's feature-gated extension builds
(CMakeLists.txt:68-77).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("vllm_xpu_kernels_tpu")

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "host_runtime.cpp"
_LIB = Path(__file__).resolve().parent / "_libvxkhost.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / sandboxed
        logger.debug("native host runtime build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB))
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.vxk_bm_create.restype = ctypes.c_void_p
        lib.vxk_bm_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.vxk_bm_destroy.argtypes = [ctypes.c_void_p]
        lib.vxk_bm_num_free.restype = ctypes.c_int64
        lib.vxk_bm_num_free.argtypes = [ctypes.c_void_p]
        lib.vxk_bm_allocate.restype = ctypes.c_int32
        lib.vxk_bm_allocate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.vxk_bm_release.restype = ctypes.c_int32
        lib.vxk_bm_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vxk_bm_seq_len.restype = ctypes.c_int64
        lib.vxk_bm_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vxk_bm_build_decode_batch.restype = ctypes.c_int32
        lib.vxk_bm_build_decode_batch.argtypes = [
            ctypes.c_void_p, i64p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, i32p]
        lib.vxk_bm_prefill_slots.restype = ctypes.c_int32
        lib.vxk_bm_prefill_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.vxk_build_decode_split_plan.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p]
        _lib = lib
    except Exception as e:
        logger.debug("native host runtime load failed: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


class NativeBlockManager:
    """C++-backed paged-KV block manager (drop-in for
    models.runtime.BlockManager's hot paths)."""

    def __init__(self, num_blocks: int, block_size: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native host runtime unavailable")
        self._lib = lib
        self.block_size = block_size
        self._h = lib.vxk_bm_create(num_blocks, block_size)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vxk_bm_destroy(self._h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.vxk_bm_num_free(self._h)

    def allocate(self, seq_id: int, n_tokens: int):
        if self._lib.vxk_bm_allocate(self._h, seq_id, n_tokens) != 0:
            raise RuntimeError("out of KV blocks")

    def release(self, seq_id: int):
        self._lib.vxk_bm_release(self._h, seq_id)

    def seq_len(self, seq_id: int) -> int:
        return self._lib.vxk_bm_seq_len(self._h, seq_id)

    def prefill_slots(self, seq_id: int, n_tokens: int) -> np.ndarray:
        out = np.empty(n_tokens, np.int32)
        rc = self._lib.vxk_bm_prefill_slots(
            self._h, seq_id, n_tokens,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise KeyError(seq_id)
        return out

    def build_decode_batch(self, seq_ids, max_blocks: int):
        n = len(seq_ids)
        ids = np.asarray(seq_ids, np.int64)
        positions = np.empty(n, np.int32)
        slots = np.empty(n, np.int32)
        kv_lens = np.empty(n, np.int32)
        tbl = np.empty((n, max_blocks), np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        rc = self._lib.vxk_bm_build_decode_batch(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_blocks,
            positions.ctypes.data_as(i32p), slots.ctypes.data_as(i32p),
            kv_lens.ctypes.data_as(i32p), tbl.ctypes.data_as(i32p))
        if rc != 0:
            raise RuntimeError("block table overflow / out of blocks")
        return positions, slots, kv_lens, tbl


def build_decode_split_plan_native(kv_lens, kv_tile: int,
                                   num_kv_splits: int,
                                   num_cores: int = 8,
                                   num_heads_kv: int = 8) -> np.ndarray:
    lib = load()
    arr = np.asarray(kv_lens, np.int32)
    out = np.empty(arr.size, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vxk_build_decode_split_plan(
        arr.ctypes.data_as(i32p), arr.size, kv_tile, num_kv_splits,
        num_cores, num_heads_kv, out.ctypes.data_as(i32p))
    return out

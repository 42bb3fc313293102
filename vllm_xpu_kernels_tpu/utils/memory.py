"""Memory / interop utilities — TPU equivalents of the reference's
allocator-and-copy plumbing (SURVEY.md §2.15):

- ``get_memory_info``       ↔ getMemoryInfo (csrc/utils/mem_info.cpp, Level-Zero)
- ``memcpy_sync``           ↔ xpu_memcpy_sync (csrc/utils/mem_cpy.cpp:28-340)
- ``to_host_offload`` /     ↔ UVA views + pluggable allocator sleep-mode
  ``from_host_offload``       offload (csrc/xpu_view.cpp, mem_alloc.cpp)
- ``weak_ref``              ↔ weak_ref_tensor (csrc/tensor_utils.cpp:24)
- ``swap_blocks_host``      ↔ swap_blocks H2D/D2H direction (cache.cpp:1269)

On TPU the runtime owns allocation (no pluggable allocator hook exists in
PJRT), so the reference's alloc-callback machinery maps to the two things
it is used *for*: accurate free/total accounting and weight/KV offload to
host memory.  Offload uses pinned-host device_put — the TPU analogue of
the reference's USM-host UVA views.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def get_memory_info(device: Optional[object] = None) -> tuple[int, int]:
    """-> (free_bytes, total_bytes) for the device
    (reference: getMemoryInfo op, csrc/torch_bindings.cpp:322-323)."""
    d = device if device is not None else jax.devices()[0]
    stats = {}
    try:
        stats = d.memory_stats() or {}
    except Exception:
        pass
    total = stats.get("bytes_limit", 0)
    used = stats.get("bytes_in_use", 0)
    return max(total - used, 0), total


def memcpy_sync(dst_like: jax.Array, src: jax.Array) -> jax.Array:
    """Synchronous cross-memory copy returning a committed array on
    dst_like's device/memory (reference: xpu_memcpy_sync raw-pointer
    H2D/D2H/D2D with pinned staging, csrc/utils/mem_cpy.cpp)."""
    out = jax.device_put(src, dst_like.sharding)
    out.block_until_ready()
    return out.astype(dst_like.dtype)


def _host_sharding(x: jax.Array):
    s = x.sharding
    try:
        return s.with_memory_kind("pinned_host")
    except Exception:
        return s


def to_host_offload(x):
    """Move array(s) to pinned host memory, keeping sharding — the
    sleep-mode/offload path the reference serves with its pluggable
    allocator + UVA views (csrc/utils/mem_alloc.cpp:55-510)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, _host_sharding(a)), x)


def from_host_offload(x, device: Optional[object] = None):
    """Bring offloaded array(s) back to device HBM."""
    from jax.sharding import SingleDeviceSharding

    d = device if device is not None else jax.devices()[0]
    s = SingleDeviceSharding(d)
    try:
        s = s.with_memory_kind("device")
    except Exception:
        pass
    return jax.tree.map(lambda a: jax.device_put(a, s), x)


def get_device_view_from_cpu(x) -> jax.Array:
    """Device-visible view of host data (reference:
    get_xpu_view_from_cpu_tensor UVA view, csrc/xpu_view.cpp:19-128).  On
    TPU a zero-copy UVA mapping does not exist; the equivalent is a
    pinned-host placement that device computations can consume directly
    (XLA streams it over PCIe on use)."""
    a = jnp.asarray(x)
    return jax.device_put(a, _host_sharding(a))


def weak_ref(x: jax.Array) -> jax.Array:
    """The reference's weak_ref_tensor exposes a non-owning view for
    graph-capture lifetimes (csrc/tensor_utils.cpp:24).  JAX arrays are
    immutable and refcounted — an alias IS a weak view; returned as-is
    for API parity."""
    return x


def swap_blocks_host(src: jax.Array, dst: jax.Array,
                     block_mapping) -> jax.Array:
    """H2D/D2H block swap: gather mapped blocks on the source side, land
    them in the destination's memory space (reference: swap_blocks
    D2H/H2D branches, csrc/cache.cpp:1269-1395)."""
    import numpy as np

    bm = np.asarray(block_mapping)
    src_idx = jnp.asarray(bm[:, 0], jnp.int32)
    dst_idx = jnp.asarray(bm[:, 1], jnp.int32)
    moved = jax.device_put(src[src_idx], dst.sharding)
    return dst.at[dst_idx].set(moved.astype(dst.dtype), mode="drop")

"""Host runtime tests: native C++ block manager / planner vs the Python
implementations, plus memory utilities and the env registry."""

import numpy as np
import pytest

from vllm_xpu_kernels_tpu import native
from vllm_xpu_kernels_tpu.models.runtime import (
    BlockManager, build_decode_batch)
from vllm_xpu_kernels_tpu.ops.attention import build_decode_split_plan


needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain")


@needs_native
def test_native_block_manager_matches_python():
    nb, bs = 64, 16
    py = BlockManager(nb, bs)
    nat = native.NativeBlockManager(nb, bs)
    seqs = {1: 20, 2: 5, 3: 33}
    for sid, n in seqs.items():
        py.allocate(sid, n)
        nat.allocate(sid, n)
    assert nat.num_free == len(py.free)
    for sid, n in seqs.items():
        np.testing.assert_array_equal(
            nat.prefill_slots(sid, n),
            [py.slot(sid, p) for p in range(n)])
    # several decode steps
    ids = list(seqs)
    for _ in range(bs + 3):   # crosses a block boundary
        batch = build_decode_batch(py, ids, np.zeros(len(ids), np.int64),
                                   max_blocks=8)
        pos, slots, kvl, tbl = nat.build_decode_batch(ids, 8)
        np.testing.assert_array_equal(pos, batch.positions)
        np.testing.assert_array_equal(slots, batch.slot_mapping)
        np.testing.assert_array_equal(kvl, batch.kv_lens)
        np.testing.assert_array_equal(tbl, batch.block_table)
    nat.release(2)
    py.release(2)
    assert nat.num_free == len(py.free)


@needs_native
def test_native_split_plan_matches_python():
    kv_lens = [16, 4096, 128, 100000, 1]
    for tile, splits in [(64, 16), (128, 8), (64, 1)]:
        py = build_decode_split_plan(kv_lens, kv_tile=tile,
                                     num_kv_splits=splits)
        nat = native.build_decode_split_plan_native(
            kv_lens, kv_tile=tile, num_kv_splits=splits)
        np.testing.assert_array_equal(nat, py)


def test_memory_utils():
    import jax
    import jax.numpy as jnp
    from vllm_xpu_kernels_tpu.utils import memory as mem

    free, total = mem.get_memory_info()
    assert free >= 0 and total >= 0
    x = jnp.arange(16, dtype=jnp.float32)
    y = mem.memcpy_sync(jnp.zeros(16, jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    off = mem.to_host_offload({"a": x})
    back = mem.from_host_offload(off)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(x))
    assert mem.weak_ref(x) is x
    src = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)
    dst = jnp.zeros((4, 8), jnp.float32)
    out = mem.swap_blocks_host(src, dst, np.asarray([[2, 0], [1, 3]]))
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(src)[2])
    np.testing.assert_array_equal(np.asarray(out)[3], np.asarray(src)[1])


def test_env_registry():
    from vllm_xpu_kernels_tpu import envs

    table = envs.environment_variables()
    assert "VXK_FORCE_REF" in table and "VXK_TEST_SCOPE" in table
    assert envs.VXK_FORCE_REF() in (True, False)
    assert isinstance(envs.VXK_TEST_SCOPE(), str)

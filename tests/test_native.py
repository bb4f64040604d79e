"""Native runtime (C++) vs Python spec cross-checks.

core/svo.py is the executable spec; native/svo_core.cpp must agree with it
operation-for-operation: allocator state, node arrays after edit sequences,
dense<->SVO conversions (bit-identical to the device builder's layout).
"""

import numpy as np
import pytest

from voxelraytracing_tpu.core import native
from voxelraytracing_tpu.core import nodes as nodefmt
from voxelraytracing_tpu.core.constants import CHUNK_SIZE, NODES_PER_CHUNK
from voxelraytracing_tpu.core.svo import NodeAlloc, Svo, svo_to_dense

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def random_ops(rng, n):
    return [
        (
            rng.integers(0, CHUNK_SIZE, 3),
            int(rng.integers(0, 6)),
        )
        for _ in range(n)
    ]


def test_set_node_matches_python_spec(rng):
    n = 8192
    py_nodes = np.zeros(n, dtype=np.int32)
    c_nodes = np.zeros(n, dtype=np.int32)
    py_alloc = NodeAlloc.new((0, 1), (1, n))
    c_alloc = native.NativeAlloc(1, n)
    svo = Svo(0, CHUNK_SIZE)

    for pos, vox in random_ops(rng, 500):
        svo.set_node(py_nodes, pos.astype(np.float32), vox, 5, py_alloc)
        assert native.set_node(c_nodes, c_alloc, pos, vox, 5)
        np.testing.assert_array_equal(py_nodes, c_nodes)

    assert py_alloc.last_used_addr == c_alloc.last_used_addr
    assert py_alloc.total_free_mem() == c_alloc.total_free_mem()


def test_get_voxel_and_roundtrip(rng):
    n = 8192
    nodes = np.zeros(n, dtype=np.int32)
    alloc = native.NativeAlloc(1, n)
    want = {}
    for pos, vox in random_ops(rng, 300):
        native.set_node(nodes, alloc, pos, vox)
        want[tuple(int(v) for v in pos)] = vox
    for pos, vox in want.items():
        assert native.get_voxel(nodes, pos) == vox
    dense = native.svo_to_dense(nodes)
    np.testing.assert_array_equal(dense, svo_to_dense(nodes))
    for pos, vox in want.items():
        assert dense[pos] == vox


def test_dense_to_svo_matches_device_builder(rng):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from voxelraytracing_tpu.ops.svo_build import build_chunk_svo

    for _ in range(3):
        grid = (rng.random((32, 32, 32)) < 0.4) * rng.integers(
            1, 9, (32, 32, 32)
        )
        grid = grid.astype(np.uint16)
        # carve some uniform regions so merges happen
        grid[:16, :16, :16] = 3
        c_nodes, c_n = native.dense_to_svo(grid)
        d_nodes, d_n = build_chunk_svo(np.asarray(grid, np.int32))
        d_nodes, d_n = np.asarray(d_nodes), int(d_n)
        assert c_n == d_n
        np.testing.assert_array_equal(c_nodes, d_nodes[:d_n])


def test_dense_to_svo_batch(rng):
    # terrain-like grids (merge-friendly: random fills can exceed the
    # 15-bit child-pointer format limit, as in the reference format)
    h = rng.integers(4, 28, (5, 32, 32))
    y = np.arange(32)[None, None, :, None]
    grids = np.where(y < h[:, :, None, :], 1, 0)
    grids[:, 10:20, 10:20, 10:20] = rng.integers(0, 4, (5, 10, 10, 10))
    grids = grids.astype(np.uint16)
    out, counts = native.dense_to_svo_batch(grids)
    for i in range(5):
        np.testing.assert_array_equal(
            native.svo_to_dense(out[i]), grids[i]
        )
        assert counts[i] <= NODES_PER_CHUNK


def test_uniform_chunk_is_single_node():
    grid = np.full((32, 32, 32), 7, dtype=np.uint16)
    nodes, n = native.dense_to_svo(grid)
    assert n == 1 and nodes[0] == nodefmt.leaf(7)


def test_sw_rows_build_matches_numpy():
    """The native streaming-builder pass equals the NumPy implementation
    bit for bit — including the >16-solid-id palette-overflow policy."""
    import numpy as np

    from voxelraytracing_tpu.core import native
    from voxelraytracing_tpu.world import render_grid as rgmod

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(11)
    n_liquid = 3
    # batch 1: moderate id diversity (≤16 solid ids per subwindow)
    g1 = rng.integers(0, 12, (4, 32, 32, 32)).astype(np.uint8)
    # batch 2: pathological diversity to force palette overflow
    g2 = rng.integers(0, 200, (2, 32, 32, 32)).astype(np.uint8)
    to_pack = np.arange(256, dtype=np.int32) % 251

    import unittest.mock as mock

    for g in (g1, g2):
        got = rgmod.chunk_batch_sw_data(g, n_liquid, to_pack)
        # reference: the NumPy path, reached by bypassing the native branch
        with mock.patch.object(native, "available", lambda: False):
            ref = rgmod.chunk_batch_sw_data(g, n_liquid, to_pack)

        assert got["palettes_ok"] == ref["palettes_ok"]
        for k in ("sw_solid", "sw_liq", "sw_meta", "sw_pid",
                  "any_solid", "all_liq", "any_liq"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]), k)

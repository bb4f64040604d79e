"""Property tests for the node format, allocator, and host SVO spec."""

import numpy as np
import pytest

from voxelraytracing_tpu.core import nodes as nodefmt
from voxelraytracing_tpu.core.constants import CHUNK_DEPTH, CHUNK_SIZE, VOXEL_MAX_VALUE
from voxelraytracing_tpu.core.svo import NodeAlloc, Svo, svo_to_dense


def fresh_chunk(n=VOXEL_MAX_VALUE):
    nodes = np.zeros(n, dtype=np.int32)
    alloc = NodeAlloc.new((0, 1), (1, n))
    return nodes, alloc, Svo(0, CHUNK_SIZE)


class TestNodeFormat:
    def test_leaf_roundtrip(self):
        for v in (0, 1, 77, VOXEL_MAX_VALUE):
            n = nodefmt.leaf(v)
            assert not nodefmt.is_split(n)
            assert nodefmt.voxel_of(n) == v

    def test_split_roundtrip(self):
        for idx in (1, 8, 32760):
            n = nodefmt.split(idx)
            assert nodefmt.is_split(n)
            assert nodefmt.child_idx_of(n) == idx

    def test_vectorized(self):
        arr = np.array([nodefmt.leaf(5), nodefmt.split(16)], dtype=np.int32)
        assert list(nodefmt.is_split(arr)) == [False, True]
        assert nodefmt.voxel_of(arr[0]) == 5
        assert nodefmt.child_idx_of(arr[1]) == 16


class TestNodeAlloc:
    def test_allocates_groups_of_8(self):
        alloc = NodeAlloc.new((0, 1), (1, 100))
        a = alloc.next()
        b = alloc.next()
        assert a == 1 and b == 9
        assert alloc.last_used_addr == 16

    def test_free_coalesces(self):
        alloc = NodeAlloc.new((0, 1), (1, 1000))
        addrs = [alloc.next() for _ in range(4)]
        alloc.free(addrs[1])
        alloc.free(addrs[2])  # should extend the span freed above
        assert len(alloc.free_mem) == 2
        # freed space is reused earliest-first
        assert alloc.next() == addrs[1]

    def test_exhaustion_returns_none(self):
        alloc = NodeAlloc.new((0, 1), (1, 9))
        assert alloc.next() == 1
        assert alloc.next() is None

    def test_move_end(self):
        alloc = NodeAlloc.new((0, 1), (1, 1000))
        alloc.next()
        alloc.move_end(100)
        assert alloc.range_end == 100
        assert alloc.total_free_mem() == 100 - 9


class TestSvoSetGet:
    def get_voxel(self, svo, nodes, pos):
        f = svo.find_node(nodes, pos, CHUNK_DEPTH)
        return nodefmt.voxel_of(int(nodes[f.idx]))

    def test_set_get_roundtrip(self, rng):
        nodes, alloc, svo = fresh_chunk()
        pts = {}
        for _ in range(200):
            pos = tuple(int(v) for v in rng.integers(0, CHUNK_SIZE, 3))
            vox = int(rng.integers(0, 100))
            svo.set_node(nodes, pos, vox, CHUNK_DEPTH, alloc)
            pts[pos] = vox
        for pos, vox in pts.items():
            assert self.get_voxel(svo, nodes, pos) == vox

    def test_merge_on_equal_children(self):
        nodes, alloc, svo = fresh_chunk()
        # fill one whole 2x2x2 leaf octant with the same voxel -> must merge
        base = (0, 0, 0)
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    svo.set_node(nodes, (dx, dy, dz), 7, CHUNK_DEPTH, alloc)
        found = svo.find_node(nodes, base, CHUNK_DEPTH)
        assert found.depth < CHUNK_DEPTH  # merged up at least one level
        assert nodefmt.voxel_of(int(nodes[found.idx])) == 7

    def test_full_chunk_merges_to_root(self):
        nodes, alloc, svo = fresh_chunk()
        for x in range(CHUNK_SIZE):
            for y in range(CHUNK_SIZE):
                for z in range(CHUNK_SIZE):
                    svo.set_node(nodes, (x, y, z), 3, CHUNK_DEPTH, alloc)
        root = int(nodes[0])
        assert not nodefmt.is_split(root)
        assert nodefmt.voxel_of(root) == 3
        # all child groups were freed back
        assert alloc.total_free_mem() == alloc.range_end - 1

    def test_dense_expansion_matches(self, rng):
        nodes, alloc, svo = fresh_chunk()
        grid = np.zeros((CHUNK_SIZE,) * 3, dtype=np.uint16)
        for _ in range(300):
            pos = tuple(int(v) for v in rng.integers(0, CHUNK_SIZE, 3))
            vox = int(rng.integers(0, 50))
            svo.set_node(nodes, pos, vox, CHUNK_DEPTH, alloc)
            grid[pos] = vox
        dense = svo_to_dense(nodes)
        np.testing.assert_array_equal(dense, grid)


class TestDeviceBuilder:
    def build(self, grid):
        from voxelraytracing_tpu.ops.svo_build import build_chunk_svo

        nodes, n = build_chunk_svo(grid)
        return np.asarray(nodes), int(n)

    def test_uniform_grid_is_one_node(self):
        grid = np.full((CHUNK_SIZE,) * 3, 9, dtype=np.int32)
        nodes, n = self.build(grid)
        assert n == 1
        assert nodes[0] == nodefmt.leaf(9)

    def test_empty_grid(self):
        grid = np.zeros((CHUNK_SIZE,) * 3, dtype=np.int32)
        nodes, n = self.build(grid)
        assert n == 1 and nodes[0] == nodefmt.EMPTY_NODE

    def test_single_voxel(self):
        grid = np.zeros((CHUNK_SIZE,) * 3, dtype=np.int32)
        grid[5, 17, 30] = 42
        nodes, n = self.build(grid)
        assert n == 1 + 8 * CHUNK_DEPTH  # one split chain to the leaf
        np.testing.assert_array_equal(svo_to_dense(nodes), grid)

    def test_random_grid_roundtrip(self, rng):
        grid = np.zeros((CHUNK_SIZE,) * 3, dtype=np.int32)
        # sparse random voxels plus a solid floor slab (mergeable region)
        grid[:, :4, :] = 2
        idx = rng.integers(0, CHUNK_SIZE, (200, 3))
        for p in idx:
            grid[tuple(p)] = int(rng.integers(1, 60))
        nodes, n = self.build(grid)
        assert n <= len(nodes)
        np.testing.assert_array_equal(svo_to_dense(nodes), grid)

    def test_batched_matches_single(self, rng):
        from voxelraytracing_tpu.ops.svo_build import build_chunk_svo_batch

        grids = rng.integers(0, 3, (4, CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE)).astype(np.int32)
        nodes_b, n_b = build_chunk_svo_batch(grids)
        for i in range(4):
            nodes_i, n_i = self.build(grids[i])
            assert int(n_b[i]) == n_i
            np.testing.assert_array_equal(np.asarray(nodes_b[i]), nodes_i)

    def test_matches_host_mutation_oracle(self, rng):
        """Device builder and reference-style set_node loop expand identically."""
        from voxelraytracing_tpu.core.svo import dense_to_svo_host

        grid = np.zeros((CHUNK_SIZE,) * 3, dtype=np.int32)
        grid[:, :7, :] = 4
        for p in rng.integers(0, CHUNK_SIZE, (50, 3)):
            grid[tuple(p)] = int(rng.integers(1, 9))
        dev_nodes, _ = self.build(grid)
        host_nodes, _ = dense_to_svo_host(grid)
        np.testing.assert_array_equal(svo_to_dense(dev_nodes), svo_to_dense(host_nodes))

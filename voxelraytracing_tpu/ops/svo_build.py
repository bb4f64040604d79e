"""Functional dense-grid -> SVO chunk builder (device-side, batchable).

The reference engine builds each chunk's octree by thousands of incremental
``set_node`` calls through a free-list allocator (server/src/world/gen.rs:204-236,
common/src/world/mod.rs:397-459) — pointer-chasing mutation that is hostile to
a TPU. Here the whole chunk is built *functionally* in one shot:

  1. Reduce the dense ``[32,32,32]`` voxel grid into per-level "uniform value"
     pyramids (a segmented all-equal reduction per octant).
  2. Lay out nodes in breadth-first order: the root at address 0, then the
     8-child blocks of every split node, level by level, in flat scan order.
     Addresses are exclusive prefix sums over the split masks — no allocator.

The output layout is *compact*: exactly ``1 + 8 * n_splits`` nodes, never
holes, so it is at least as small as anything the reference's allocator
produces. The node *format* is byte-identical (16-bit leaf/split nodes,
``core/nodes.py``), so the result drops straight into the shared node pool
read by the traversal kernels.

Child pointers are 15-bit (reference asserts the same bound,
common/src/world/mod.rs:416): a chunk needing more than 32767 node slots is
unrepresentable in the format. ``build_chunk_svo`` returns the node count so
hosts can detect that (pathological) case.

vmap over the leading axis to build a batch of chunks at once — the TPU
equivalent of the reference's 16-thread chunk-builder pool (server/src/lib.rs:67-100).
"""

import jax
import jax.numpy as jnp

from ..core import nodes as nodefmt
from ..core.constants import CHUNK_DEPTH, CHUNK_SIZE, NODES_PER_CHUNK


def _octant_view(level_arr):
    """[2S,2S,2S] -> [S,S,S,8] with last axis ordered child = dx + 2*dy + 4*dz."""
    s = level_arr.shape[0] // 2
    v = level_arr.reshape(s, 2, s, 2, s, 2)
    # axes: (xc, dx, yc, dy, zc, dz) -> (xc, yc, zc, dz, dy, dx)
    return v.transpose(0, 2, 4, 5, 3, 1).reshape(s, s, s, 8)


@jax.jit
def build_chunk_svo(grid):
    """Dense voxel grid -> compact SVO node array.

    Args:
      grid: ``int32[32,32,32]`` (or any int dtype) voxel ids, < 2**15.

    Returns:
      nodes: ``int32[NODES_PER_CHUNK]`` widened 16-bit nodes; entries past
        ``n_nodes`` are zero.
      n_nodes: ``int32`` scalar — used prefix length.
    """
    grid = grid.astype(jnp.int32)

    # --- bottom-up uniformity pyramid ---
    vals = [None] * (CHUNK_DEPTH + 1)
    unis = [None] * (CHUNK_DEPTH + 1)
    vals[CHUNK_DEPTH] = grid
    unis[CHUNK_DEPTH] = jnp.ones(grid.shape, dtype=bool)
    for lvl in range(CHUNK_DEPTH - 1, -1, -1):
        v8 = _octant_view(vals[lvl + 1])
        u8 = _octant_view(unis[lvl + 1])
        same = jnp.all(v8 == v8[..., :1], axis=-1)
        unis[lvl] = jnp.all(u8, axis=-1) & same
        vals[lvl] = v8[..., 0]

    # --- top-down existence + BFS addressing ---
    out = jnp.zeros(NODES_PER_CHUNK, dtype=jnp.int32)
    # level 0: a single root cell
    exists = jnp.ones((1, 1, 1), dtype=bool)
    addr = jnp.zeros((1, 1, 1), dtype=jnp.int32)
    next_free = jnp.int32(1)

    for lvl in range(CHUNK_DEPTH + 1):
        uni = unis[lvl]
        val = vals[lvl]
        is_split = exists & ~uni & (lvl < CHUNK_DEPTH)

        flat_split = is_split.reshape(-1)
        n_here = flat_split.sum().astype(jnp.int32)
        # exclusive prefix sum -> per-split-node child-block offset
        offsets = jnp.cumsum(flat_split.astype(jnp.int32)) - flat_split.astype(jnp.int32)
        child_base = (next_free + 8 * offsets).reshape(is_split.shape)

        node_val = jnp.where(
            is_split,
            child_base | nodefmt.SPLIT_MASK,
            val & nodefmt.DATA_MASK,
        ).astype(jnp.int32)

        scatter_addr = jnp.where(exists, addr, NODES_PER_CHUNK).reshape(-1)
        out = out.at[scatter_addr].set(node_val.reshape(-1), mode="drop")

        if lvl < CHUNK_DEPTH:
            # children of split nodes exist; child addr = base + dx + 2dy + 4dz
            s = is_split.shape[0]
            child_exists = jnp.repeat(
                jnp.repeat(jnp.repeat(is_split, 2, 0), 2, 1), 2, 2
            )
            base_up = jnp.repeat(
                jnp.repeat(jnp.repeat(child_base, 2, 0), 2, 1), 2, 2
            )
            ix = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s, 2 * s), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s, 2 * s), 1)
            iz = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s, 2 * s), 2)
            child_off = (ix & 1) + 2 * (iy & 1) + 4 * (iz & 1)
            addr = base_up + child_off
            exists = child_exists
            next_free = next_free + 8 * n_here

    return out, next_free


build_chunk_svo_batch = jax.jit(jax.vmap(build_chunk_svo))
"""``int32[B,32,32,32] -> (int32[B,NODES_PER_CHUNK], int32[B])`` — batched builder."""

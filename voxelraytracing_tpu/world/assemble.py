"""On-device, fully-jittable world assembly.

The interactive engine manages the node pool host-side (``world/pool.py``,
first-fit spans like the reference client, client/src/world.rs:203-257). For
the *end-to-end on-device pipeline* — worldgen -> chunk SVO build -> render in
one jitted program — dynamic allocation is replaced by **fixed-stride chunk
slots**: chunk ``i`` of the batch owns pool span
``[1 + i*stride, 1 + (i+1)*stride)`` and its root is ``1 + i*stride``.

This works without any pointer fixup because SVO child indices are
chunk-relative — the traversal always reads ``nodes[root + idx]``
(ray_tracer.wgsl:95, ops/traverse.py) — and it is exactly the static-shape
re-expression of the reference's span allocator that a TPU wants: zero host
round-trips, donation-friendly, and the slack per slot is bounded by
``NODES_PER_CHUNK`` (~73 KiB worst case, SURVEY §6).

Index 0 of the pool stays a reserved air leaf so empty grid cells
(root 0) read as empty space.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..core.constants import CHUNK_SIZE, NODES_PER_CHUNK
from ..ops.traverse import WorldSlice


@partial(jax.jit, static_argnames=("size_in_chunks", "stride"))
def assemble_world_slice(
    chunk_nodes, chunk_cells, world_min, size_in_chunks, stride=NODES_PER_CHUNK
):
    """Pack per-chunk node arrays into one pool + root table, on device.

    Args:
      chunk_nodes: ``int32[B, stride]`` per-chunk nodes (from
        ``build_chunk_svo_batch``; entries past each chunk's used prefix are
        zero and harmless).
      chunk_cells: ``int32[B]`` flat grid cell index ``x + y*W + z*W²`` of
        each chunk (window-local). Cells < 0 mark unused batch slots.
      world_min: ``int32[3]`` voxel coordinate of the window's min corner.
      size_in_chunks: static window edge length W.
      stride: static per-chunk slot size in nodes.

    Returns a :class:`WorldSlice` with ``nodes: int32[1 + B*stride]``.
    """
    b = chunk_nodes.shape[0]
    w = size_in_chunks
    pool = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), chunk_nodes.reshape(-1).astype(jnp.int32)]
    )
    roots = jnp.zeros(w * w * w, dtype=jnp.int32)
    slot_roots = 1 + stride * jnp.arange(b, dtype=jnp.int32)
    cells = jnp.where(chunk_cells >= 0, chunk_cells, w * w * w)
    roots = roots.at[cells].set(slot_roots, mode="drop")
    return WorldSlice(
        nodes=pool, chunk_roots=roots, world_min=jnp.asarray(world_min, jnp.int32)
    )


def grid_cells(size_in_chunks):
    """All flat cell indices and their (cx, cy, cz) offsets for a W³ window."""
    w = size_in_chunks
    idx = jnp.arange(w * w * w, dtype=jnp.int32)
    x = idx % w
    y = (idx // w) % w
    z = idx // (w * w)
    return idx, jnp.stack([x, y, z], axis=-1)


def chunk_min_corners(min_chunk, size_in_chunks):
    """Voxel-space min corner of every chunk in the window, ``int32[W³, 3]``."""
    _, offs = grid_cells(size_in_chunks)
    return (jnp.asarray(min_chunk, jnp.int32) + offs) * CHUNK_SIZE

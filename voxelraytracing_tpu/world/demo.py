"""Self-contained procedural demo worlds.

A miniature, fully-on-device terrain generator used by the benchmark harness
and the compile-check entry point: Perlin column heights -> layered
stone/earth/grass columns with sea-level water, built as a batch of dense
``[32³]`` chunk grids (one tensor op per world). The full data-driven worldgen
(biomes, presets, features — server/src/world/gen.rs) lives in
``worldgen/``; this module exists so benches don't depend on datapacks.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..core.constants import CHUNK_SIZE
from ..ops import noise
from .assemble import assemble_world_slice, grid_cells

# Demo voxel ids (match the bundled respack's first entries).
AIR, STONE, EARTH, GRASS, WATER = 0, 1, 2, 3, 4

DEMO_STYLES = {
    STONE: {"color": (0.55, 0.55, 0.55), "state": "solid"},
    EARTH: {"color": (0.55, 0.35, 0.15), "state": "solid"},
    GRASS: {"color": (0.30, 0.68, 0.24), "state": "solid"},
    WATER: {"color": (0.12, 0.30, 0.85), "state": "liquid"},
}


def demo_materials(n_voxels=256):
    from ..ops.materials import make_material_table

    return make_material_table(n_voxels, DEMO_STYLES)


@partial(jax.jit, static_argnames=("size_in_chunks",))
def demo_chunk_grids(perm, min_chunk, size_in_chunks, height_scale, sea_level):
    """Dense voxel grids for every chunk of a W³ window.

    Returns ``(grids int32[W³, 32, 32, 32], cells int32[W³])``.
    """
    w = size_in_chunks
    cells, offs = grid_cells(w)
    corners = (jnp.asarray(min_chunk, jnp.int32) + offs) * CHUNK_SIZE  # [B,3]

    lx = jnp.arange(CHUNK_SIZE, dtype=jnp.int32)
    gx = corners[:, 0, None] + lx[None, :]  # [B,32]
    gz = corners[:, 2, None] + lx[None, :]
    # Column world positions [B,32,32,2] -> heights [B,32,32]
    pos = jnp.stack(
        jnp.broadcast_arrays(
            gx[:, :, None].astype(jnp.float32), gz[:, None, :].astype(jnp.float32)
        ),
        axis=-1,
    )
    h = noise.sample01(perm, pos * 0.01) * height_scale  # [B, 32(x), 32(z)]
    h = jnp.floor(h).astype(jnp.int32)

    gy = corners[:, 1, None] + lx[None, :]  # [B, 32] global y per layer
    y = gy[:, None, :, None]  # [B, 1, 32(y), 1]
    hh = h[:, :, None, :]  # [B, 32(x), 1, 32(z)]

    grid = jnp.where(y < hh - 3, STONE, AIR)
    grid = jnp.where((y >= hh - 3) & (y < hh - 1), EARTH, grid)
    grid = jnp.where((y >= hh - 1) & (y < hh), GRASS, grid)
    grid = jnp.where((grid == AIR) & (y < sea_level), WATER, grid)
    return grid.astype(jnp.int32), cells


def make_demo_world(seed=7, size_in_chunks=8, min_chunk=(0, 0, 0)):
    """Build a ready-to-trace WorldSlice: W³ chunks of layered terrain."""
    from ..ops.svo_build import build_chunk_svo_batch

    perm = jnp.asarray(noise.make_permutation(seed))
    w = size_in_chunks
    grids, cells = demo_chunk_grids(
        perm,
        jnp.asarray(min_chunk, jnp.int32),
        w,
        jnp.float32(w * CHUNK_SIZE * 0.45),
        jnp.int32(int(w * CHUNK_SIZE * 0.28)),
    )
    nodes, _ = build_chunk_svo_batch(grids)
    world_min = jnp.asarray(min_chunk, jnp.int32) * CHUNK_SIZE
    return assemble_world_slice(nodes, cells, world_min, w)


def demo_chunk_grids_host(perm, min_chunk, size_in_chunks, height_scale, sea_level):
    """NumPy twin of :func:`demo_chunk_grids` (host-only, for benchmarks
    and render-grid builds that must not run device programs)."""
    import numpy as np

    w = size_in_chunks
    b = w * w * w
    idx = np.arange(b, dtype=np.int64)
    offs = np.stack([idx % w, (idx // w) % w, idx // (w * w)], axis=-1)
    corners = (np.asarray(min_chunk, np.int64) + offs) * CHUNK_SIZE

    lx = np.arange(CHUNK_SIZE, dtype=np.int64)
    gx = corners[:, 0, None] + lx[None, :]
    gz = corners[:, 2, None] + lx[None, :]
    pos = np.stack(
        np.broadcast_arrays(
            gx[:, :, None].astype(np.float32), gz[:, None, :].astype(np.float32)
        ),
        axis=-1,
    )
    h = noise.sample01_np(np.asarray(perm), pos * 0.01) * float(height_scale)
    h = np.floor(h).astype(np.int64)

    gy = corners[:, 1, None] + lx[None, :]
    y = gy[:, None, :, None]
    hh = h[:, :, None, :]
    grid = np.where(y < hh - 3, STONE, AIR)
    grid = np.where((y >= hh - 3) & (y < hh - 1), EARTH, grid)
    grid = np.where((y >= hh - 1) & (y < hh), GRASS, grid)
    grid = np.where((grid == AIR) & (y < int(sea_level)), WATER, grid)
    return grid.astype(np.int32), idx.astype(np.int32)

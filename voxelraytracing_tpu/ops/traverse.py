"""Ray–world traversal: the engine's hot loop.

Batched, maskable re-expression of the reference GPU kernel's DDA/octree
march (ray_tracer.wgsl:182-316): every ray repeatedly (a) locates the leaf
node containing its position — chunk lookup by ``floor(pos/32)`` into the
root table, then a ≤5-level stackless octree descent re-deriving the octant
from the position at each level (ray_tracer.wgsl:76-125) — and (b) advances
to that node's AABB exit with a small epsilon nudge across the boundary
(ray_tracer.wgsl:243-283).

Divergence is handled the TPU way: a ``lax.while_loop`` over the whole ray
batch with per-ray active masks — the loop runs until every ray has hit,
left the world, or exhausted ``max_steps`` (the reference's per-thread
``while``+``break``). All state is structure-of-arrays ``f32/int32[N]``.

This single implementation serves as both the CPU reference oracle and the
production TPU path — it is the same jitted program on either backend.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import nodes as nodefmt
from ..core.constants import CHUNK_SIZE, MAX_RAY_STEPS, RAY_EPS

# Python floats, deliberately NOT jnp scalars: module-level jnp constants
# are device arrays captured as closed-over compile constants, which trips
# the TPU's degraded dispatch mode (see ops/wavefront.py magnitude/closure
# notes and experiments/).
_BIG = 1e9
# Squaring this must stay finite (see the finite-math note in trace_rays).
_BIG_RATIO = 1e4


class WorldSlice(NamedTuple):
    """Device-resident render view of the world — the two-buffer contract
    shared with the reference's bind group (shader.rs:317-320).

    nodes: ``int32[pool]`` widened 16-bit SVO nodes; index 0 is a reserved
      air leaf so missing chunks (root 0) read as empty.
    chunk_roots: ``int32[W**3]`` absolute node-pool address of each chunk's
      root, flat-indexed ``x + y*W + z*W²``.
    world_min: ``int32[3]`` voxel coordinate of the grid's min corner.
    """

    nodes: jax.Array
    chunk_roots: jax.Array
    world_min: jax.Array

    @property
    def size_in_chunks(self):
        w = round(self.chunk_roots.shape[0] ** (1 / 3))
        assert w**3 == self.chunk_roots.shape[0]
        return w

    @property
    def size_in_voxels(self):
        return self.size_in_chunks * CHUNK_SIZE

    def packed(self):
        """Same world with the node pool packed two u16 nodes per u32
        word — the reference's device layout (shader.rs:22-40), halving
        the pool's HBM footprint. ``find_node`` dispatches on dtype, so
        a packed slice is a drop-in replacement everywhere."""
        if self.nodes.dtype == jnp.uint32:
            return self
        return self._replace(nodes=pack_nodes(self.nodes))


def pack_nodes(nodes_i32):
    """int32[pool] widened nodes -> uint32[ceil(pool/2)] packed pairs."""
    n = nodes_i32.shape[0]
    ev = nodes_i32[0::2].astype(jnp.uint32) & 0xFFFF
    od = jnp.pad(nodes_i32[1::2], (0, (n + 1) // 2 - n // 2)).astype(
        jnp.uint32
    ) & 0xFFFF
    return ev | (od << 16)


def _node_fetch(nodes, i):
    """Node value at pool index ``i`` for either pool layout."""
    if nodes.dtype == jnp.uint32:  # packed u16 pairs
        w_ = nodes[i >> 1]
        return (
            (w_ >> ((i & 1).astype(jnp.uint32) * 16)) & 0xFFFF
        ).astype(jnp.int32)
    return nodes[i]


class FoundNodes(NamedTuple):
    node: jax.Array  # int32[N] — node value at the query position
    box_min: jax.Array  # f32[N,3]
    box_max: jax.Array  # f32[N,3]


class TraceResult(NamedTuple):
    hit: jax.Array  # bool[N]
    voxel: jax.Array  # int32[N] — voxel id at the hit (or last sampled)
    norm: jax.Array  # f32[N,3] — entry-face normal (0 if camera starts inside)
    pos: jax.Array  # f32[N,3] — world-local hit position
    water_dist: jax.Array  # f32[N] — distance traveled through liquid
    steps: jax.Array  # int32[N] — march iterations (debug heatmap)


def find_node(nodes, chunk_roots, size_in_chunks, pos):
    """Locate the leaf (or depth-5) node containing each position.

    ``pos``: f32[..., 3], world-local, assumed inside the world volume.
    Fixed 5-level unrolled descent with done-masking — the Pallas/XLA shape of
    the reference's early-exit loop (ray_tracer.wgsl:87-111).
    """
    w = size_in_chunks
    cc = jnp.floor(pos / CHUNK_SIZE).astype(jnp.int32)
    chunk_idx = cc[..., 0] + cc[..., 1] * w + cc[..., 2] * w * w
    root = chunk_roots[chunk_idx]

    center = cc.astype(jnp.float32) * CHUNK_SIZE + CHUNK_SIZE / 2.0
    size = jnp.full(pos.shape[:-1], float(CHUNK_SIZE), dtype=jnp.float32)
    idx = jnp.zeros_like(root)
    done = jnp.zeros(pos.shape[:-1], dtype=bool)

    node = _node_fetch(nodes, root + idx)
    for _ in range(5):  # CHUNK_DEPTH
        leaf = (node & nodefmt.SPLIT_MASK) == 0
        done = done | leaf
        half = size * 0.5
        gt = pos >= center
        child = (
            gt[..., 0].astype(jnp.int32)
            + 2 * gt[..., 1].astype(jnp.int32)
            + 4 * gt[..., 2].astype(jnp.int32)
        )
        nxt_idx = (node & nodefmt.DATA_MASK) + child
        child_dir = gt.astype(jnp.float32) * 2.0 - 1.0
        nxt_center = center + (half * 0.5)[..., None] * child_dir

        idx = jnp.where(done, idx, nxt_idx)
        center = jnp.where(done[..., None], center, nxt_center)
        size = jnp.where(done, size, half)
        node = jnp.where(done, node, _node_fetch(nodes, root + idx))

    half = (size * 0.5)[..., None]
    return FoundNodes(node=node, box_min=center - half, box_max=center + half)


def _select_step(ax):
    """Min over the three axis distances with the reference's exact
    zero-distance special-casing (ray_tracer.wgsl:247-270)."""
    x, y, z = ax[..., 0], ax[..., 1], ax[..., 2]
    xz = x == 0.0
    yz = y == 0.0
    zz = z == 0.0
    return jnp.where(
        xz,
        jnp.where(yz, z, jnp.where(zz, y, jnp.minimum(y, z))),
        jnp.where(
            yz,
            jnp.where(zz, x, jnp.minimum(x, z)),
            jnp.where(zz, jnp.minimum(y, x), jnp.minimum(x, jnp.minimum(y, z))),
        ),
    )


def trace_rays(world: WorldSlice, is_liquid, origin, dirs, max_steps=MAX_RAY_STEPS):
    """March a batch of rays through the world.

    Args:
      world: WorldSlice.
      is_liquid: ``bool[V]`` per-voxel liquid flags (material table column).
      origin: ``f32[3]`` shared world-local ray origin, or ``f32[N,3]``.
      dirs: ``f32[N,3]`` unit directions (any leading batch shape).
      max_steps: static iteration cap (500 for the primary tracer).

    Returns a TraceResult with the same leading batch shape as ``dirs``.
    """
    batch_shape = dirs.shape[:-1]
    dirs = dirs.reshape(-1, 3)
    n = dirs.shape[0]
    origin = jnp.asarray(origin, jnp.float32)
    if origin.ndim > 1:
        origin = origin.reshape(-1, 3)
    origin = jnp.broadcast_to(origin, (n, 3))

    w = world.size_in_chunks
    world_size = jnp.float32(w * CHUNK_SIZE)
    nodes = world.nodes
    chunk_roots = world.chunk_roots
    is_liquid = jnp.asarray(is_liquid)

    d = dirs
    mask = (d >= 0.0).astype(jnp.float32)
    imask = 1.0 - mask

    # Initial boundary nudge (ray_tracer.wgsl:188-190).
    pos = origin
    near_face = jnp.any(pos - jnp.floor(pos) < RAY_EPS, axis=-1)
    pos = jnp.where(near_face[:, None], pos + RAY_EPS * d, pos)

    # Out-of-world cameras see nothing (ray_tracer.wgsl:197-200).
    inside = ~(jnp.any(pos <= 0.0, axis=-1) | jnp.any(pos >= world_size, axis=-1))

    # Per-axis length of a ray segment that advances one unit on that axis
    # (ray_tracer.wgsl:206-210). FINITE-MATH INVARIANT: axis-aligned rays
    # have zero components, and a raw division here would manufacture Infs —
    # which permanently degrade the TPU for the rest of the process (every
    # later kernel ~1000× slower; see ops/wavefront.py and experiments/).
    # Guard the divisor, then substitute the sentinel.
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def _ratio(a, b):
        ok = jnp.abs(b) > 1e-12
        r = a / jnp.where(ok, b, 1.0)
        return jnp.where(ok, r, _BIG_RATIO)

    usq = jnp.stack(
        [
            1.0 + _ratio(dy, dx) ** 2 + _ratio(dz, dx) ** 2,
            1.0 + _ratio(dx, dy) ** 2 + _ratio(dz, dy) ** 2,
            1.0 + _ratio(dx, dz) ** 2 + _ratio(dy, dz) ** 2,
        ],
        axis=-1,
    )
    unit_step = jnp.minimum(jnp.sqrt(usq), _BIG)

    class Carry(NamedTuple):
        i: jax.Array
        pos: jax.Array
        active: jax.Array
        hit: jax.Array
        voxel: jax.Array
        norm: jax.Array
        water_dist: jax.Array
        entered_water: jax.Array  # -1.0 when not in water
        total_len: jax.Array
        steps: jax.Array

    init = Carry(
        i=jnp.int32(0),
        pos=pos,
        active=inside,
        hit=jnp.zeros(n, dtype=bool),
        voxel=jnp.zeros(n, dtype=jnp.int32),
        norm=jnp.zeros((n, 3), dtype=jnp.float32),
        water_dist=jnp.zeros(n, dtype=jnp.float32),
        entered_water=jnp.full(n, -1.0, dtype=jnp.float32),
        total_len=jnp.zeros(n, dtype=jnp.float32),
        steps=jnp.zeros(n, dtype=jnp.int32),
    )

    def cond(c):
        return (c.i < max_steps) & jnp.any(c.active)

    def body(c):
        found = find_node(nodes, chunk_roots, w, c.pos)
        vox = found.node & nodefmt.DATA_MASK
        liq = is_liquid[vox]

        steps = c.steps + c.active.astype(jnp.int32)
        hit_now = c.active & (vox != 0) & ~liq
        voxel = jnp.where(c.active, vox, c.voxel)
        cont = c.active & ~hit_now

        # Liquid bookkeeping (ray_tracer.wgsl:231-242).
        in_water = c.entered_water != -1.0
        exit_water = cont & ~liq & in_water
        water_dist = c.water_dist + jnp.where(
            exit_water, c.total_len - c.entered_water, 0.0
        )
        entered_water = jnp.where(exit_water, -1.0, c.entered_water)
        enter_water = cont & liq & (entered_water == -1.0)
        entered_water = jnp.where(enter_water, c.total_len, entered_water)

        # Advance to the node AABB exit (ray_tracer.wgsl:243-283).
        axis_dist = (
            (c.pos - found.box_min) * imask + (found.box_max - c.pos) * mask
        ) * unit_step
        step = _select_step(axis_dist)
        total_len = c.total_len + jnp.where(cont, step, 0.0)
        stepped = (step[:, None] == axis_dist).astype(jnp.float32)
        new_norm = stepped * -jnp.sign(d)
        new_pos = c.pos + d * (step + RAY_EPS)[:, None] * stepped + d * step[:, None] * (
            1.0 - stepped
        )

        oob = cont & (
            jnp.any(new_pos < 0.0, axis=-1) | jnp.any(new_pos >= world_size, axis=-1)
        )
        # Water credit for rays that exit the world while submerged
        # (ray_tracer.wgsl:285-290).
        water_dist = water_dist + jnp.where(
            oob & (entered_water != -1.0), total_len - entered_water, 0.0
        )

        return Carry(
            i=c.i + 1,
            pos=jnp.where(cont[:, None], new_pos, c.pos),
            active=cont & ~oob,
            hit=c.hit | hit_now,
            voxel=voxel,
            norm=jnp.where(cont[:, None], new_norm, c.norm),
            water_dist=water_dist,
            entered_water=entered_water,
            total_len=total_len,
            steps=steps,
        )

    c = jax.lax.while_loop(cond, body, init)

    # Epilogue (ray_tracer.wgsl:291-309): rays that hit — or exhausted the
    # step budget while still active — are reported as hits; submerged
    # distance up to the hit is credited.
    hit = c.hit | c.active
    water_dist = c.water_dist + jnp.where(
        hit & (c.entered_water != -1.0), c.total_len - c.entered_water, 0.0
    )

    def unflat(x):
        return x.reshape(batch_shape + x.shape[1:])

    return TraceResult(
        hit=unflat(hit),
        voxel=unflat(c.voxel),
        norm=unflat(c.norm),
        pos=unflat(c.pos),
        water_dist=unflat(water_dist),
        steps=unflat(c.steps),
    )

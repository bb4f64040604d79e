"""Windowed wavefront tracer (v1) — HISTORICAL tier.

Superseded by the v3/v4 fused pipelines (ops/wavefront3.py /
wavefront4.py); kept because (a) its host-side grid builders
(build_render_grid_host, render_id_maps) and tile constants are still
the production data path, and (b) its host-driven march is the most
introspectable executable history of the dispatch-cost findings below.
Its tracer-specific tests run under ``pytest -m historical`` only.

The reference GPU kernel leans on hardware caches to survive per-ray random
access into the SVO pool (ray_tracer.wgsl:220-291). TPUs have no such cache:
measured plain-gather throughput here is ~80-145 M lookups/s — three orders
of magnitude short of the ray-march budget (experiments/probe*.py). The one
fast per-lane lookup primitive is ``take_along_axis`` along the lane
dimension: each 128-lane row gathers from its *own* 128-wide table at close
to VPU rate when the tables ride along in the loop state.

The tracer is built entirely around that primitive:

  * The frame is cut into 16×8-pixel **tiles** = 128 coherent rays = one
    SIMD row. All ray state is ``[n_tiles, 128]``.
  * Empty space is crossed at **brick** granularity: 1 descend-bit per
    4³-voxel brick, windowed 16³ bricks (= 64³ voxels) per ``u32[128]`` row;
    each tile carries the row of the window its least-advanced ray is in.
    A second bit plane marks pure-liquid bricks so oceans traverse at brick
    (or whole-window) speed with exact water accounting at brick faces.
  * Occupied bricks resolve at **voxel** granularity through 8 per-tile
    **brick-content slots**: a brick's 4³ render-ids pack into 16 words, so
    one 128-word row holds 8 bricks; slots are assigned to the tile's
    voxel-level rays in ``t``-priority order each refetch round. Voxel
    lookups are again lane-local ``take_along_axis`` + shifts.
  * Rays that need a window/brick the tile hasn't fetched stall until the
    next refetch round; the global minimum-``t`` ray is always serviced, so
    the march always progresses.

World data lives in three flat tables (`RenderGrid`): the two brick bit
planes, and per-chunk brick contents addressed through a world-sized brick
directory — memory scales with *loaded chunks*, not world volume.

Render ids are a state-sorted remap of pack voxel ids (0 = air, then
liquids, then everything else), so liquid tests are range compares instead
of material-table gathers. Semantics match the reference kernel: hit on any
non-air non-liquid voxel, liquid path length for the water overlay,
entry-face normals, per-ray step counts for the debug heatmap.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import CHUNK_SIZE

TILE_W, TILE_H = 16, 8  # 128 rays per tile
BRICK = 4  # voxels per brick side
BWIN = 16  # bricks per brick-window side (64 voxels)
BWIN_VOX = BRICK * BWIN  # 64
N_SLOTS = 8  # brick-content slots per tile (8 × 16 words = one row)
EPS_T = 1e-3  # ray-space nudge across cell boundaries (the 0.001 of
#               ray_tracer.wgsl:274-283, applied along t)
# MAGNITUDE DISCIPLINE: float32 values at or near the type's maximum
# (~3e38) flowing through min/max/argmin reductions permanently trip this
# TPU into a ~83 ms/dispatch mode (experiments /tmp/w1_bisect.py: argmin
# over a 3e38-filled array poisons; the identical program with 1e9 is
# clean). Every sentinel below is chosen so no float anywhere in the
# tracer exceeds ~1e9.
# NOTE: these MUST be python floats, not jnp.float32 — a module-level jnp
# scalar is a *device array* captured as a closed-over compile constant,
# and programs with closed-over device constants (of any size, even
# scalars) compile into the poison mode (experiments /tmp/pbB-D.py).
_BIG = 1e9  # masked-out sentinel for t-priority selects
# Inverse-direction cap: directions with |c| < 1e-7 count as axis-degenerate
# (they advance < 1e-4 voxels across any representable world), so legit
# inverses stay ≤ 1e7 and DDA products ≤ 64 × 1e7 « _BIG.
_BIG_IV = 1e7

# Compile salt: whether a given program compiles into the poison mode is a
# deterministic function of its exact HLO, but effectively a coin flip
# across semantically-equivalent formulations. The salt injects a no-op
# (folded away by XLA after the cache key is formed) so a poisoned dispatch
# can be re-rolled by bumping VOXELTPU_WF_SALT. The checked-in default was
# found clean with experiments/wf_chain_canary.py.
import os as _os

_SALT = float(_os.environ.get("VOXELTPU_WF_SALT", "0"))


def _salted(x):
    return x + _SALT * 0.0


class RenderGrid(NamedTuple):
    """Traversal-ready world.

    bwin: ``uint32[Nb³, 128]`` brick **descend** bits — set when a 4³ brick
      needs voxel-level resolution (contains any solid voxel, or mixes air
      and liquid). Window row index is ``wx + wy*Nb + wz*Nb²``; within a
      window, brick ``(bx,by,bz)`` lives at linear ``bx + by*16 + bz*256``
      -> word ``linear>>5``, bit ``linear&31``.
    lwin: ``uint32[Nb³, 128]`` brick **all-liquid** bits, same layout.
    brick_dir: ``int32[S³]`` global brick id -> row in ``bricks`` (−1 where
      no chunk data); ``S`` = bricks per padded world edge; brick id is
      ``bx + by*S + bz*S²``.
    bricks: ``uint32[rows, 16]`` packed per-brick render ids — voxel
      ``(vx,vy,vz)`` of a brick at linear ``vx + vy*4 + vz*16`` -> word
      ``linear>>2``, byte ``linear&3``.
    world_min: ``int32[3]`` voxel coordinate of the world's min corner.
    to_pack: ``int32[256]`` render id -> pack voxel id.
    n_liquid: ``int32`` scalar; render ids 1..n_liquid are liquids.
    size_voxels: real (unpadded) world edge length in voxels (int, static).
    """

    bwin: jax.Array
    lwin: jax.Array
    brick_dir: jax.Array
    bricks: jax.Array
    world_min: jax.Array
    to_pack: jax.Array
    n_liquid: jax.Array
    size_voxels: int


def render_id_maps(is_liquid_np):
    """Sort pack ids into render ids: 0=air, 1..L=liquids, rest solid.

    Args:
      is_liquid_np: bool array over pack voxel ids (index 0 must be air).
    Returns:
      (to_render int32[n_pack], to_pack int32[256], n_liquid int)
    """
    n = len(is_liquid_np)
    liquids = [i for i in range(1, n) if is_liquid_np[i]]
    others = [i for i in range(1, n) if not is_liquid_np[i]]
    order = [0] + liquids + others  # render id -> pack id
    if len(order) > 256:
        raise ValueError("wavefront tracer supports at most 256 voxel types")
    to_pack = np.zeros(256, np.int32)
    to_pack[: len(order)] = order
    to_render = np.zeros(n, np.int32)
    for rid, pid in enumerate(order):
        to_render[pid] = rid
    return to_render, to_pack, len(liquids)


def _cdiv(a, b):
    return -(-a // b)


@partial(jax.jit, static_argnames=("size_in_chunks",))
def build_render_grid_impl(grids, cells, world_min, to_render, to_pack,
                           n_liquid, size_in_chunks):
    """Compile dense chunk grids into traversal tables (device, one shot).

    grids: ``int32[B,32,32,32]`` pack-id voxel grids (axes x,y,z).
    cells: ``int32[B]`` window-local flat chunk cell ``x + y*W + z*W²``
      (negative = unused slot).
    """
    w = size_in_chunks
    v = w * CHUNK_SIZE
    vpad = _cdiv(v, BWIN_VOX) * BWIN_VOX
    nb = vpad // BWIN_VOX
    b = grids.shape[0]

    # pack ids -> render ids (one-off world-build gather)
    rg = to_render[grids]  # int32[B,32,32,32]

    cx = cells % w
    cy = (cells // w) % w
    cz = cells // (w * w)
    valid = cells >= 0

    # ---- brick classification -----------------------------------------
    # Brick view: [B, Bx,vx, By,vy, Bz,vz] with 8 bricks and 4 voxels/axis.
    bview = rg.reshape(b, 8, BRICK, 8, BRICK, 8, BRICK)
    is_liq_v = (bview >= 1) & (bview <= n_liquid)
    any_solid = (bview > n_liquid).any(axis=(2, 4, 6))  # [B,8,8,8]
    any_liq = is_liq_v.any(axis=(2, 4, 6))
    all_liq = is_liq_v.all(axis=(2, 4, 6))
    any_air = (bview == 0).any(axis=(2, 4, 6))
    descend = any_solid | (any_liq & any_air)

    # global brick coords of each chunk's 8³ bricks
    bg_side = nb * BWIN
    gbx = jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 1) + cx[:, None, None, None] * 8
    gby = jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 2) + cy[:, None, None, None] * 8
    gbz = jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 3) + cz[:, None, None, None] * 8
    gflat = gbx + gby * bg_side + gbz * bg_side * bg_side
    gflat = jnp.where(valid[:, None, None, None], gflat, bg_side**3)

    def brick_windows(bbits):
        """Scatter [B,8,8,8] per-chunk brick bits into window bit rows."""
        bgrid = jnp.zeros(bg_side**3, dtype=jnp.uint32)
        bgrid = bgrid.at[gflat.reshape(-1)].set(
            bbits.reshape(-1).astype(jnp.uint32), mode="drop"
        )
        # flat = bx + by*S + bz*S² -> C reshape into (nb,16,nb,16,nb,16)
        # yields axes (zw, zl, yw, yl, xw, xl); regroup per window with the
        # in-window linear order bx + by*16 + bz*256 (x fastest).
        bgrid = bgrid.reshape(nb, BWIN, nb, BWIN, nb, BWIN)
        bgrid = bgrid.transpose(0, 2, 4, 1, 3, 5)  # [zw, yw, xw, zl, yl, xl]
        bits = bgrid.reshape(nb * nb * nb, 128, 32)
        wshift = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        # row order (zw, yw, xw) == the wx + wy*nb + wz*nb² flat convention
        return jnp.sum(bits << wshift, axis=-1, dtype=jnp.uint32)

    bwin = brick_windows(descend)
    lwin = brick_windows(all_liq)

    # ---- brick contents + directory -----------------------------------
    # content row for chunk i, brick (bx,by,bz) = i*512 + bx*64 + by*8 + bz
    bc = bview.transpose(0, 1, 3, 5, 6, 4, 2)  # [b, Bx, By, Bz, vz, vy, vx]
    bc = bc.reshape(b * 512, 16, 4).astype(jnp.uint32)
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, :]
    bricks = jnp.sum(bc << shifts, axis=-1, dtype=jnp.uint32)  # [b*512, 16]

    li = jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 1) * 64 \
        + jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 2) * 8 \
        + jax.lax.broadcasted_iota(jnp.int32, (b, 8, 8, 8), 3)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * 512 + li
    brick_dir = jnp.full(bg_side**3, -1, jnp.int32)
    brick_dir = brick_dir.at[gflat.reshape(-1)].set(rows.reshape(-1), mode="drop")

    return RenderGrid(
        bwin=bwin,
        lwin=lwin,
        brick_dir=brick_dir,
        bricks=bricks,
        world_min=jnp.asarray(world_min, jnp.int32),
        to_pack=jnp.asarray(to_pack, jnp.int32),
        n_liquid=jnp.asarray(n_liquid, jnp.int32),
        size_voxels=v,
    )


def build_render_grid(grids, cells, world_min, size_in_chunks, materials):
    """Convenience wrapper: derive id maps from a MaterialTable."""
    is_liquid = np.asarray(materials.is_liquid)
    to_render, to_pack, n_liquid = render_id_maps(is_liquid)
    rg = build_render_grid_impl(
        jnp.asarray(grids, jnp.int32),
        jnp.asarray(cells, jnp.int32),
        jnp.asarray(world_min, jnp.int32),
        jnp.asarray(to_render),
        jnp.asarray(to_pack),
        jnp.int32(n_liquid),
        size_in_chunks,
    )
    # size_voxels must be a python int (static downstream) — computed on
    # host: pulling the device scalar would be a D2H transfer, and ANY
    # device->host transfer permanently degrades this TPU process to
    # ~83 ms/dispatch (see the D2H note on trace_wavefront).
    return rg._replace(size_voxels=size_in_chunks * CHUNK_SIZE)

# ----------------------------------------------------------------- tracing
#
# HOW THIS RUNS (and why it is host-driven):
#
# XLA's TPU backend has two lowerings for minor-dim take_along_axis /
# row-gather: a fast native dynamic-gather (~HBM speed) and a scoped-
# staging emulation ~600× slower. Which one a gather gets depends on the
# size/fusion context of the surrounding computation — inside loop bodies
# or large jitted programs it reliably degrades (experiments/probe9-26.py,
# wf_splitstep.py). Small single-purpose dispatches reliably get the fast
# kernels, and host dispatch overhead is ~20 µs amortized by async
# pipelining. The frame march is therefore a Python loop over jitted
# micro-programs:
#
#   _prep      once   ray components, slab exit, initial carry
#   _refetch   /round tile window + content-slot assignment (argmin logic)
#   _rows      /round window bit rows + slot content rows (row gathers)
#   per step:  _pre (VPU index math) -> _gather3 (the three lane-local
#              gathers) -> _post (decisions, DDA advance, carry update)
#   _n_active  every few rounds, for early exit
#   _finish    once   hits/normals/water to [H, W] maps
#
# All 3-vector quantities live as separate [T,128] component arrays — a
# minor-dim size-3 axis pads to 128 lanes on TPU and multiplies traffic
# ~42× (experiments/probe13-16.py).


def _dda3(px, py, pz, rays, cell):
    """One DDA step in component form: exit distance of the ``cell``-sized
    cell containing p, plus per-axis crossing masks."""

    def axis(pc, iv, sgn):
        # ceil-1 for negative directions: identical off-boundary, but a
        # position exactly ON a plane targets the crossing strictly
        # below instead of returning dt==0 (which micro-steps the ray
        # in place — see wavefront3.py step() for the full analysis)
        q = pc / cell
        b = jnp.where(sgn > 0.5, jnp.floor(q) + 1.0, jnp.ceil(q) - 1.0)
        dt = (b * cell - pc) * iv
        return jnp.where(jnp.abs(iv) >= 0.99 * _BIG_IV, _BIG, dt)

    dtx = axis(px, rays.ivx, rays.sx)
    dty = axis(py, rays.ivy, rays.sy)
    dtz = axis(pz, rays.ivz, rays.sz)
    dt = jnp.minimum(dtx, jnp.minimum(dty, dtz))
    return dt, dtx <= dt, dty <= dt, dtz <= dt


class WavefrontResult(NamedTuple):
    hit: jax.Array  # bool[H, W]
    voxel: jax.Array  # int32[H, W] — pack voxel id at hit
    norm: jax.Array  # f32[H, W, 3]
    t: jax.Array  # f32[H, W] — hit distance
    water_dist: jax.Array  # f32[H, W]
    steps: jax.Array  # int32[H, W]


class _Rays(NamedTuple):
    """Per-frame constants, all [T, 128] (component form)."""

    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    ivx: jax.Array
    ivy: jax.Array
    ivz: jax.Array
    sx: jax.Array
    sy: jax.Array
    sz: jax.Array
    t_exit: jax.Array


class _Carry(NamedTuple):
    t: jax.Array
    active: jax.Array
    hit: jax.Array
    level: jax.Array  # 0 brick, 1 voxel
    cur_brick: jax.Array  # flat brick id while at voxel level
    axmask: jax.Array  # bits 0..2: axes crossed by last step
    vox: jax.Array  # render id at hit
    water: jax.Array
    wenter: jax.Array  # -1 when not submerged
    steps: jax.Array
    bw_id: jax.Array  # [T]
    slot_bricks: jax.Array  # [T, N_SLOTS]
    slot_content: jax.Array  # [T, N_SLOTS]


# _prep is deliberately split into probe-sized dispatches: large fused
# programs on this TPU nondeterministically compile with a "poison" that
# permanently drops the process out of fast dispatch mode (~0.05 ms ->
# ~83 ms per dispatch); small single-purpose programs have been reliably
# clean (experiments/wf_chain_canary.py is the regression harness).

@partial(jax.jit, static_argnames=("tx", "ty"))
def _prep_dirs(dirs, *, tx, ty):
    n_tiles = tx * ty
    d = dirs.reshape(ty, TILE_H, tx, TILE_W, 3)
    d = d.transpose(0, 2, 1, 3, 4).reshape(n_tiles, 128, 3)
    return d[..., 0], d[..., 1], d[..., 2]


@jax.jit
def _prep_inv(c):
    # Guarded reciprocal via magnitude clamping: degenerate (≈0) components
    # come out as ±1e18 (== _BIG_IV) with no Inf ever produced. NOTE the
    # formulation matters beyond semantics: the equivalent
    # where(ok, 1/where(ok,c,1), BIG) compiles into a kernel that trips
    # this TPU's poison mode (experiments /tmp/inv_bisect.py).
    c2 = jnp.where(c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7))
    return 1.0 / c2


@jax.jit
def _prep_sign(c):
    return (c > 0.0).astype(jnp.float32)


@partial(jax.jit, static_argnames=("v",))
def _prep_texit(origin, ivx, ivy, ivz, *, v):
    o = jnp.asarray(origin, jnp.float32)

    def slab(oc, iv):
        # iv ≤ _BIG_IV=1e7 and |oc| ≤ a few thousand: products stay « 1e9
        return jnp.maximum((0.0 - oc) * iv, (jnp.float32(v) - oc) * iv)

    t_cap = jnp.float32(4.0 * v + 16.0)
    return jnp.minimum(
        jnp.minimum(
            slab(o[0], ivx), jnp.minimum(slab(o[1], ivy), slab(o[2], ivz))
        ),
        t_cap,
    )


@partial(jax.jit, static_argnames=("n_tiles", "v"))
def _prep_carry(origin, *, n_tiles, v):
    f32, i32 = jnp.float32, jnp.int32
    o = jnp.asarray(origin, f32)
    shape = (n_tiles, 128)
    inside = (
        (o[0] > 0.0) & (o[0] < v) & (o[1] > 0.0) & (o[1] < v)
        & (o[2] > 0.0) & (o[2] < v)
    )  # camera outside -> all miss (ray_tracer.wgsl:197-200)
    return _Carry(
        t=jnp.full(shape, EPS_T, f32),
        active=jnp.broadcast_to(inside, shape),
        hit=jnp.zeros(shape, bool),
        level=jnp.zeros(shape, i32),
        cur_brick=jnp.full(shape, -1, i32),
        axmask=jnp.zeros(shape, i32),
        vox=jnp.zeros(shape, i32),
        water=jnp.zeros(shape, f32),
        wenter=jnp.full(shape, -1.0, f32),
        steps=jnp.zeros(shape, i32),
        bw_id=jnp.full((n_tiles,), -1, i32),
        slot_bricks=jnp.full((n_tiles, N_SLOTS), -1, i32),
        slot_content=jnp.full((n_tiles, N_SLOTS), -1, i32),
    )


def _prep(origin, dirs, *, tx, ty, v):
    """Per-frame setup as a sequence of small dispatches."""
    dx, dy, dz = _prep_dirs(dirs, tx=tx, ty=ty)
    ivx, ivy, ivz = _prep_inv(dx), _prep_inv(dy), _prep_inv(dz)
    rays = _Rays(
        dx=dx, dy=dy, dz=dz, ivx=ivx, ivy=ivy, ivz=ivz,
        sx=_prep_sign(dx), sy=_prep_sign(dy), sz=_prep_sign(dz),
        t_exit=_prep_texit(origin, ivx, ivy, ivz, v=v),
    )
    return rays, _prep_carry(origin, n_tiles=tx * ty, v=v)


@partial(jax.jit, static_argnames=("nb",))
def _refetch(brick_dir, rays, c: _Carry, origin, rot, *, nb):
    """Service rays by rotation fairness: each round, every tile points its
    brick window at the first active brick-level ray at/after lane ``rot``
    and fills content slots from 8 rotation offsets of voxel-level rays.

    (A t-priority argmin formulation is semantically nicer, but float
    sentinel reductions compile into this TPU's poison mode — see the
    magnitude-discipline note at the top. Rotation gives the same
    termination guarantee: every active ray is eventually serviced.)
    """
    i32 = jnp.int32
    o = jnp.asarray(origin, jnp.float32)
    lanes = jax.lax.broadcasted_iota(i32, c.t.shape, 1)

    def first_active_from(mask, rot_k):
        # score: 128 - distance from the rotation point, 0 if inactive
        score = jnp.where(mask, 128 - ((lanes - rot_k) & 127), 0)
        li = jnp.argmax(score, axis=1)
        has = jnp.any(mask, axis=1)
        return li, has

    def lane_select(arr, si):
        return jnp.sum(jnp.where(lanes == si[:, None], arr, 0), axis=1)

    px = o[0] + rays.dx * c.t
    py = o[1] + rays.dy * c.t
    pz = o[2] + rays.dz * c.t

    bmask = c.active & (c.level == 0)
    bi, bhas = first_active_from(bmask, rot)

    def wcoord(pc):
        sel = lane_select(pc, bi)
        return jnp.clip(jnp.floor(sel / BWIN_VOX).astype(i32), 0, nb - 1)

    bw_target = wcoord(px) + wcoord(py) * nb + wcoord(pz) * nb * nb
    bw_id = jnp.where(bhas, bw_target, c.bw_id)

    vmask = c.active & (c.level == 1)
    slots = []
    for k in range(N_SLOTS):
        si, has = first_active_from(vmask, rot + k * (128 // N_SLOTS))
        bid = jnp.where(has, lane_select(c.cur_brick, si), -1)
        slots.append(bid)
    slot_bricks = jnp.stack(slots, axis=1)

    dir_idx = jnp.clip(slot_bricks, 0, brick_dir.shape[0] - 1)
    content = brick_dir[dir_idx]
    slot_bricks = jnp.where(content >= 0, slot_bricks, -1)
    return c._replace(
        bw_id=bw_id, slot_bricks=slot_bricks, slot_content=content
    )


@jax.jit
def _rows_win(bwin, lwin, bw_id):
    row_idx = jnp.clip(bw_id, 0, bwin.shape[0] - 1)
    bw_row = bwin[row_idx]
    lw_row = lwin[row_idx]
    no_descend = jnp.all(bw_row == 0, axis=1)
    uniform_liq = jnp.all(lw_row == jnp.uint32(0xFFFFFFFF), axis=1) | jnp.all(
        lw_row == 0, axis=1
    )
    return bw_row, lw_row, no_descend & uniform_liq


@jax.jit
def _rows_slots(bricks, slot_content):
    n_tiles = slot_content.shape[0]
    rows = bricks[jnp.clip(slot_content, 0, bricks.shape[0] - 1)]
    return rows.reshape(n_tiles, N_SLOTS * 16)


@partial(jax.jit, static_argnames=("nb", "bg_side"))
def _pre(rays, c: _Carry, origin, *, nb, bg_side):
    """Per-step index math (pure VPU): gather indices + phase bookkeeping
    that doesn't depend on this step's lookups."""
    i32 = jnp.int32
    o = jnp.asarray(origin, jnp.float32)
    px = o[0] + rays.dx * c.t
    py = o[1] + rays.dy * c.t
    pz = o[2] + rays.dz * c.t

    bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
    by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
    bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
    lin = (bx & (BWIN - 1)) + (by & (BWIN - 1)) * BWIN \
        + (bz & (BWIN - 1)) * BWIN * BWIN
    widx = lin >> 5

    # voxel-phase slot index (cur_brick after demotion)
    sidx = jnp.zeros(c.t.shape, i32)
    for s_i in range(N_SLOTS):
        m = c.cur_brick == c.slot_bricks[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx)
    vx = jnp.floor(px).astype(i32)
    vy = jnp.floor(py).astype(i32)
    vz = jnp.floor(pz).astype(i32)
    vlin = (vx & (BRICK - 1)) + (vy & (BRICK - 1)) * BRICK \
        + (vz & (BRICK - 1)) * BRICK * BRICK
    vidx = sidx * 16 + (vlin >> 2)
    return widx, vidx


@jax.jit
def _gather3(bw_row, lw_row, slot_row, widx, vidx):
    """The three lane-local lookups, alone in one dispatch so they lower to
    the fast native dynamic-gather kernels."""
    word = jnp.take_along_axis(bw_row, widx, axis=1)
    lword = jnp.take_along_axis(lw_row, widx, axis=1)
    vword = jnp.take_along_axis(slot_row, vidx, axis=1)
    return word, lword, vword


@partial(jax.jit, static_argnames=("nb", "bg_side"))
def _post_brick(rays, c: _Carry, origin, bw_jump, word, lword,
                *, nb, bg_side):
    """Consume the brick-window lookups: promotions, brick-level liquid
    accounting, brick/window DDA advance."""
    f32, i32 = jnp.float32, jnp.int32
    o = jnp.asarray(origin, jnp.float32)
    px = o[0] + rays.dx * c.t
    py = o[1] + rays.dy * c.t
    pz = o[2] + rays.dz * c.t

    active = c.active & (c.t < rays.t_exit)

    bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
    by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
    bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
    fb = bx + by * bg_side + bz * bg_side * bg_side
    level = jnp.where(active & (c.level == 1) & (fb != c.cur_brick), 0, c.level)

    bl = active & (level == 0)
    bw_flat = (bx >> 4) + (by >> 4) * nb + (bz >> 4) * nb * nb
    match_b = bl & (bw_flat == c.bw_id[:, None])
    lin = (bx & (BWIN - 1)) + (by & (BWIN - 1)) * BWIN \
        + (bz & (BWIN - 1)) * BWIN * BWIN
    shift = (lin & 31).astype(jnp.uint32)
    descend = ((word >> shift) & 1) != 0
    brick_liq = ((lword >> shift) & 1) != 0

    to_voxel = match_b & descend
    level = jnp.where(to_voxel, 1, level)
    cur_brick = jnp.where(to_voxel, fb, c.cur_brick)

    bstep = match_b & ~descend
    in_w = c.wenter >= 0.0
    leave_b = bstep & in_w & ~brick_liq
    water = c.water + jnp.where(leave_b, c.t - c.wenter, 0.0)
    wenter = jnp.where(leave_b, -1.0, c.wenter)
    wenter = jnp.where(bstep & brick_liq & (wenter < 0.0), c.t, wenter)

    cell = jnp.where(bw_jump[:, None], jnp.float32(BWIN_VOX), jnp.float32(BRICK))
    dt_b, cbx, cby, cbz = _dda3(px, py, pz, rays, cell)
    t = _salted(jnp.where(bstep, c.t + dt_b + EPS_T, c.t))
    axb = cbx.astype(i32) | (cby.astype(i32) << 1) | (cbz.astype(i32) << 2)
    axmask = jnp.where(bstep, axb, c.axmask)
    steps = c.steps + match_b.astype(i32)

    return c._replace(
        t=t, active=active, level=level, cur_brick=cur_brick,
        axmask=axmask, water=water, wenter=wenter, steps=steps,
    )


@jax.jit
def _post_voxel(rays, c: _Carry, origin, n_liquid, vword, pre_level,
                pre_cur_brick):
    """Consume the brick-content lookup: hits, voxel-level liquid
    accounting, single-voxel DDA advance.

    ``vword`` was gathered with a slot index derived from the *pre-step*
    carry (``pre_level``/``pre_cur_brick``), so only rays that were already
    at voxel level before ``_post_brick`` ran — and whose brick didn't
    change (promotion or demote-then-repromote rewrites ``cur_brick``) —
    may consume it; anyone else would read another brick's content."""
    f32, i32 = jnp.float32, jnp.int32
    o = jnp.asarray(origin, jnp.float32)
    px = o[0] + rays.dx * c.t
    py = o[1] + rays.dy * c.t
    pz = o[2] + rays.dz * c.t

    # slot membership recomputed (unrolled: a [T,128,8] compare would pad
    # its minor dim to 128 lanes)
    vl = (
        c.active & (c.level == 1)
        & (pre_level == 1) & (pre_cur_brick == c.cur_brick)
    )
    in_slot = jnp.zeros(c.t.shape, bool)
    for s_i in range(N_SLOTS):
        in_slot = in_slot | (c.cur_brick == c.slot_bricks[:, s_i][:, None])
    match_v = vl & in_slot
    vx = jnp.floor(px).astype(i32)
    vy = jnp.floor(py).astype(i32)
    vz = jnp.floor(pz).astype(i32)
    vlin = (vx & (BRICK - 1)) + (vy & (BRICK - 1)) * BRICK \
        + (vz & (BRICK - 1)) * BRICK * BRICK
    rid = ((vword >> ((vlin & 3).astype(jnp.uint32) * 8)) & 0xFF).astype(i32)

    is_air = rid == 0
    is_liq = (rid >= 1) & (rid <= n_liquid)
    solid = match_v & ~is_air & ~is_liq

    hit = c.hit | solid
    active = c.active & ~solid
    vox = jnp.where(solid, rid, c.vox)

    in_w = c.wenter >= 0.0
    leave_v = match_v & in_w & ~is_liq
    water = c.water + jnp.where(leave_v, c.t - c.wenter, 0.0)
    wenter = jnp.where(leave_v, -1.0, c.wenter)
    wenter = jnp.where(match_v & is_liq & (wenter < 0.0), c.t, wenter)

    vstep = match_v & (is_air | is_liq)
    dt_v, cvx, cvy, cvz = _dda3(px, py, pz, rays, jnp.float32(1.0))
    t = _salted(jnp.where(vstep, c.t + dt_v + EPS_T, c.t))
    axv = cvx.astype(i32) | (cvy.astype(i32) << 1) | (cvz.astype(i32) << 2)
    axmask = jnp.where(vstep, axv, c.axmask)
    steps = c.steps + match_v.astype(i32)

    return c._replace(
        t=t, active=active, hit=hit, axmask=axmask, vox=vox,
        water=water, wenter=wenter, steps=steps,
    )


@jax.jit
def _n_active(c: _Carry):
    return jnp.any(c.active)


@partial(jax.jit, static_argnames=("width", "height", "tx", "ty"))
def _finish(to_pack, rays, c: _Carry, *, width, height, tx, ty):
    f32 = jnp.float32
    # Budget-exhausted survivors render as MISS (sky) — the reference's
    # fell-out-of-the-loop behavior (ray_tracer.wgsl:220), same cap
    # semantics as the v3 tracer. Submerged rays still get water credit up
    # to their stop point.
    hit = c.hit
    t_stop = jnp.minimum(c.t, rays.t_exit)
    water = c.water + jnp.where(c.wenter >= 0.0, t_stop - c.wenter, 0.0)

    norm = jnp.stack(
        [
            -jnp.sign(rays.dx) * ((c.axmask >> 0) & 1).astype(f32),
            -jnp.sign(rays.dy) * ((c.axmask >> 1) & 1).astype(f32),
            -jnp.sign(rays.dz) * ((c.axmask >> 2) & 1).astype(f32),
        ],
        axis=-1,
    )
    voxel = to_pack[jnp.clip(c.vox, 0, 255)]

    def untile(x):
        extra = x.shape[2:]
        y = x.reshape((ty, tx, TILE_H, TILE_W) + extra)
        y = y.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(extra))))
        return y.reshape((height, width) + extra)

    return WavefrontResult(
        hit=untile(hit),
        voxel=untile(voxel),
        norm=untile(norm),
        t=untile(t_stop),
        water_dist=untile(water),
        steps=untile(c.steps),
    )


def trace_wavefront(
    rg: RenderGrid,
    origin,
    dirs,
    *,
    width,
    height,
    max_rounds=64,
    inner_steps=12,
    check_every=0,
):
    """March one frame of rays through a RenderGrid (host-driven).

    origin: f32[3] world-local camera position (shared by all rays).
    dirs:   f32[H, W, 3] unit directions.
    Returns a WavefrontResult of [H, W] maps.
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    tx = width // TILE_W
    ty = height // TILE_H
    nb = round(rg.bwin.shape[0] ** (1 / 3))
    while nb * nb * nb < rg.bwin.shape[0]:
        nb += 1
    bg_side = nb * BWIN

    # D2H WARNING: a device->host transfer (np.asarray, float()/bool() on a
    # device scalar, .item()) — of ANY size — permanently drops this TPU
    # process out of its fast dispatch mode (~0.05 ms -> ~83 ms per
    # dispatch; experiments /tmp/wf_d2h*.py). The march therefore runs a
    # FIXED round count with no host-side convergence polling by default;
    # rays that outlive the budget count as hits, exactly like the
    # reference's 500-step cap. Pass check_every > 0 only when the process
    # is already in slow mode (e.g. interactive sessions that fetch frames).
    origin = jnp.asarray(origin, jnp.float32)
    rays, carry = _prep(
        origin, jnp.asarray(dirs), tx=tx, ty=ty, v=int(rg.size_voxels)
    )
    for r in range(max_rounds):
        rot = jnp.int32((r * 37) & 127)  # co-prime stride covers all lanes
        carry = _refetch(rg.brick_dir, rays, carry, origin, rot, nb=nb)
        bw_row, lw_row, bw_jump = _rows_win(rg.bwin, rg.lwin, carry.bw_id)
        slot_row = _rows_slots(rg.bricks, carry.slot_content)
        for _ in range(inner_steps):
            pre_level, pre_cur_brick = carry.level, carry.cur_brick
            widx, vidx = _pre(rays, carry, origin, nb=nb, bg_side=bg_side)
            word, lword, vword = _gather3(bw_row, lw_row, slot_row, widx, vidx)
            carry = _post_brick(
                rays, carry, origin, bw_jump, word, lword,
                nb=nb, bg_side=bg_side,
            )
            carry = _post_voxel(
                rays, carry, origin, rg.n_liquid, vword, pre_level,
                pre_cur_brick,
            )
        if check_every and (r + 1) % check_every == 0 and not bool(
            _n_active(carry)
        ):
            break
    return _finish(
        rg.to_pack, rays, carry, width=width, height=height, tx=tx, ty=ty
    )


def build_render_grid_host(grids, cells, world_min, size_in_chunks, materials):
    """Host (NumPy) RenderGrid builder.

    Produces arrays identical to ``build_render_grid`` but without running
    any device program: the device builder's compiled form currently trips
    this TPU's degraded dispatch mode, so latency-insensitive one-shot
    builds (benchmarks, world loads) prefer the host path — the tables then
    reach the device as pure host->device uploads, which are safe.
    """
    grids = np.asarray(grids, np.int32)
    cells = np.asarray(cells, np.int32)
    is_liquid = np.asarray(materials.is_liquid)
    to_render, to_pack, n_liquid = render_id_maps(is_liquid)

    w = size_in_chunks
    v = w * CHUNK_SIZE
    vpad = _cdiv(v, BWIN_VOX) * BWIN_VOX
    nb = vpad // BWIN_VOX
    b = grids.shape[0]

    rg = to_render[grids]
    cx = cells % w
    cy = (cells // w) % w
    cz = cells // (w * w)
    valid = cells >= 0

    bview = rg.reshape(b, 8, BRICK, 8, BRICK, 8, BRICK)
    is_liq_v = (bview >= 1) & (bview <= n_liquid)
    any_solid = (bview > n_liquid).any(axis=(2, 4, 6))
    any_liq = is_liq_v.any(axis=(2, 4, 6))
    all_liq = is_liq_v.all(axis=(2, 4, 6))
    any_air = (bview == 0).any(axis=(2, 4, 6))
    descend = any_solid | (any_liq & any_air)

    bg_side = nb * BWIN
    ii = np.arange(8)
    gbx = ii[None, :, None, None] + (cx * 8)[:, None, None, None]
    gby = ii[None, None, :, None] + (cy * 8)[:, None, None, None]
    gbz = ii[None, None, None, :] + (cz * 8)[:, None, None, None]
    gflat = (gbx + gby * bg_side + gbz * bg_side * bg_side).astype(np.int64)

    def brick_windows(bbits):
        bgrid = np.zeros(bg_side**3, dtype=np.uint32)
        flat = gflat.reshape(-1)
        vals = bbits.reshape(-1).astype(np.uint32)
        ok = np.repeat(valid, 512)
        bgrid[flat[ok]] = vals[ok]
        g6 = bgrid.reshape(nb, BWIN, nb, BWIN, nb, BWIN)
        g6 = g6.transpose(0, 2, 4, 1, 3, 5)
        bits = g6.reshape(nb * nb * nb, 128, 32)
        return (bits << np.arange(32, dtype=np.uint32)).sum(
            axis=-1, dtype=np.uint64
        ).astype(np.uint32)

    bwin = brick_windows(descend)
    lwin = brick_windows(all_liq)

    bc = bview.transpose(0, 1, 3, 5, 6, 4, 2).reshape(b * 512, 16, 4)
    bricks = (
        bc.astype(np.uint32) << (np.arange(4, dtype=np.uint32) * 8)
    ).sum(axis=-1, dtype=np.uint64).astype(np.uint32)

    li = (ii[:, None, None] * 64 + ii[None, :, None] * 8 + ii[None, None, :])
    rows = np.arange(b, dtype=np.int64)[:, None, None, None] * 512 + li[None]
    brick_dir = np.full(bg_side**3, -1, np.int32)
    ok = np.repeat(valid, 512)
    brick_dir[gflat.reshape(-1)[ok]] = rows.reshape(-1)[ok].astype(np.int32)

    return RenderGrid(
        bwin=jnp.asarray(bwin),
        lwin=jnp.asarray(lwin),
        brick_dir=jnp.asarray(brick_dir),
        bricks=jnp.asarray(bricks),
        world_min=jnp.asarray(world_min, jnp.int32),
        to_pack=jnp.asarray(to_pack),
        n_liquid=jnp.asarray(np.int32(n_liquid)),
        size_voxels=v,
    )

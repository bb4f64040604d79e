"""Windowed wavefront tracer — the engine's fast path on TPU.

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
_BIG = jnp.float32(3e38)


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
    return build_render_grid_impl(
        jnp.asarray(grids, jnp.int32),
        jnp.asarray(cells, jnp.int32),
        jnp.asarray(world_min, jnp.int32),
        jnp.asarray(to_render),
        jnp.asarray(to_pack),
        jnp.int32(n_liquid),
        size_in_chunks,
    )


# ----------------------------------------------------------------- tracing


class WavefrontResult(NamedTuple):
    hit: jax.Array  # bool[H, W]
    voxel: jax.Array  # int32[H, W] — pack voxel id at hit
    norm: jax.Array  # f32[H, W, 3]
    t: jax.Array  # f32[H, W] — hit distance
    water_dist: jax.Array  # f32[H, W]
    steps: jax.Array  # int32[H, W]


def _dda(p, inv_d, pos_d, cell):
    """One DDA step: distance to the exit of the ``cell``-sized cell
    containing ``p``, plus the per-axis crossing mask."""
    cidx = jnp.floor(p / cell)
    nxt = (cidx + pos_d) * cell
    dt_ax = (nxt - p) * inv_d
    dt_ax = jnp.where(jnp.abs(inv_d) >= _BIG, _BIG, dt_ax)
    dt = jnp.min(dt_ax, axis=-1)
    crossed = dt_ax <= dt[..., None]
    return dt, crossed


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_rounds", "inner_steps"),
)
def trace_wavefront(
    rg: RenderGrid,
    origin,
    dirs,
    *,
    width,
    height,
    max_rounds=48,
    inner_steps=12,
):
    """March one frame of rays through a RenderGrid.

    origin: f32[3] world-local camera position (shared by all rays).
    dirs:   f32[H, W, 3] unit directions.
    Returns a WavefrontResult of [H, W] maps.
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    tx = width // TILE_W
    ty = height // TILE_H
    n_tiles = tx * ty

    v = rg.size_voxels
    nb = round(rg.bwin.shape[0] ** (1 / 3))
    while nb * nb * nb < rg.bwin.shape[0]:
        nb += 1
    bg_side = nb * BWIN  # brick grid edge (bricks)

    # [H, W, 3] -> [T, 128, 3] tile-major layout
    d = dirs.reshape(ty, TILE_H, tx, TILE_W, 3)
    d = d.transpose(0, 2, 1, 3, 4).reshape(n_tiles, 128, 3)
    o = jnp.asarray(origin, jnp.float32)

    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, _BIG)
    pos_d = (d > 0.0).astype(jnp.float32)

    # world slab: t range where the ray is inside [0, v]³
    t0_ax = (0.0 - o) * inv_d
    t1_ax = (jnp.float32(v) - o) * inv_d
    t_exit = jnp.min(jnp.maximum(t0_ax, t1_ax), axis=-1)
    inside = jnp.all((o > 0.0) & (o < v))  # camera outside -> all miss
    # (ray_tracer.wgsl:197-200)

    f32 = jnp.float32
    i32 = jnp.int32
    shape = (n_tiles, 128)

    class Carry(NamedTuple):
        rounds: jax.Array
        t: jax.Array
        active: jax.Array
        hit: jax.Array
        level: jax.Array  # 0 brick, 1 voxel
        cur_brick: jax.Array  # flat brick id while at voxel level
        axmask: jax.Array  # int32 bits 0..2: axes crossed by last step
        vox: jax.Array  # render id at hit
        water: jax.Array
        wenter: jax.Array  # -1 when not submerged
        steps: jax.Array
        bw_id: jax.Array  # [T]
        slot_bricks: jax.Array  # [T, N_SLOTS] — flat brick ids (-1 empty)
        slot_content: jax.Array  # [T, N_SLOTS] — rows in rg.bricks (-1 none)

    # NOTE: window/slot *rows* are deliberately NOT loop state — a gather
    # whose operand is itself a while_loop carry compiles pathologically on
    # TPU (hours/hangs); rows re-derive from the id state at the top of each
    # round instead (experiments/probe6.py vs probe7.py).

    init = Carry(
        rounds=i32(0),
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

    lanes = jax.lax.broadcasted_iota(i32, shape, 1)

    def lane_select(arr, si):
        """arr[T,128], si[T] -> arr[t, si[t]] without a gather."""
        return jnp.sum(jnp.where(lanes == si[:, None], arr, 0), axis=1)

    def flat_brick(bcoords):
        return (
            bcoords[..., 0]
            + bcoords[..., 1] * bg_side
            + bcoords[..., 2] * bg_side * bg_side
        )

    def refetch(c: Carry):
        """Service the least-advanced rays: point the tile's brick window at
        the min-t brick-level ray and fill content slots with the first
        N_SLOTS distinct bricks of voxel-level rays in t-order."""
        p = o + d * c.t[..., None]

        # brick window
        bmask = c.active & (c.level == 0)
        tb = jnp.where(bmask, c.t, _BIG)
        bi = jnp.argmin(tb, axis=1)
        bhas = jnp.any(bmask, axis=1)
        pb = jnp.stack([lane_select(p[..., a], bi) for a in range(3)], axis=-1)
        bw = jnp.clip(jnp.floor(pb / BWIN_VOX).astype(i32), 0, nb - 1)
        bw_target = bw[:, 0] + bw[:, 1] * nb + bw[:, 2] * nb * nb
        bw_id = jnp.where(bhas, bw_target, c.bw_id)

        # content slots, in t-priority order
        vmask = c.active & (c.level == 1)
        tt = jnp.where(vmask, c.t, _BIG)
        avail = vmask
        slots = []
        for _ in range(N_SLOTS):
            ts = jnp.where(avail, tt, _BIG)
            si = jnp.argmin(ts, axis=1)
            has = jnp.any(avail, axis=1)
            bid = jnp.where(has, lane_select(c.cur_brick, si), -1)
            slots.append(bid)
            avail = avail & (c.cur_brick != bid[:, None])
        slot_bricks = jnp.stack(slots, axis=1)  # [T, N_SLOTS]

        dir_idx = jnp.clip(slot_bricks, 0, rg.brick_dir.shape[0] - 1)
        content = rg.brick_dir[dir_idx]  # [T, N_SLOTS]
        slot_bricks = jnp.where(content >= 0, slot_bricks, -1)

        return c._replace(
            bw_id=bw_id, slot_bricks=slot_bricks, slot_content=content
        )

    def fetch_rows(c: Carry):
        """Derive the tile window/slot rows from the id state (in-body)."""
        row_idx = jnp.clip(c.bw_id, 0, rg.bwin.shape[0] - 1)
        bw_row = rg.bwin[row_idx]
        lw_row = rg.lwin[row_idx]
        no_descend = jnp.all(bw_row == 0, axis=1)
        uniform_liq = jnp.all(
            lw_row == jnp.uint32(0xFFFFFFFF), axis=1
        ) | jnp.all(lw_row == 0, axis=1)
        bw_jump = no_descend & uniform_liq
        rows = rg.bricks[jnp.clip(c.slot_content, 0, rg.bricks.shape[0] - 1)]
        slot_row = rows.reshape(n_tiles, N_SLOTS * 16)
        return bw_row, lw_row, bw_jump, slot_row

    def step(c: Carry, bw_row, lw_row, bw_jump, slot_row):
        p = o + d * c.t[..., None]

        # world exit
        out_now = c.active & (c.t >= t_exit)
        active = c.active & ~out_now

        # demote rays that left their brick
        b = jnp.floor(p * (1.0 / BRICK)).astype(i32)
        fb = flat_brick(b)
        level = jnp.where(
            active & (c.level == 1) & (fb != c.cur_brick), 0, c.level
        )

        # ---------- brick level ----------
        bl = active & (level == 0)
        bwc = b >> 4
        bw_flat = bwc[..., 0] + bwc[..., 1] * nb + bwc[..., 2] * nb * nb
        match_b = bl & (bw_flat == c.bw_id[:, None])
        lb = b & (BWIN - 1)
        lin = lb[..., 0] + lb[..., 1] * BWIN + lb[..., 2] * BWIN * BWIN
        widx = (lin >> 5).astype(i32)
        shift = (lin & 31).astype(jnp.uint32)
        word = jnp.take_along_axis(bw_row, widx, axis=1)
        descend = ((word >> shift) & 1) != 0
        lword = jnp.take_along_axis(lw_row, widx, axis=1)
        brick_liq = ((lword >> shift) & 1) != 0

        to_voxel = match_b & descend
        level = jnp.where(to_voxel, 1, level)
        cur_brick = jnp.where(to_voxel, fb, c.cur_brick)

        bstep = match_b & ~descend
        cell = jnp.where(bw_jump[:, None], f32(BWIN_VOX), f32(BRICK))
        dt_b, crossed_b = _dda(p, inv_d, pos_d, cell[..., None])

        # ---------- voxel level (brick-content slots) ----------
        vl = active & (level == 1)
        eq = cur_brick[..., None] == c.slot_bricks[:, None, :]  # [T,128,S]
        in_slot = jnp.any(eq, axis=-1)
        sidx = jnp.argmax(eq, axis=-1).astype(i32)
        match_v = vl & in_slot
        vcell = jnp.floor(p).astype(i32)
        lv = vcell & (BRICK - 1)
        vlin = lv[..., 0] + lv[..., 1] * BRICK + lv[..., 2] * BRICK * BRICK
        vword = jnp.take_along_axis(
            slot_row, sidx * 16 + (vlin >> 2), axis=1
        )
        rid = ((vword >> ((vlin & 3).astype(jnp.uint32) * 8)) & 0xFF).astype(i32)

        is_air = rid == 0
        is_liq = (rid >= 1) & (rid <= rg.n_liquid)
        solid = match_v & ~is_air & ~is_liq

        hit = c.hit | solid
        active = active & ~solid
        vox = jnp.where(solid, rid, c.vox)

        # liquid bookkeeping (semantics of ops/traverse.py:222-251).
        # Both levels sample a definite liquid state: voxels directly,
        # non-descend bricks via the all-liquid plane (uniform by
        # construction, so boundaries land exactly on brick faces).
        in_w = c.wenter >= 0.0
        samp_liq = (match_v & is_liq) | (bstep & brick_liq)
        samp_dry = (match_v & ~is_liq) | (bstep & ~brick_liq)
        leave = in_w & samp_dry
        water = c.water + jnp.where(leave, c.t - c.wenter, 0.0)
        wenter = jnp.where(leave, -1.0, c.wenter)
        enter = samp_liq & (wenter < 0.0)
        wenter = jnp.where(enter, c.t, wenter)

        vstep = match_v & (is_air | is_liq)
        dt_v, crossed_v = _dda(p, inv_d, pos_d, f32(1.0))

        # ---------- advance ----------
        stepped = bstep | vstep
        dt = jnp.where(bstep, dt_b, dt_v)
        crossed = jnp.where(bstep[..., None], crossed_b, crossed_v)
        t = jnp.where(stepped, c.t + dt + EPS_T, c.t)
        axbits = (
            crossed[..., 0].astype(i32)
            | (crossed[..., 1].astype(i32) << 1)
            | (crossed[..., 2].astype(i32) << 2)
        )
        axmask = jnp.where(stepped, axbits, c.axmask)
        steps = c.steps + (match_b | match_v).astype(i32)

        return c._replace(
            t=t, active=active, hit=hit, level=level, cur_brick=cur_brick,
            axmask=axmask, vox=vox, water=water, wenter=wenter, steps=steps,
        )

    def round_body(c: Carry):
        c = refetch(c)
        rows = fetch_rows(c)  # loop-invariant within the inner fori_loop
        c = jax.lax.fori_loop(
            0, inner_steps, lambda i, cc: step(cc, *rows), c
        )
        return c._replace(rounds=c.rounds + 1)

    def cond(c: Carry):
        return jnp.any(c.active) & (c.rounds < max_rounds)

    c = jax.lax.while_loop(cond, round_body, init)

    # Epilogue: step-cap survivors count as hits (ray_tracer.wgsl:291-309);
    # submerged rays get water credit up to their stop point.
    hit = c.hit | c.active
    t_stop = jnp.minimum(c.t, t_exit)
    water = c.water + jnp.where(c.wenter >= 0.0, t_stop - c.wenter, 0.0)

    norm = -jnp.sign(d) * jnp.stack(
        [(c.axmask >> a) & 1 for a in range(3)], axis=-1
    ).astype(f32)
    voxel = rg.to_pack[jnp.clip(c.vox, 0, 255)]

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

"""Fused wavefront tracer — one jitted program per frame (TPU fast path, v2).

Round 1's tracer (ops/wavefront.py) dispatched 4 micro-programs per march
step from a host loop, based on throughput numbers that turned out to be
enqueue-rate fictions: this runtime defers execution until a device->host
read, so ``block_until_ready`` timings measured nothing. Under *forced*
execution the true costs are:

  * per-dispatch overhead           ~0.5-1 ms   (kills dispatch-per-step)
  * XLA row-gather (any size)       ~1-2 ms     (latency-bound, flat)
  * XLA take_along_axis in a loop   ~600x slow  (real, not an artifact)
  * Pallas lane-local gather        ~VPU speed  (the fast primitive)

So v2 compiles the whole frame into ONE program: ``lax.scan`` over R rounds,
each round = XLA row-gathers (window bit rows + brick-content slot rows,
amortized by the scan) followed by a Pallas kernel that marches K steps with
all ray state resident in VMEM. Traversal semantics are identical to
ops/wavefront.py (same brick/voxel DDA, same EPS nudges, same rotation-
fairness refetch), which is itself verified against the SVO reference tracer
(the executable spec of clientdesktop/src/graphics/ray_tracer.wgsl:182-291).

World tables are the same ``RenderGrid`` as v1. Tiles are 16x8 pixels = one
128-lane row; a frame is ``[T, 128]`` component arrays.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import (
    BRICK,
    BWIN,
    BWIN_VOX,
    EPS_T,
    TILE_H,
    TILE_W,
    RenderGrid,
    WavefrontResult,
    _BIG,
    _BIG_IV,
)

_BLK = 256  # tiles per Pallas grid program (sweet spot per experiments)

# Content slots per tile. v1 had 8 (one 128-word row); v2 uses multiple rows
# so a round services far more distinct bricks — the grazing-ray tail (rays
# skimming the terrain shell through tens of descend bricks) converges in a
# handful of rounds instead of ~one brick per round.
N_SLOTS2 = 32
_SLOT_ROWS = N_SLOTS2 // 8  # 8 bricks (128 words) per slot row

# Window rows resident per tile: the tile's current window plus its six face
# neighbors. A DDA step crosses exactly one window face, so a marching ray
# lands in a resident row instead of stalling until the next refetch; only
# EPS-edge corner hops and second crossings wait for the recenter.
_N_WIN = 7
# offset id -> (dx, dy, dz); id 0 must be the center
_WIN_OFFS = np.array(
    [
        (0, 0, 0),
        (1, 0, 0), (-1, 0, 0),
        (0, 1, 0), (0, -1, 0),
        (0, 0, 1), (0, 0, -1),
    ],
    np.int32,
)


def _interpret_default():
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- march kernel


def _march_kernel(
    scal_ref,  # SMEM f32[8]: ox, oy, oz, n_liquid, v, 0, 0, 0
    dx_ref, dy_ref, dz_ref,
    bw_ref, lw_ref, sr_ref,
    bwid_ref,  # [BLK,1] i32 current window id per tile
    sb_ref,  # [BLK, N_SLOTS] i32 slot brick ids
    t_ref, act_ref, hit_ref, lvl_ref, cb_ref, ax_ref, vox_ref,
    wat_ref, wen_ref, stp_ref,
    # outputs
    t_o, act_o, hit_o, lvl_o, cb_o, ax_o, vox_o, wat_o, wen_o, stp_o,
    *, steps, nb, bg_side,
):
    f32, i32 = jnp.float32, jnp.int32
    ox = scal_ref[0]
    oy = scal_ref[1]
    oz = scal_ref[2]
    n_liquid = scal_ref[3].astype(i32)
    v = scal_ref[4]

    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]

    # Derived ray constants (recomputed per call — cheaper than carrying
    # 7 extra [T,128] arrays through HBM every round).
    def inv(c):
        c2 = jnp.where(c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7))
        return 1.0 / c2

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    sx = (dx > 0.0).astype(f32)
    sy = (dy > 0.0).astype(f32)
    sz = (dz > 0.0).astype(f32)

    def slab(oc, iv):
        return jnp.maximum((0.0 - oc) * iv, (v - oc) * iv)

    t_cap = 4.0 * v + 16.0
    t_exit = jnp.minimum(
        jnp.minimum(slab(ox, ivx), jnp.minimum(slab(oy, ivy), slab(oz, ivz))),
        t_cap,
    )

    slot_rows = [
        sr_ref[:, r * 128:(r + 1) * 128] for r in range(_SLOT_ROWS)
    ]
    # [BLK,1] flat id of the center window; clamp the initial -1 to window 0
    # so the coordinate decomposition never sees a negative (Mosaic's int
    # division semantics for negatives must not matter here — the fetch side
    # clamps identically).
    bw_id = jnp.maximum(bwid_ref[:], 0)
    wcx = bw_id % nb
    wcy = (bw_id // nb) % nb
    wcz = bw_id // (nb * nb)

    # Resident window rows: center + 6 face neighbors, each with a
    # whole-window-jump flag (no descend bricks + uniform liquidity,
    # ops/wavefront.py:_rows_win).
    bw_rows = []
    lw_rows = []
    jumps = []
    for k in range(_N_WIN):
        bwk = bw_ref[:, k * 128:(k + 1) * 128]
        lwk = lw_ref[:, k * 128:(k + 1) * 128]
        nd = jnp.all(bwk == 0, axis=1, keepdims=True)
        ul = jnp.all(
            lwk == jnp.uint32(0xFFFFFFFF), axis=1, keepdims=True
        ) | jnp.all(lwk == 0, axis=1, keepdims=True)
        bw_rows.append(bwk)
        lw_rows.append(lwk)
        jumps.append(nd & ul)

    def dda3(px, py, pz, cell):
        def axis(pc, ivc, sgn):
            nxt = (jnp.floor(pc / cell) + sgn) * cell
            dt = (nxt - pc) * ivc
            return jnp.where(jnp.abs(ivc) >= 0.99 * _BIG_IV, f32(_BIG), dt)

        dtx = axis(px, ivx, sx)
        dty = axis(py, ivy, sy)
        dtz = axis(pz, ivz, sz)
        dt = jnp.minimum(dtx, jnp.minimum(dty, dtz))
        return dt, dtx <= dt, dty <= dt, dtz <= dt

    def body(_, c):
        # active/hit ride the loop carry as i32 — Mosaic cannot legalize
        # vector<i1> loop carries in scf.for.
        t, active_i, hit_i, level, cur_brick, axmask, vox, water, wenter, \
            stp = c
        active = active_i != 0
        hit = hit_i != 0
        pre_level = level
        pre_cur_brick = cur_brick

        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        # --- indices (ops/wavefront.py:_pre) ---
        bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
        by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
        bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
        lin = (bx & (BWIN - 1)) + (by & (BWIN - 1)) * BWIN \
            + (bz & (BWIN - 1)) * BWIN * BWIN
        widx = lin >> 5

        sidx = jnp.zeros_like(level)
        for s_i in range(N_SLOTS2):
            m = cur_brick == sb_ref[:, s_i][:, None]
            sidx = jnp.where(m, i32(s_i), sidx)
        vx = jnp.floor(px).astype(i32)
        vy = jnp.floor(py).astype(i32)
        vz = jnp.floor(pz).astype(i32)
        vlin = (vx & (BRICK - 1)) + (vy & (BRICK - 1)) * BRICK \
            + (vz & (BRICK - 1)) * BRICK * BRICK
        srow = sidx >> 3  # which 128-word slot row
        vidx = (sidx & 7) * 16 + (vlin >> 2)

        # --- resident-window select + the lane-local gathers ---
        # which of the 7 resident windows is this ray in?
        dwx = (bx >> 4) - wcx
        dwy = (by >> 4) - wcy
        dwz = (bz >> 4) - wcz
        word = jnp.zeros_like(bw_rows[0])
        lword = jnp.zeros_like(lw_rows[0])
        jump = jnp.zeros(t.shape, bool)
        in_win = jnp.zeros(t.shape, bool)
        for k, (ox_, oy_, oz_) in enumerate(_WIN_OFFS):
            sel = (dwx == ox_) & (dwy == oy_) & (dwz == oz_)
            word = jnp.where(
                sel, jnp.take_along_axis(bw_rows[k], widx, axis=1), word
            )
            lword = jnp.where(
                sel, jnp.take_along_axis(lw_rows[k], widx, axis=1), lword
            )
            jump = jump | (sel & jumps[k])
            in_win = in_win | sel
        cell_b = jnp.where(jump, f32(BWIN_VOX), f32(BRICK))
        vword = jnp.zeros_like(slot_rows[0])
        for r_i in range(_SLOT_ROWS):
            vword = jnp.where(
                srow == r_i,
                jnp.take_along_axis(slot_rows[r_i], vidx, axis=1),
                vword,
            )

        # --- brick phase (ops/wavefront.py:_post_brick) ---
        active = active & (t < t_exit)
        fb = bx + by * bg_side + bz * bg_side * bg_side
        level = jnp.where(
            active & (level == 1) & (fb != cur_brick), 0, level
        )
        bl = active & (level == 0)
        match_b = bl & in_win
        shift = (lin & 31).astype(jnp.uint32)
        descend = ((word >> shift) & 1) != 0
        brick_liq = ((lword >> shift) & 1) != 0

        to_voxel = match_b & descend
        level = jnp.where(to_voxel, 1, level)
        cur_brick = jnp.where(to_voxel, fb, cur_brick)

        bstep = match_b & ~descend
        in_w = wenter >= 0.0
        leave_b = bstep & in_w & ~brick_liq
        water = water + jnp.where(leave_b, t - wenter, 0.0)
        wenter = jnp.where(leave_b, -1.0, wenter)
        wenter = jnp.where(bstep & brick_liq & (wenter < 0.0), t, wenter)

        dt_b, cbx, cby, cbz = dda3(px, py, pz, cell_b)
        t = jnp.where(bstep, t + dt_b + EPS_T, t)
        axb = cbx.astype(i32) | (cby.astype(i32) << 1) | (cbz.astype(i32) << 2)
        axmask = jnp.where(bstep, axb, axmask)
        stp = stp + match_b.astype(i32)

        # --- voxel phase (ops/wavefront.py:_post_voxel) ---
        # positions recomputed at the post-brick t
        px2 = ox + dx * t
        py2 = oy + dy * t
        pz2 = oz + dz * t
        vl = (
            active & (level == 1)
            & (pre_level == 1) & (pre_cur_brick == cur_brick)
        )
        in_slot = jnp.zeros_like(vl)
        for s_i in range(N_SLOTS2):
            in_slot = in_slot | (cur_brick == sb_ref[:, s_i][:, None])
        match_v = vl & in_slot
        vx2 = jnp.floor(px2).astype(i32)
        vy2 = jnp.floor(py2).astype(i32)
        vz2 = jnp.floor(pz2).astype(i32)
        vlin2 = (vx2 & (BRICK - 1)) + (vy2 & (BRICK - 1)) * BRICK \
            + (vz2 & (BRICK - 1)) * BRICK * BRICK
        rid = (
            (vword >> ((vlin2 & 3).astype(jnp.uint32) * 8)) & 0xFF
        ).astype(i32)

        is_air = rid == 0
        is_liq = (rid >= 1) & (rid <= n_liquid)
        solid = match_v & ~is_air & ~is_liq

        hit = hit | solid
        active = active & ~solid
        vox = jnp.where(solid, rid, vox)

        in_w = wenter >= 0.0
        leave_v = match_v & in_w & ~is_liq
        water = water + jnp.where(leave_v, t - wenter, 0.0)
        wenter = jnp.where(leave_v, -1.0, wenter)
        wenter = jnp.where(match_v & is_liq & (wenter < 0.0), t, wenter)

        vstep = match_v & (is_air | is_liq)
        dt_v, cvx, cvy, cvz = dda3(px2, py2, pz2, f32(1.0))
        t = jnp.where(vstep, t + dt_v + EPS_T, t)
        axv = cvx.astype(i32) | (cvy.astype(i32) << 1) | (cvz.astype(i32) << 2)
        axmask = jnp.where(vstep, axv, axmask)
        stp = stp + match_v.astype(i32)

        return (t, active.astype(i32), hit.astype(i32), level, cur_brick,
                axmask, vox, water, wenter, stp)

    init = (
        t_ref[:], act_ref[:], hit_ref[:], lvl_ref[:], cb_ref[:],
        ax_ref[:], vox_ref[:], wat_ref[:], wen_ref[:], stp_ref[:],
    )
    t, active, hit, level, cur_brick, axmask, vox, water, wenter, stp = (
        jax.lax.fori_loop(0, steps, body, init)
    )
    t_o[:] = t
    act_o[:] = active
    hit_o[:] = hit
    lvl_o[:] = level
    cb_o[:] = cur_brick
    ax_o[:] = axmask
    vox_o[:] = vox
    wat_o[:] = water
    wen_o[:] = wenter
    stp_o[:] = stp


def _march(
    scal, dx, dy, dz, bw_row, lw_row, slot_row, bw_id2, slot_bricks,
    t, active, hit, level, cur_brick, axmask, vox, water, wenter, stp,
    *, steps, nb, bg_side, interpret,
):
    T = t.shape[0]
    blk = _BLK if T % _BLK == 0 else T
    f32, i32 = jnp.float32, jnp.int32

    def vspec(w=128):
        return pl.BlockSpec((blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        vspec(), vspec(), vspec(),  # dx dy dz
        vspec(_N_WIN * 128), vspec(_N_WIN * 128),
        vspec(_SLOT_ROWS * 128),  # bw / lw / slot rows
        vspec(1),  # bw_id2
        vspec(N_SLOTS2),  # slot_bricks
        vspec(), vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
        vspec(), vspec(), vspec(),
    ]
    out_specs = tuple([vspec()] * 10)
    out_shape = tuple(
        jax.ShapeDtypeStruct((T, 128), d)
        for d in (f32, i32, i32, i32, i32, i32, i32, f32, f32, i32)
    )
    kern = partial(_march_kernel, steps=steps, nb=nb, bg_side=bg_side)
    return pl.pallas_call(
        kern,
        grid=(T // blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        scal, dx, dy, dz, bw_row, lw_row, slot_row, bw_id2, slot_bricks,
        t, active, hit, level, cur_brick, axmask, vox, water, wenter, stp,
    )


# ------------------------------------------------------------------- refetch


def _refetch2(brick_dir, dx, dy, dz, origin3, t, active, level, cur_brick,
              bw_id, rot, *, nb):
    """Rotation-fairness service selection (ops/wavefront.py:_refetch) +
    the window/content row gathers, as plain XLA inside the frame program."""
    i32 = jnp.int32
    lanes = jax.lax.broadcasted_iota(i32, t.shape, 1)

    def first_active_from(mask, rot_k):
        score = jnp.where(mask, 128 - ((lanes - rot_k) & 127), 0)
        li = jnp.argmax(score, axis=1)
        has = jnp.any(mask, axis=1)
        return li, has

    def lane_select(arr, si):
        return jnp.sum(jnp.where(lanes == si[:, None], arr, 0), axis=1)

    px = origin3[0] + dx * t
    py = origin3[1] + dy * t
    pz = origin3[2] + dz * t

    bmask = active & (level == 0)
    bi, bhas = first_active_from(bmask, rot)

    def wcoord(pc):
        sel = lane_select(pc, bi)
        return jnp.clip(jnp.floor(sel / BWIN_VOX).astype(i32), 0, nb - 1)

    bw_target = wcoord(px) + wcoord(py) * nb + wcoord(pz) * nb * nb
    bw_id = jnp.where(bhas, bw_target, bw_id)

    # Greedy distinct-brick slot assignment: each slot takes the brick of
    # the first still-unserved voxel-level ray after the rotation point,
    # then all rays in that brick drop out of the candidate set — so the
    # N_SLOTS slots cover N_SLOTS *different* bricks (the v1 rotation picks
    # often landed duplicates, wasting most of the round's service budget).
    remaining = active & (level == 1)
    slots = []
    for k in range(N_SLOTS2):
        si, has = first_active_from(
            remaining, rot + k * max(128 // N_SLOTS2, 1)
        )
        bid = jnp.where(has, lane_select(cur_brick, si), -1)
        slots.append(bid)
        remaining = remaining & (cur_brick != bid[:, None])
    slot_bricks = jnp.stack(slots, axis=1)

    dir_idx = jnp.clip(slot_bricks, 0, brick_dir.shape[0] - 1)
    content = brick_dir[dir_idx]
    slot_bricks = jnp.where(content >= 0, slot_bricks, -1)
    return bw_id, slot_bricks, content


# --------------------------------------------------------------------- frame


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "steps_per_round", "v", "interpret",
    ),
)
def _trace_frame(
    bwin, lwin, brick_dir, bricks, to_pack, n_liquid,
    origin, dirs,
    *, width, height, rounds, steps_per_round, v, interpret,
):
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    n_tiles = tx * ty
    T = -(-n_tiles // _BLK) * _BLK  # pad to whole Pallas blocks
    nb = int(round(bwin.shape[0] ** (1 / 3)))
    while nb * nb * nb < bwin.shape[0]:
        nb += 1
    bg_side = nb * BWIN

    origin = jnp.asarray(origin, f32)
    d = dirs.reshape(ty, TILE_H, tx, TILE_W, 3)
    d = d.transpose(0, 2, 1, 3, 4).reshape(n_tiles, 128, 3)
    pad = [(0, T - n_tiles), (0, 0)]
    dx = jnp.pad(d[..., 0], pad)
    dy = jnp.pad(d[..., 1], pad)
    dz = jnp.pad(d[..., 2], pad)

    inside = (
        (origin[0] > 0.0) & (origin[0] < v)
        & (origin[1] > 0.0) & (origin[1] < v)
        & (origin[2] > 0.0) & (origin[2] < v)
    )
    shape = (T, 128)
    lane_tile = jax.lax.broadcasted_iota(i32, shape, 0)
    valid = lane_tile < n_tiles
    scal = jnp.concatenate(
        [
            origin,
            jnp.asarray(n_liquid, f32).reshape(1),
            jnp.asarray([v, 0.0, 0.0, 0.0], f32),
        ]
    )

    carry = dict(
        t=jnp.full(shape, EPS_T, f32),
        active=(jnp.broadcast_to(inside, shape) & valid).astype(i32),
        hit=jnp.zeros(shape, i32),
        level=jnp.zeros(shape, i32),
        cur_brick=jnp.full(shape, -1, i32),
        axmask=jnp.zeros(shape, i32),
        vox=jnp.zeros(shape, i32),
        water=jnp.zeros(shape, f32),
        wenter=jnp.full(shape, -1.0, f32),
        steps=jnp.zeros(shape, i32),
        bw_id=jnp.full((T,), -1, i32),
    )

    def round_body(c, r):
        rot = (r * 37) & 127
        bw_id, slot_bricks, slot_content = _refetch2(
            brick_dir, dx, dy, dz, origin,
            c["t"], c["active"] != 0, c["level"], c["cur_brick"], c["bw_id"],
            rot, nb=nb,
        )
        # center + face-neighbor window rows ([T, 7] ids -> [T, 7*128]);
        # clamp matches the kernel's center decomposition
        bw_c = jnp.maximum(bw_id, 0)
        wcx = bw_c % nb
        wcy = (bw_c // nb) % nb
        wcz = bw_c // (nb * nb)
        offs = jnp.asarray(_WIN_OFFS)  # [7,3]
        nwx = jnp.clip(wcx[:, None] + offs[None, :, 0], 0, nb - 1)
        nwy = jnp.clip(wcy[:, None] + offs[None, :, 1], 0, nb - 1)
        nwz = jnp.clip(wcz[:, None] + offs[None, :, 2], 0, nb - 1)
        row_idx = nwx + nwy * nb + nwz * nb * nb  # [T,7]
        bw_row = bwin[row_idx].reshape(T, _N_WIN * 128)
        lw_row = lwin[row_idx].reshape(T, _N_WIN * 128)
        slot_row = bricks[jnp.clip(slot_content, 0, bricks.shape[0] - 1)]
        slot_row = slot_row.reshape(T, N_SLOTS2 * 16)

        outs = _march(
            scal, dx, dy, dz, bw_row, lw_row, slot_row,
            bw_id[:, None], slot_bricks,
            c["t"], c["active"], c["hit"], c["level"], c["cur_brick"],
            c["axmask"], c["vox"], c["water"], c["wenter"], c["steps"],
            steps=steps_per_round, nb=nb, bg_side=bg_side,
            interpret=interpret,
        )
        keys = ("t", "active", "hit", "level", "cur_brick", "axmask", "vox",
                "water", "wenter", "steps")
        c2 = dict(zip(keys, outs))
        c2["bw_id"] = bw_id
        return c2, ()

    carry, _ = jax.lax.scan(
        round_body, carry, jnp.arange(rounds, dtype=i32)
    )

    # ---- finish (ops/wavefront.py:_finish) ----
    def inv(cc):
        c2 = jnp.where(cc >= 0, jnp.maximum(cc, 1e-7), jnp.minimum(cc, -1e-7))
        return 1.0 / c2

    def slab(oc, iv):
        return jnp.maximum((0.0 - oc) * iv, (jnp.float32(v) - oc) * iv)

    t_cap = jnp.float32(4.0 * v + 16.0)
    t_exit = jnp.minimum(
        jnp.minimum(
            slab(origin[0], inv(dx)),
            jnp.minimum(slab(origin[1], inv(dy)), slab(origin[2], inv(dz))),
        ),
        t_cap,
    )
    hit = (carry["hit"] != 0) | (carry["active"] != 0)
    t_stop = jnp.minimum(carry["t"], t_exit)
    water = carry["water"] + jnp.where(
        carry["wenter"] >= 0.0, t_stop - carry["wenter"], 0.0
    )
    norm = jnp.stack(
        [
            -jnp.sign(dx) * ((carry["axmask"] >> 0) & 1).astype(f32),
            -jnp.sign(dy) * ((carry["axmask"] >> 1) & 1).astype(f32),
            -jnp.sign(dz) * ((carry["axmask"] >> 2) & 1).astype(f32),
        ],
        axis=-1,
    )
    voxel = to_pack[jnp.clip(carry["vox"], 0, 255)]

    def untile(x):
        extra = x.shape[2:]
        y = x[:n_tiles].reshape((ty, tx, TILE_H, TILE_W) + extra)
        y = y.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(extra))))
        return y.reshape((height, width) + extra)

    return WavefrontResult(
        hit=untile(hit),
        voxel=untile(voxel),
        norm=untile(norm),
        t=untile(t_stop),
        water_dist=untile(water),
        steps=untile(carry["steps"]),
    )


def trace_wavefront2(
    rg: RenderGrid,
    origin,
    dirs,
    *,
    width,
    height,
    rounds=12,
    steps_per_round=48,
    interpret=None,
):
    """March one frame through a RenderGrid as a single fused program.

    Semantics match ``trace_wavefront`` (rounds*steps_per_round plays the
    role of the reference kernel's 500-step cap, ray_tracer.wgsl:220); the
    whole march is one XLA program, so there is no host round loop and no
    per-step dispatch overhead.
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    return _trace_frame(
        rg.bwin, rg.lwin, rg.brick_dir, rg.bricks, rg.to_pack,
        jnp.asarray(rg.n_liquid, jnp.int32),
        jnp.asarray(origin, jnp.float32), jnp.asarray(dirs),
        width=width, height=height, rounds=rounds,
        steps_per_round=steps_per_round, v=int(rg.size_voxels),
        interpret=bool(interpret),
    )

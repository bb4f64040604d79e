"""Fused wavefront tracer (v2) — HISTORICAL tier.

Superseded by v3 (per-round Pallas service) and v4 (in-kernel DMA
service); kept as the bridge generation between the host-driven v1 and
the fused designs. Selectable via WavefrontRenderer(tracer="v2"); its
tests run under ``pytest -m historical`` only.

Round 1's tracer (ops/wavefront.py) dispatched 4 micro-programs per march
step from a host loop, based on throughput numbers that turned out to be
enqueue-rate fictions: this runtime defers execution until a device->host
read, so ``block_until_ready`` timings measured nothing. Under *forced*
execution the true costs are:

  * per-dispatch overhead            ~0.5-1 ms   (kills dispatch-per-step)
  * XLA row-gather, [T]-sized        ~1-2 ms+    (latency/loop-bound)
  * XLA take_along_axis in a loop    ~600x slow  (real, not an artifact)
  * Pallas lane-local gather         ~VPU speed  (the fast primitive)

Architecture (v3):

  * The whole frame is ONE jitted program: ``lax.scan`` over R rounds.
  * **Global uniform-window planes.** Windows with no descend bricks and
    uniform liquidity (sky, open ocean, unloaded space) are summarized in
    two bit rows of at most 128 u32 words that ride along in VMEM — rays
    cross them in whole-window jumps with NO cache service at all, so the
    open-space part of the frame never stalls. Only windows containing
    geometry need the per-block cache below.
  * Each **round** refreshes small per-*block* caches (a block = 256 tiles
    = 32K rays): up to ``N_WCACHE`` window bit-row pairs and ``N_BCACHE``
    brick content rows, selected from want-lists the previous round's
    kernel emitted, staged with XLA gathers whose outputs are a few
    hundred KB.
  * A Pallas kernel marches the block through **sub-rounds**: at each
    boundary it composes, per tile, a window bit-row and an 8-slot brick
    content row out of the block caches (pure VPU broadcasts, butterfly
    group-mins and lane-local gathers — no cross-row indexing), then runs
    K march steps. A ``while_loop`` exits as soon as no ray can march
    (all done, or stalled on uncached geometry), and fully-inactive
    blocks pass their state through untouched. On exit the kernel emits
    per-tile want-lists (min-id uncached window / up to 8 uncached
    bricks) for the next round's staging.
  * Rays that need uncached geometry stall until a later round serves
    them; min-id-ordered service retires ids monotonically, guaranteeing
    progress. The march math is identical to ops/wavefront.py (same
    brick/voxel DDA, same EPS nudges), which is verified against the SVO
    reference tracer (the executable spec of ray_tracer.wgsl:182-291).

World tables are the same ``RenderGrid`` as v1. Tiles are 16x8 pixels =
one 128-lane row; a frame is ``[T, 128]`` component arrays.
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

_BLK = 256  # tiles per Pallas grid program / cache block (32K rays)
N_WCACHE = 8  # window bit-row pairs cached per block
N_BCACHE = 64  # brick content rows cached per block
_CROWS = N_BCACHE // 8  # content cache rows of 128 words
N_WANTB = 16  # uncached-brick wants emitted per tile
_BIGI = 0x3FFFFFFF  # int sentinel for min-reductions (< 2^30)


def _interpret_default():
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- march kernel


def _march_kernel(
    scal_ref,   # SMEM f32[8]: ox, oy, oz, n_liquid, v, 0, 0, 0
    dx_ref, dy_ref, dz_ref,          # [BLK,128] f32
    gj_ref,     # [1, 1, 128] u32  global window-jumpable bits (word w>>5)
    gl_ref,     # [1, 1, 128] u32  global window-liquid bits
    wid_ref,    # [1, N_WCACHE, 128] i32  cached window ids (replicated lanes)
    bwc_ref,    # [1, N_WCACHE, 128] u32  cached window descend rows
    lwc_ref,    # [1, N_WCACHE, 128] u32  cached window liquid rows
    bid_ref,    # [1, N_BCACHE, 128] i32  cached brick ids (replicated lanes)
    cnt_ref,    # [1, _CROWS, 128] u32    cached brick content (16 words each)
    t_ref, act_ref, hit_ref, lvl_ref, cb_ref, ax_ref, vox_ref,
    wat_ref, wen_ref, stp_ref,
    # outputs
    t_o, act_o, hit_o, lvl_o, cb_o, ax_o, vox_o, wat_o, wen_o, stp_o,
    wwin_o,     # [BLK,1] i32  min uncached non-uniform window wanted
    wbr_o,      # [BLK,N_WANTB] i32  uncached bricks wanted
    *, sub_rounds, sub_steps, nb, bg_side,
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
    blk = dx.shape[0]

    def inv(c):
        c2 = jnp.where(c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7))
        return 1.0 / c2

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    sx = (dx > 0.0).astype(f32)
    sy = (dy > 0.0).astype(f32)
    sz = (dz > 0.0).astype(f32)

    def slab(oc, ivc):
        return jnp.maximum((0.0 - oc) * ivc, (v - oc) * ivc)

    t_cap = 4.0 * v + 16.0
    t_exit = jnp.minimum(
        jnp.minimum(slab(ox, ivx), jnp.minimum(slab(oy, ivy), slab(oz, ivz))),
        t_cap,
    )

    # Block caches as broadcastable [1,128] rows (2D slices throughout —
    # Mosaic dislikes 1D intermediates).
    gj_row = jnp.broadcast_to(gj_ref[0], (blk, 128))
    gl_row = jnp.broadcast_to(gl_ref[0], (blk, 128))
    wid_a = wid_ref[0]
    bwc_a = bwc_ref[0]
    lwc_a = lwc_ref[0]
    bid_a = bid_ref[0]
    cnt_a = cnt_ref[0]
    wids = [wid_a[k:k + 1, :] for k in range(N_WCACHE)]
    bwrows = [bwc_a[k:k + 1, :] for k in range(N_WCACHE)]
    lwrows = [lwc_a[k:k + 1, :] for k in range(N_WCACHE)]
    bids = [bid_a[c:c + 1, :] for c in range(N_BCACHE)]
    cntrows = [cnt_a[r:r + 1, :] for r in range(_CROWS)]

    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)

    def ray_winbits(wflat):
        """Per-ray global jumpable/liquid bits for the ray's window."""
        word_i = jnp.clip(wflat >> 5, 0, 127)
        sh = (wflat & 31).astype(jnp.uint32)
        jw = jnp.take_along_axis(gj_row, word_i, axis=1)
        lw = jnp.take_along_axis(gl_row, word_i, axis=1)
        return ((jw >> sh) & 1) != 0, ((lw >> sh) & 1) != 0

    def cidx_of(cur_brick):
        """Per-ray content-cache index (-1 = brick not cached)."""
        cidx = jnp.full((blk, 128), -1, i32)
        for c in range(N_BCACHE):
            m = (cur_brick == bids[c]) & (bids[c] >= 0)
            cidx = jnp.where(m, i32(c), cidx)
        return cidx

    def dda3(px, py, pz, icell, cell):
        def axis(pc, ivc, sgn):
            # ceil-1 for negative directions: a position exactly ON a
            # boundary must target the next plane strictly below, or
            # dt==0 micro-steps the ray in place forever (see
            # wavefront3.py step() for the full story)
            q = pc * icell
            b = jnp.where(sgn > 0.5, jnp.floor(q) + 1.0, jnp.ceil(q) - 1.0)
            dt = (b * cell - pc) * ivc
            return jnp.where(jnp.abs(ivc) >= 0.99 * _BIG_IV, f32(_BIG), dt)

        dtx = axis(px, ivx, sx)
        dty = axis(py, ivy, sy)
        dtz = axis(pz, ivz, sz)
        dt = jnp.minimum(dtx, jnp.minimum(dty, dtz))
        return dt, dtx <= dt, dty <= dt, dtz <= dt

    def boundary(t, active_i, level, cur_brick):
        """Compose per-tile rows from the block caches (pure VPU selects).

        Min-ordered service (smallest pending id first) retires ids
        monotonically — progress without argmax/rotation chains, using
        only native reductions and lane-local gathers.
        """
        active = active_i != 0
        bigi = jnp.int32(_BIGI)

        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
        by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
        bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
        wflat = (bx >> 4) + (by >> 4) * nb + (bz >> 4) * nb * nb
        g_jump, _ = ray_winbits(wflat)

        # --- tile window: smallest cached non-uniform window among
        # brick-level rays (uniform windows never need a row) ---
        wcached = (wflat == wids[0]) & (wids[0] >= 0)
        for k in range(1, N_WCACHE):
            wcached = wcached | ((wflat == wids[k]) & (wids[k] >= 0))
        wkey = jnp.where(
            active & (level == 0) & ~g_jump & wcached, wflat, bigi
        )
        wmin = jnp.min(wkey, axis=1, keepdims=True)  # [BLK,1]
        twid = jnp.where(wmin < bigi, wmin, -1)

        bw_row = jnp.zeros((blk, 128), jnp.uint32)
        lw_row = jnp.zeros((blk, 128), jnp.uint32)
        for k in range(N_WCACHE):
            eq = (twid == wids[k]) & (wids[k] >= 0)  # [BLK,128]
            bw_row = jnp.where(eq, jnp.broadcast_to(bwrows[k], (blk, 128)),
                               bw_row)
            lw_row = jnp.where(eq, jnp.broadcast_to(lwrows[k], (blk, 128)),
                               lw_row)

        # --- tile slots: the min cached brick of each 16-lane group ---
        # One butterfly min over (brick<<6 | cache_idx) selects the brick
        # and carries its cache index. Brick ids fit 25 bits for any
        # practical window (<= 2^25 bricks = a 2048-voxel world edge).
        cidx = cidx_of(cur_brick)
        vmask = active & (level == 1) & (cidx >= 0)
        comb = jnp.where(vmask, (cur_brick << 6) | cidx, bigi)
        for sh in (1, 2, 4, 8):
            comb = jnp.minimum(
                comb, jnp.take_along_axis(comb, lanes ^ sh, axis=1)
            )
        slot_row = jnp.zeros((blk, 128), jnp.uint32)
        sidx = jnp.full((blk, 128), -1, i32)
        seg = lanes >> 4
        for j in range(8):
            cj = comb[:, j * 16:j * 16 + 1]  # [BLK,1] group j's min
            ok_j = cj < bigi
            bsel = jnp.where(ok_j, cj >> 6, -1)
            csel = jnp.where(ok_j, cj & 63, -1)
            mine = vmask & (cur_brick == bsel) & (sidx < 0)
            sidx = jnp.where(mine, i32(j), sidx)
            idx = (csel & 7) * 16 + (lanes & 15)
            crow = csel >> 3
            seg_val = jnp.zeros((blk, 128), jnp.uint32)
            for r in range(_CROWS):
                seg_val = jnp.where(
                    crow == r,
                    jnp.take_along_axis(
                        jnp.broadcast_to(cntrows[r], (blk, 128)), idx, axis=1
                    ),
                    seg_val,
                )
            slot_row = jnp.where((seg == j) & (csel >= 0), seg_val, slot_row)

        # --- can anything march? ---
        can_b = active & (level == 0) & (g_jump | (wflat == twid))
        can_v = active & (level == 1) & (sidx >= 0)
        go = jnp.any(can_b | can_v).astype(i32)
        return twid, bw_row, lw_row, slot_row, sidx, go

    def step(c, twid, bw_row, lw_row, slot_row):
        (t, active_i, hit_i, level, cur_brick, axmask, vox, water, wenter,
         stp, sidx) = c
        active = active_i != 0
        hit = hit_i != 0
        pre_level = level
        pre_cur_brick = cur_brick

        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
        by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
        bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
        lin = (bx & (BWIN - 1)) + (by & (BWIN - 1)) * BWIN \
            + (bz & (BWIN - 1)) * BWIN * BWIN
        widx = lin >> 5

        vx = jnp.floor(px).astype(i32)
        vy = jnp.floor(py).astype(i32)
        vz = jnp.floor(pz).astype(i32)
        vlin = (vx & (BRICK - 1)) + (vy & (BRICK - 1)) * BRICK \
            + (vz & (BRICK - 1)) * BRICK * BRICK
        vidx = jnp.maximum(sidx, 0) * 16 + (vlin >> 2)

        word = jnp.take_along_axis(bw_row, widx, axis=1)
        lword = jnp.take_along_axis(lw_row, widx, axis=1)
        vword = jnp.take_along_axis(slot_row, vidx, axis=1)

        # --- brick phase (ops/wavefront.py:_post_brick) ---
        active = active & (t < t_exit)
        fb = bx + by * bg_side + bz * bg_side * bg_side
        demote = active & (level == 1) & (fb != cur_brick)
        level = jnp.where(demote, 0, level)
        sidx = jnp.where(demote, -1, sidx)
        bl = active & (level == 0)
        wflat = (bx >> 4) + (by >> 4) * nb + (bz >> 4) * nb * nb
        g_jump, g_liq = ray_winbits(wflat)
        in_tile = wflat == twid
        match_b = bl & (g_jump | in_tile)
        shift = (lin & 31).astype(jnp.uint32)
        descend = ~g_jump & in_tile & (((word >> shift) & 1) != 0)
        liq_bit = ((lword >> shift) & 1).astype(i32)
        brick_liq = jnp.where(g_jump, g_liq.astype(i32), liq_bit) != 0

        to_voxel = match_b & descend
        level = jnp.where(to_voxel, 1, level)
        cur_brick = jnp.where(to_voxel, fb, cur_brick)
        sidx = jnp.where(to_voxel, -1, sidx)  # residency unknown

        bstep = match_b & ~descend
        in_w = wenter >= 0.0
        leave_b = bstep & in_w & ~brick_liq
        water = water + jnp.where(leave_b, t - wenter, 0.0)
        wenter = jnp.where(leave_b, -1.0, wenter)
        wenter = jnp.where(bstep & brick_liq & (wenter < 0.0), t, wenter)

        cell_b = jnp.where(g_jump, f32(BWIN_VOX), f32(BRICK))
        icell_b = jnp.where(g_jump, f32(1.0 / BWIN_VOX), f32(1.0 / BRICK))
        dt_b, cbx, cby, cbz = dda3(px, py, pz, icell_b, cell_b)
        t = jnp.where(bstep, t + dt_b + EPS_T, t)
        axb = cbx.astype(i32) | (cby.astype(i32) << 1) | (cbz.astype(i32) << 2)
        axmask = jnp.where(bstep, axb, axmask)
        stp = stp + match_b.astype(i32)

        # --- voxel phase (ops/wavefront.py:_post_voxel) ---
        px2 = ox + dx * t
        py2 = oy + dy * t
        pz2 = oz + dz * t
        match_v = (
            active & (level == 1) & (sidx >= 0)
            & (pre_level == 1) & (pre_cur_brick == cur_brick)
        )
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
        dt_v, cvx, cvy, cvz = dda3(px2, py2, pz2, f32(1.0), f32(1.0))
        t = jnp.where(vstep, t + dt_v + EPS_T, t)
        axv = cvx.astype(i32) | (cvy.astype(i32) << 1) | (cvz.astype(i32) << 2)
        axmask = jnp.where(vstep, axv, axmask)
        stp = stp + match_v.astype(i32)

        return (t, active.astype(i32), hit.astype(i32), level, cur_brick,
                axmask, vox, water, wenter, stp, sidx)

    def wants(t, active_i, level, cur_brick):
        """Per-tile want-lists for next round's cache staging."""
        active = active_i != 0
        bigi = jnp.int32(_BIGI)
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        bx = jnp.floor(px * (1.0 / BRICK)).astype(i32)
        by = jnp.floor(py * (1.0 / BRICK)).astype(i32)
        bz = jnp.floor(pz * (1.0 / BRICK)).astype(i32)
        wflat = (bx >> 4) + (by >> 4) * nb + (bz >> 4) * nb * nb
        g_jump, _ = ray_winbits(wflat)
        wcached = (wflat == wids[0]) & (wids[0] >= 0)
        for k in range(1, N_WCACHE):
            wcached = wcached | ((wflat == wids[k]) & (wids[k] >= 0))
        wkey = jnp.where(
            active & (level == 0) & ~g_jump & ~wcached, wflat, bigi
        )
        wmin = jnp.min(wkey, axis=1, keepdims=True)
        want_win = jnp.where(wmin < bigi, wmin, -1)

        cidx = cidx_of(cur_brick)
        comb = jnp.where(
            active & (level == 1) & (cidx < 0), cur_brick, bigi
        )
        # butterfly min over 8-lane groups -> 16 wants per tile
        for sh in (1, 2, 4):
            comb = jnp.minimum(
                comb, jnp.take_along_axis(comb, lanes ^ sh, axis=1)
            )
        wb = [comb[:, j * 8:j * 8 + 1] for j in range(N_WANTB)]
        want_br = jnp.concatenate(wb, axis=1)  # [BLK, 16]
        want_br = jnp.where(want_br < bigi, want_br, -1)
        return want_win, want_br

    def sub_round(state):
        sr, _, c, rows = state
        twid, bw_row, lw_row, slot_row = rows

        def sbody(_, cc):
            return step(cc, twid, bw_row, lw_row, slot_row)

        c = jax.lax.fori_loop(0, sub_steps, sbody, c)
        twid, bw_row, lw_row, slot_row, sidx, go = boundary(
            c[0], c[1], c[3], c[4]
        )
        c = c[:10] + (sidx,)
        return sr + 1, go, c, (twid, bw_row, lw_row, slot_row)

    def cond(state):
        sr, go, _, _ = state
        return (sr < sub_rounds) & (go != 0)

    any_active = jnp.any(act_ref[:] != 0)

    @pl.when(jnp.logical_not(any_active))
    def _():
        t_o[:] = t_ref[:]
        act_o[:] = act_ref[:]
        hit_o[:] = hit_ref[:]
        lvl_o[:] = lvl_ref[:]
        cb_o[:] = cb_ref[:]
        ax_o[:] = ax_ref[:]
        vox_o[:] = vox_ref[:]
        wat_o[:] = wat_ref[:]
        wen_o[:] = wen_ref[:]
        stp_o[:] = stp_ref[:]
        wwin_o[:] = jnp.full(wwin_o.shape, -1, i32)
        wbr_o[:] = jnp.full(wbr_o.shape, -1, i32)

    @pl.when(any_active)
    def _():
        twid, bw_row, lw_row, slot_row, sidx, go = boundary(
            t_ref[:], act_ref[:], lvl_ref[:], cb_ref[:]
        )
        init_c = (
            t_ref[:], act_ref[:], hit_ref[:], lvl_ref[:], cb_ref[:],
            ax_ref[:], vox_ref[:], wat_ref[:], wen_ref[:], stp_ref[:],
            sidx,
        )
        _, _, c, _ = jax.lax.while_loop(
            cond, sub_round,
            (jnp.int32(0), go, init_c, (twid, bw_row, lw_row, slot_row)),
        )
        t_o[:] = c[0]
        act_o[:] = c[1]
        hit_o[:] = c[2]
        lvl_o[:] = c[3]
        cb_o[:] = c[4]
        ax_o[:] = c[5]
        vox_o[:] = c[6]
        wat_o[:] = c[7]
        wen_o[:] = c[8]
        stp_o[:] = c[9]
        want_win, want_br = wants(c[0], c[1], c[3], c[4])
        wwin_o[:] = want_win
        wbr_o[:] = want_br


def _march(
    scal, dx, dy, dz, gj, gl, wid, bwc, lwc, bid, cnt,
    t, active, hit, level, cur_brick, axmask, vox, water, wenter, stp,
    *, sub_rounds, sub_steps, nb, bg_side, interpret,
):
    T = t.shape[0]
    blk = _BLK
    f32, i32 = jnp.float32, jnp.int32

    def vspec(w=128):
        return pl.BlockSpec((blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(n):
        return pl.BlockSpec(
            (1, n, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        vspec(), vspec(), vspec(),  # dx dy dz
        cspec(1), cspec(1),  # gj gl
        cspec(N_WCACHE), cspec(N_WCACHE), cspec(N_WCACHE),  # wid bwc lwc
        cspec(N_BCACHE), cspec(_CROWS),  # bid cnt
        vspec(), vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
        vspec(), vspec(), vspec(),
    ]
    out_specs = tuple(
        [vspec()] * 10 + [vspec(1), vspec(N_WANTB)]
    )
    out_shape = tuple(
        [
            jax.ShapeDtypeStruct((T, 128), d)
            for d in (f32, i32, i32, i32, i32, i32, i32, f32, f32, i32)
        ]
        + [
            jax.ShapeDtypeStruct((T, 1), i32),
            jax.ShapeDtypeStruct((T, N_WANTB), i32),
        ]
    )
    kern = partial(
        _march_kernel, sub_rounds=sub_rounds, sub_steps=sub_steps,
        nb=nb, bg_side=bg_side,
    )
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
        scal, dx, dy, dz, gj, gl, wid, bwc, lwc, bid, cnt,
        t, active, hit, level, cur_brick, axmask, vox, water, wenter, stp,
    )


# --------------------------------------------------------------------- frame


def _global_planes(bwin, lwin):
    """Global per-window uniformity bits: (jumpable, all-liquid) u32[1,128].

    A window is jumpable when it has no descend bricks and uniform
    liquidity — exactly ops/wavefront.py:_rows_win's whole-window-jump
    condition, hoisted to a frame-wide table so open space needs no cache.
    """
    nw = bwin.shape[0]
    assert nw <= 4096, "global window plane supports up to 16^3 windows"
    no_descend = jnp.all(bwin == 0, axis=1)
    all_liq = jnp.all(lwin == jnp.uint32(0xFFFFFFFF), axis=1)
    no_liq = jnp.all(lwin == 0, axis=1)
    jumpable = no_descend & (all_liq | no_liq)

    def pack(bits):
        pad = jnp.zeros(4096, bool).at[:nw].set(bits)
        b = pad.reshape(128, 32).astype(jnp.uint32)
        sh = jnp.arange(32, dtype=jnp.uint32)[None, :]
        return jnp.sum(b << sh, axis=1, dtype=jnp.uint32).reshape(1, 128)

    return pack(jumpable), pack(jumpable & all_liq)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret",
    ),
)
def _trace_frame(
    bwin, lwin, brick_dir, bricks, to_pack, n_liquid,
    origin, dirs,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
):
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    n_tiles = tx * ty
    T = -(-n_tiles // _BLK) * _BLK  # pad to whole blocks
    n_blocks = T // _BLK
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

    gj, gl = _global_planes(bwin, lwin)
    gj3 = jnp.broadcast_to(gj[None], (n_blocks, 1, 128))
    gl3 = jnp.broadcast_to(gl[None], (n_blocks, 1, 128))

    inside = (
        (origin[0] > 0.0) & (origin[0] < v)
        & (origin[1] > 0.0) & (origin[1] < v)
        & (origin[2] > 0.0) & (origin[2] < v)
    )
    shape = (T, 128)
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    valid = tile_i < n_tiles

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
        # block caches + want lists
        win_ids=jnp.full((n_blocks, N_WCACHE), -1, i32),
        bwc=jnp.zeros((n_blocks, N_WCACHE, 128), jnp.uint32),
        lwc=jnp.zeros((n_blocks, N_WCACHE, 128), jnp.uint32),
        want_win=jnp.full((T, 1), -1, i32),
        want_br=jnp.full((T, N_WANTB), -1, i32),
    )
    # Pre-seed window slot 0 with the camera's window for every block.
    cam_w = jnp.clip(jnp.floor(origin / BWIN_VOX).astype(i32), 0, nb - 1)
    cam_wid = cam_w[0] + cam_w[1] * nb + cam_w[2] * nb * nb
    carry["win_ids"] = carry["win_ids"].at[:, 0].set(cam_wid)
    carry["bwc"] = carry["bwc"].at[:, 0].set(bwin[cam_wid])
    carry["lwc"] = carry["lwc"].at[:, 0].set(lwin[cam_wid])

    def round_body(c, r):
        rot = r * 29
        # ---- window cache inserts from want lists ----
        wtile = c["want_win"].reshape(n_blocks, _BLK)
        cached = (wtile[:, :, None] == c["win_ids"][:, None, :]).any(axis=2)
        cand = (wtile >= 0) & ~cached
        tl = jax.lax.broadcasted_iota(i32, (n_blocks, _BLK), 1)
        win_ids, bwc, lwc = c["win_ids"], c["bwc"], c["lwc"]
        for j in range(2):
            score = jnp.where(cand, _BLK - ((tl - rot - j) % _BLK), 0)
            ti = jnp.argmax(score, axis=1)
            thas = jnp.any(cand, axis=1)
            wj = jnp.where(
                thas,
                jnp.take_along_axis(wtile, ti[:, None], axis=1)[:, 0],
                -1,
            )
            cand = cand & (wtile != wj[:, None])
            slot = ((2 * r + j) % (N_WCACHE - 1)) + 1
            w_safe = jnp.clip(wj, 0, bwin.shape[0] - 1)
            ins = wj >= 0
            win_ids = win_ids.at[:, slot].set(
                jnp.where(ins, wj, win_ids[:, slot])
            )
            bwc = bwc.at[:, slot].set(
                jnp.where(ins[:, None], bwin[w_safe], bwc[:, slot])
            )
            lwc = lwc.at[:, slot].set(
                jnp.where(ins[:, None], lwin[w_safe], lwc[:, slot])
            )

        # ---- brick content staging from want lists ----
        pool = c["want_br"].reshape(n_blocks, _BLK * N_WANTB)
        pool_lanes = jax.lax.broadcasted_iota(i32, pool.shape, 1)
        remaining = pool >= 0
        picks = []
        for j in range(N_BCACHE):
            score = jnp.where(
                remaining,
                pool.shape[1] - ((pool_lanes - rot - j * 16) % pool.shape[1]),
                0,
            )
            pi = jnp.argmax(score, axis=1)
            phas = jnp.any(remaining, axis=1)
            bidj = jnp.where(
                phas, jnp.take_along_axis(pool, pi[:, None], axis=1)[:, 0], -1
            )
            picks.append(bidj)
            remaining = remaining & (pool != bidj[:, None])
        new_bricks = jnp.stack(picks, axis=1)  # [B, N_BCACHE]

        dir_idx = jnp.clip(new_bricks, 0, brick_dir.shape[0] - 1)
        content_rows = brick_dir[dir_idx]
        have = (new_bricks >= 0) & (content_rows >= 0)
        bid_eff = jnp.where(have, new_bricks, -1)
        cnt = bricks[jnp.clip(content_rows, 0, bricks.shape[0] - 1)]
        cnt = cnt.reshape(n_blocks, _CROWS, 128)

        wid_k = jnp.broadcast_to(
            win_ids[:, :, None], (n_blocks, N_WCACHE, 128)
        )
        bid_k = jnp.broadcast_to(
            bid_eff[:, :, None], (n_blocks, N_BCACHE, 128)
        )

        scal = jnp.concatenate(
            [
                origin,
                jnp.asarray(n_liquid, f32).reshape(1),
                jnp.asarray([v], f32),
                jnp.zeros(3, f32),
            ]
        )
        outs = _march(
            scal, dx, dy, dz, gj3, gl3, wid_k, bwc, lwc, bid_k, cnt,
            c["t"], c["active"], c["hit"], c["level"], c["cur_brick"],
            c["axmask"], c["vox"], c["water"], c["wenter"], c["steps"],
            sub_rounds=sub_rounds, sub_steps=sub_steps, nb=nb,
            bg_side=bg_side, interpret=interpret,
        )
        keys = ("t", "active", "hit", "level", "cur_brick", "axmask", "vox",
                "water", "wenter", "steps", "want_win", "want_br")
        c2 = dict(zip(keys, outs))
        c2["win_ids"] = win_ids
        c2["bwc"] = bwc
        c2["lwc"] = lwc
        return c2, ()

    carry, _ = jax.lax.scan(
        round_body, carry, jnp.arange(rounds, dtype=i32)
    )

    # ---- finish (ops/wavefront.py:_finish) ----
    def inv(cc):
        c2 = jnp.where(cc >= 0, jnp.maximum(cc, 1e-7), jnp.minimum(cc, -1e-7))
        return 1.0 / c2

    def slab(oc, ivc):
        return jnp.maximum((0.0 - oc) * ivc, (jnp.float32(v) - oc) * ivc)

    t_cap = jnp.float32(4.0 * v + 16.0)
    t_exit = jnp.minimum(
        jnp.minimum(
            slab(origin[0], inv(dx)),
            jnp.minimum(slab(origin[1], inv(dy)), slab(origin[2], inv(dz))),
        ),
        t_cap,
    )
    # cap semantics match the reference kernel and v3: budget-exhausted
    # rays render as miss/sky (ray_tracer.wgsl:220)
    hit = carry["hit"] != 0
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

    ``steps_per_round`` is split into 12-step sub-rounds inside the kernel;
    ``rounds * steps_per_round`` plays the role of the reference kernel's
    500-step cap (ray_tracer.wgsl:220).
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    sub_steps = 12
    sub_rounds = max(steps_per_round // sub_steps, 1)
    return _trace_frame(
        rg.bwin, rg.lwin, rg.brick_dir, rg.bricks, rg.to_pack,
        jnp.asarray(rg.n_liquid, jnp.int32),
        jnp.asarray(origin, jnp.float32), jnp.asarray(dirs),
        width=width, height=height, rounds=rounds,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret),
    )

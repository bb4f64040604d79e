"""Subwindow bit-plane tracer (v3) — the TPU fast path, third generation.

v2 (ops/wavefront2.py) fused the whole frame into one program but kept v1's
*brick-content* service unit: 4³ bricks resolved through per-tile content
slots. Convergence was bounded by brick service (64 bricks/block/round vs
thousands wanted), and the kernel paid a 64-compare residency chain plus an
8-slot content composition at every boundary.

v3 changes the world representation so the service unit is 64× coarser and
the kernel carries no residency state at all:

  * ``sw_solid``/``sw_liq``: per-**subwindow** (16³ voxels = 4096 bits =
    exactly one 128-word row) voxel bit planes. One cached row gives a tile
    *every* voxel answer inside that subwindow — no per-brick content.
  * ``sw_meta``: per-subwindow brick-skip bits (4³ bricks -> 64 jumpable +
    64 all-liquid bits = 4 of 8 packed words), so rays still skip empty 4³
    regions inside mixed subwindows.
  * ``wmeta``: per-**window** (64³ voxels) subwindow-skip bits (64 jumpable
    + 64 all-liquid bits). Metas are tiny (8 words), so a single packed
    [1,128] row caches 16 windows per block and every ray reaches ANY
    cached window's bits through one lane-local gather — windows need no
    per-tile composition.
  * global window planes (``gw_jump``/``gw_liq``, ≤4096 windows = one
    [1,128] row each): sky/ocean/unloaded space crosses in whole-window
    jumps with no cache service, as in v2.

A ray needs no level/cur_brick state: each step classifies itself from
position alone — window jumpable (64-voxel DDA step), subwindow jumpable
via cached window meta (16-voxel step), brick jumpable via the composed
subwindow's meta (4-voxel step), else a voxel bit test (hit or 1-voxel
step). Only full subwindow rows are composed per tile (min-id first, 16
compares); rays in other subwindows stall for a later sub-round or round.

Hit voxel ids are resolved *after* the march by one batched XLA gather
through the v1 ``brick_dir``/``bricks`` tables (the march itself never
touches them).

March semantics (DDA exit + EPS nudge, water interval tracking, step cap)
match ops/wavefront.py, the executable spec of the reference kernel
(ray_tracer.wgsl:182-291); agreement is pinned by tests against the SVO
reference tracer.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import (
    BRICK,
    EPS_T,
    TILE_H,
    TILE_W,
    WavefrontResult,
    _BIG,
    _BIG_IV,
    _cdiv,
    render_id_maps,
)
from ..core.constants import CHUNK_SIZE

SW = 16       # subwindow edge, voxels (one 128-word bit row)
WIN = 64      # window edge, voxels (4³ subwindows)
_BLK = 64     # tiles per Pallas grid program (8K rays)
N_WC = 16     # windows cached per block (metas pack into one row)
N_SC = 16     # subwindows cached per block
_W_INS = 2    # window cache inserts per round
_S_INS = 8    # subwindow cache inserts per round
_BIGI = 0x3FFFFFFF


def _interpret_default():
    return jax.default_backend() != "tpu"


class RenderGrid3(NamedTuple):
    """Bit-plane world for the v3 tracer.

    gw_jump/gw_liq: ``uint32[1,128]`` global window bits (word w>>5, bit
      w&31; window id w = wx + wy*Nw + wz*Nw², Nw³ ≤ 4096).
    wmeta: ``uint32[Nw³, 8]`` per-window packed meta — words 0-1: subwindow
      jumpable bits, words 2-3: subwindow all-liquid bits (local subwindow
      s = sx + sy*4 + sz*16), words 4-7 zero.
    sw_meta: ``uint32[Ns³, 8]`` per-subwindow packed meta — words 0-1:
      brick jumpable bits, 2-3: brick all-liquid bits (local brick
      b = bx + by*4 + bz*16); words 4-7: the 16-entry solid-id palette
      (pack ids, one byte per entry).
    sw_solid/sw_liq: ``uint32[Ns³, 128]`` per-voxel bit rows (local voxel
      l = lx + ly*16 + lz*256 -> word l>>5, bit l&31).
    sw_pid: ``uint32[Ns³, 4, 128]`` per-voxel palette-index bit planes
      (4 bits -> 16 palette entries), same voxel/bit layout as sw_solid.
      Hit ids decode in-kernel: 4 lane-local bit gathers + a palette byte
      from the meta row — no post-march XLA gather (which costs ~18 ms
      per 2M elements on this runtime).
    brick_dir/bricks/to_pack/n_liquid: v1 content tables, kept for the
      fallback hit-id gather path (palettes_ok=False) and for shading
      compatibility (see ops/wavefront.py:RenderGrid).
    palettes_ok: static bool — True when every subwindow has ≤16 distinct
      solid ids (always, in practice); False falls back to the XLA gather
      chain for hit ids.
    """

    gw_jump: jax.Array
    gw_liq: jax.Array
    wmeta: jax.Array
    sw_meta: jax.Array
    sw_solid: jax.Array
    sw_liq: jax.Array
    sw_pid: jax.Array
    brick_dir: jax.Array
    bricks: jax.Array
    world_min: jax.Array
    to_pack: jax.Array
    n_liquid: jax.Array
    size_voxels: int
    palettes_ok: bool


# ----------------------------------------------------------------- builders


def _pack_bits_np(bits):
    """[N, 32k] bool -> [N, k] uint32, bit i of word w = column w*32+i."""
    n, m = bits.shape
    b = bits.reshape(n, m // 32, 32).astype(np.uint32)
    return (b << np.arange(32, dtype=np.uint32)).sum(
        axis=-1, dtype=np.uint64
    ).astype(np.uint32)


def build_render_grid3_host(grids, cells, world_min, size_in_chunks,
                            materials):
    """Host (NumPy) RenderGrid3 builder from per-chunk dense render grids.

    Mirrors ops/wavefront.py:build_render_grid_host (same inputs, same
    upload-only discipline); additionally derives the v3 bit planes from a
    dense volume of render ids.
    """
    from .wavefront import build_render_grid_host

    rg1 = build_render_grid_host(grids, cells, world_min, size_in_chunks,
                                 materials)

    grids = np.asarray(grids, np.int32)
    cells = np.asarray(cells, np.int32)
    is_liquid = np.asarray(materials.is_liquid)
    to_render, _, n_liquid = render_id_maps(is_liquid)

    w = size_in_chunks
    v = w * CHUNK_SIZE
    vpad = _cdiv(v, WIN) * WIN
    rgv = to_render[grids].astype(np.uint8)

    vol = np.zeros((vpad, vpad, vpad), np.uint8)
    for b in range(grids.shape[0]):
        c = int(cells[b])
        if c < 0:
            continue
        cx, cy, cz = c % w, (c // w) % w, c // (w * w)
        vol[
            cx * CHUNK_SIZE:(cx + 1) * CHUNK_SIZE,
            cy * CHUNK_SIZE:(cy + 1) * CHUNK_SIZE,
            cz * CHUNK_SIZE:(cz + 1) * CHUNK_SIZE,
        ] = rgv[b]

    solid = vol > n_liquid
    liq = (vol >= 1) & (vol <= n_liquid)
    to_pack_np = np.zeros(256, np.int32)
    tp = np.asarray(rg1.to_pack)
    to_pack_np[: len(tp)] = tp
    planes, palettes_ok = _planes_from_masks_np(
        solid, liq, vpad, vol=vol, to_pack=to_pack_np
    )
    return RenderGrid3(
        *[jnp.asarray(p) for p in planes],
        brick_dir=rg1.brick_dir,
        bricks=rg1.bricks,
        world_min=jnp.asarray(world_min, jnp.int32),
        to_pack=rg1.to_pack,
        n_liquid=rg1.n_liquid,
        size_voxels=v,
        palettes_ok=bool(palettes_ok),
    )


def _planes_from_masks_np(solid, liq, vpad, vol=None, to_pack=None):
    """NumPy: (solid, liq) [V,V,V] bool -> (seven v3 plane arrays, pal_ok).

    ``vol`` ([V,V,V] render ids) and ``to_pack`` drive the per-subwindow
    solid-id palettes; palettes hold *pack* ids so hit decode needs no
    further mapping.
    """
    ns = vpad // SW
    nw = vpad // WIN
    assert nw * nw * nw <= 4096, "global window plane supports ≤16³ windows"

    def sw_rows(m):
        t = m.reshape(ns, SW, ns, SW, ns, SW)       # (X,xl,Y,yl,Z,zl)
        t = t.transpose(4, 2, 0, 5, 3, 1)           # (Z,Y,X, zl,yl,xl)
        return t.reshape(ns * ns * ns, SW * SW * SW)

    sw_solid = _pack_bits_np(sw_rows(solid))
    sw_liq = _pack_bits_np(sw_rows(liq))

    # --- per-subwindow solid-id palettes + 4 palette-index bit planes ---
    n_sw = ns * ns * ns
    vol_rows = sw_rows(vol)                          # [Ns³,4096] render ids
    solid_rows = sw_rows(solid)
    pal_words = np.zeros((n_sw, 4), np.uint32)
    pidx = np.zeros_like(vol_rows, dtype=np.uint8)
    palettes_ok = True
    nonuni = np.flatnonzero(solid_rows.any(axis=1))
    for r in nonuni:
        ids = np.unique(vol_rows[r][solid_rows[r]])
        if len(ids) > 16:
            palettes_ok = False
            break
        lut = np.zeros(256, np.uint8)
        lut[ids] = np.arange(len(ids), dtype=np.uint8)
        pidx[r] = lut[vol_rows[r]]
        pal = np.zeros(16, np.uint32)
        pal[: len(ids)] = to_pack[ids]
        pal_words[r] = (
            pal.reshape(4, 4) << (np.arange(4, dtype=np.uint32) * 8)[None]
        ).sum(axis=1, dtype=np.uint64).astype(np.uint32)
    sw_pid = np.stack(
        [_pack_bits_np(((pidx >> b) & 1) != 0) for b in range(4)], axis=1
    )  # [Ns³, 4, 128]

    # Per-brick (4³ within a subwindow) flags.
    def brick_reduce(m, op):
        t = m.reshape(ns, 4, 4, ns, 4, 4, ns, 4, 4)  # (X,bx,vx,Y,by,vy,Z,bz,vz)
        r = op(t, (2, 5, 8))                         # (X,bx,Y,by,Z,bz)
        r = r.transpose(4, 2, 0, 5, 3, 1)            # (Z,Y,X, bz,by,bx)
        return r.reshape(ns * ns * ns, 64)

    b_any_solid = brick_reduce(solid, np.ndarray.any)
    b_all_liq = brick_reduce(liq, np.ndarray.all)
    b_any_liq = brick_reduce(liq, np.ndarray.any)
    b_jump = ~b_any_solid & (b_all_liq | ~b_any_liq)

    def pack_meta(jump64, liq64):
        n = jump64.shape[0]
        meta = np.zeros((n, 8), np.uint32)
        meta[:, 0:2] = _pack_bits_np(jump64)
        meta[:, 2:4] = _pack_bits_np(liq64)
        return meta

    sw_meta = pack_meta(b_jump, b_all_liq)
    sw_meta[:, 4:8] = pal_words

    # Per-subwindow flags -> window meta.
    s_any_solid = b_any_solid.any(axis=1).reshape(ns, ns, ns, order="F")
    s_all_liq = b_all_liq.all(axis=1).reshape(ns, ns, ns, order="F")
    s_any_liq = b_any_liq.any(axis=1).reshape(ns, ns, ns, order="F")
    # (rows were (Z,Y,X)-ordered; order="F" restores [X,Y,Z] indexing)
    s_jump = ~s_any_solid & (s_all_liq | ~s_any_liq)

    def win_bits(m):                                  # m: [ns,ns,ns] (X,Y,Z)
        t = m.reshape(nw, 4, nw, 4, nw, 4)            # (X,sx,Y,sy,Z,sz)
        t = t.transpose(4, 2, 0, 5, 3, 1)             # (Z,Y,X, sz,sy,sx)
        return t.reshape(nw * nw * nw, 64)

    wmeta = pack_meta(win_bits(s_jump), win_bits(s_all_liq))

    w_any_solid = win_bits(s_any_solid).any(axis=1)
    w_all_liq = win_bits(s_all_liq).all(axis=1)
    w_any_liq = win_bits(s_any_liq).any(axis=1)
    w_jump = ~w_any_solid & (w_all_liq | ~w_any_liq)

    def gplane(bits):
        pad = np.zeros(4096, bool)
        pad[:bits.shape[0]] = bits
        return _pack_bits_np(pad.reshape(1, 4096))  # [1,128]

    planes = (gplane(w_jump), gplane(w_jump & w_all_liq), wmeta, sw_meta,
              sw_solid, sw_liq, sw_pid)
    return planes, palettes_ok


# --------------------------------------------------------------- march kernel


def _march_kernel(
    scal_ref,        # SMEM f32[4]: ox, oy, oz, v
    wids_ref,        # [1, N_WC, 128] i32  cached window ids (lane-replicated)
    sids_ref,        # [1, N_SC, 128] i32  cached subwindow ids
    dx_ref, dy_ref, dz_ref,    # [BLK,128] f32
    gj_ref, gl_ref,            # [1, 1, 128] u32 global window planes
    wm_ref,                    # [1, 1, 128] u32 packed window metas (16×8)
    sm_ref,                    # [1, 1, 128] u32 packed subwindow metas
    ssol_ref, sliq_ref,        # [1, N_SC, 128] u32 subwindow voxel rows
    spid_ref,                  # [1, N_SC*4, 128] u32 palette-idx bit rows
    t_ref, act_ref, hit_ref, ax_ref, vox_ref, wat_ref, wen_ref, stp_ref,
    # outputs
    t_o, act_o, hit_o, ax_o, vox_o, wat_o, wen_o, stp_o,
    ww_o,            # [BLK,1] i32  min uncached window wanted
    ws_o,            # [BLK,4] i32  min uncached subwindows (32-lane groups)
    *, sub_rounds, sub_steps, nw, ns,
):
    f32, i32 = jnp.float32, jnp.int32
    ox = scal_ref[0]
    oy = scal_ref[1]
    oz = scal_ref[2]
    v = scal_ref[3]

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

    gj_row = jnp.broadcast_to(gj_ref[0], (blk, 128))
    gl_row = jnp.broadcast_to(gl_ref[0], (blk, 128))
    wm_row = jnp.broadcast_to(wm_ref[0], (blk, 128))
    sm_row = jnp.broadcast_to(sm_ref[0], (blk, 128))
    ssol = ssol_ref[0]
    sliq = sliq_ref[0]
    spid = spid_ref[0]
    wid_rows = [wids_ref[0][k:k + 1, :] for k in range(N_WC)]
    sid_rows = [sids_ref[0][k:k + 1, :] for k in range(N_SC)]

    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)

    def bit_of(row, word_i, sh):
        wd = jnp.take_along_axis(row, jnp.clip(word_i, 0, 127), axis=1)
        return ((wd >> sh.astype(jnp.uint32)) & 1).astype(i32)

    def classify(t):
        """Everything position-derived: ids, slots, per-level bits."""
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        vx = jnp.floor(px).astype(i32)
        vy = jnp.floor(py).astype(i32)
        vz = jnp.floor(pz).astype(i32)

        w = (vx >> 6) + (vy >> 6) * nw + (vz >> 6) * nw * nw
        g_jump = bit_of(gj_row, w >> 5, w & 31) != 0
        g_liq = bit_of(gl_row, w >> 5, w & 31) != 0

        wslot = jnp.full((blk, 128), -1, i32)
        for k in range(N_WC):
            wid_k = wid_rows[k]
            wslot = jnp.where((w == wid_k) & (wid_k >= 0), i32(k), wslot)

        s_loc = (
            ((vx >> 4) & 3) + ((vy >> 4) & 3) * 4 + ((vz >> 4) & 3) * 16
        )
        mbase = jnp.maximum(wslot, 0) * 8 + (s_loc >> 5)
        sw_jump = bit_of(wm_row, mbase, s_loc & 31) != 0
        sw_liq = bit_of(wm_row, mbase + 2, s_loc & 31) != 0

        s = (vx >> 4) + (vy >> 4) * ns + (vz >> 4) * ns * ns
        sslot = jnp.full((blk, 128), -1, i32)
        for k in range(N_SC):
            sid_k = sid_rows[k]
            sslot = jnp.where((s == sid_k) & (sid_k >= 0), i32(k), sslot)

        return (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
                sw_jump, sw_liq, s, sslot)

    def boundary(t, active_i):
        """Pick each tile's subwindow (min cached id) and compose its rows."""
        active = active_i != 0
        bigi = jnp.int32(_BIGI)
        (_, _, _, _, _, _, _, g_jump, _, wslot, sw_jump, _, s, sslot) = \
            classify(t)
        need = active & ~g_jump & (wslot >= 0) & ~sw_jump
        skey = jnp.where(need & (sslot >= 0), s, bigi)
        smin = jnp.min(skey, axis=1, keepdims=True)      # [BLK,1]
        tsid = jnp.where(smin < bigi, smin, -1)
        tslot = jnp.zeros((blk, 1), i32)
        solid_row = jnp.zeros((blk, 128), jnp.uint32)
        liq_row = jnp.zeros((blk, 128), jnp.uint32)
        pid_rows = [jnp.zeros((blk, 128), jnp.uint32) for _ in range(4)]
        for k in range(N_SC):
            sid_k = sid_rows[k][:, :1]                   # [1,1]
            eq = (tsid == sid_k) & (sid_k >= 0)          # [BLK,1]
            tslot = jnp.where(eq, i32(k), tslot)
            solid_row = jnp.where(
                eq, jnp.broadcast_to(ssol[k:k + 1, :], (blk, 128)), solid_row
            )
            liq_row = jnp.where(
                eq, jnp.broadcast_to(sliq[k:k + 1, :], (blk, 128)), liq_row
            )
            for b in range(4):
                pid_rows[b] = jnp.where(
                    eq,
                    jnp.broadcast_to(
                        spid[k * 4 + b:k * 4 + b + 1, :], (blk, 128)
                    ),
                    pid_rows[b],
                )
        can = active & (
            g_jump
            | ((wslot >= 0) & sw_jump)
            | (need & (s == tsid))
        )
        go = jnp.any(can).astype(i32)
        return tsid, tslot, solid_row, liq_row, tuple(pid_rows), go

    def step(c, tsid, tslot, solid_row, liq_row, pid_rows):
        t, active_i, hit_i, axmask, vox, water, wenter, stp = c
        active = (active_i != 0) & (t < t_exit)
        hit = hit_i != 0

        (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
         sw_jump, sw_liq, s, _) = classify(t)

        at_ts = s == tsid                                 # [BLK,128]
        b_loc = ((vx >> 2) & 3) + ((vy >> 2) & 3) * 4 + ((vz >> 2) & 3) * 16
        bbase = tslot * 8 + (b_loc >> 5)
        br_jump = bit_of(sm_row, bbase, b_loc & 31) != 0
        br_liq = bit_of(sm_row, bbase + 2, b_loc & 31) != 0

        l = (vx & 15) + (vy & 15) * 16 + (vz & 15) * 256
        vsolid = bit_of(solid_row, l >> 5, l & 31) != 0
        vliq = bit_of(liq_row, l >> 5, l & 31) != 0

        case1 = active & g_jump
        case2 = active & ~g_jump & (wslot >= 0) & sw_jump
        case3 = active & ~g_jump & (wslot >= 0) & ~sw_jump & at_ts
        in_br = case3 & br_jump
        in_vox = case3 & ~br_jump
        hit_now = in_vox & vsolid
        march = case1 | case2 | in_br | (in_vox & ~vsolid)

        # hit-id decode: 4 palette-index bits + palette byte from the meta
        # row (all lane-local; the palette lives in sw_meta words 4-7)
        pidx = bit_of(pid_rows[0], l >> 5, l & 31)
        pidx = pidx | (bit_of(pid_rows[1], l >> 5, l & 31) << 1)
        pidx = pidx | (bit_of(pid_rows[2], l >> 5, l & 31) << 2)
        pidx = pidx | (bit_of(pid_rows[3], l >> 5, l & 31) << 3)
        pal_w = jnp.take_along_axis(
            sm_row, jnp.clip(tslot * 8 + 4 + (pidx >> 2), 0, 127), axis=1
        )
        pid = (
            (pal_w >> ((pidx & 3).astype(jnp.uint32) * 8)) & 0xFF
        ).astype(i32)
        vox = jnp.where(hit_now, pid, vox)

        # liquidity of the cell being crossed, at the crossing granularity
        liq_i = jnp.where(
            case1, g_liq.astype(i32),
            jnp.where(
                case2, sw_liq.astype(i32),
                jnp.where(in_br, br_liq.astype(i32), vliq.astype(i32)),
            ),
        )
        liquid = liq_i != 0

        # water interval tracking (ops/wavefront.py semantics)
        in_w = wenter >= 0.0
        consider = march | hit_now
        leave = consider & in_w & ~liquid
        water = water + jnp.where(leave, t - wenter, 0.0)
        wenter = jnp.where(leave, -1.0, wenter)
        wenter = jnp.where(march & liquid & (wenter < 0.0), t, wenter)

        cell = jnp.where(
            case1, f32(WIN),
            jnp.where(case2, f32(SW), jnp.where(in_br, f32(BRICK), f32(1.0))),
        )
        icell = 1.0 / cell

        def axis(pc, ivc, sgn):
            nxt = (jnp.floor(pc * icell) + sgn) * cell
            dt = (nxt - pc) * ivc
            return jnp.where(jnp.abs(ivc) >= 0.99 * _BIG_IV, f32(_BIG), dt)

        dtx = axis(px, ivx, sx)
        dty = axis(py, ivy, sy)
        dtz = axis(pz, ivz, sz)
        dt = jnp.minimum(dtx, jnp.minimum(dty, dtz))
        axm = (
            (dtx <= dt).astype(i32)
            | ((dty <= dt).astype(i32) << 1)
            | ((dtz <= dt).astype(i32) << 2)
        )

        t = jnp.where(march, t + dt + EPS_T, t)
        axmask = jnp.where(march, axm, axmask)
        hit = hit | hit_now
        active = active & ~hit_now
        stp = stp + (march | hit_now).astype(i32)

        return (t, active.astype(i32), hit.astype(i32), axmask, vox, water,
                wenter, stp)

    def wants(t, active_i):
        active = active_i != 0
        bigi = jnp.int32(_BIGI)
        (_, _, _, _, _, _, w, g_jump, _, wslot, sw_jump, _, s, sslot) = \
            classify(t)
        wkey = jnp.where(active & ~g_jump & (wslot < 0), w, bigi)
        wmin = jnp.min(wkey, axis=1, keepdims=True)
        want_w = jnp.where(wmin < bigi, wmin, -1)

        need = active & ~g_jump & (wslot >= 0) & ~sw_jump
        skey = jnp.where(need & (sslot < 0), s, bigi)
        for sh in (1, 2, 4, 8, 16):
            skey = jnp.minimum(
                skey, jnp.take_along_axis(skey, lanes ^ sh, axis=1)
            )
        cols = [skey[:, j * 32:j * 32 + 1] for j in range(4)]
        want_s = jnp.concatenate(cols, axis=1)
        want_s = jnp.where(want_s < bigi, want_s, -1)
        return want_w, want_s

    def sub_round(state):
        sr, _, c, rows = state
        tsid, tslot, solid_row, liq_row, pid_rows = rows

        def sbody(_, cc):
            return step(cc, tsid, tslot, solid_row, liq_row, pid_rows)

        c = jax.lax.fori_loop(0, sub_steps, sbody, c)
        tsid, tslot, solid_row, liq_row, pid_rows, go = boundary(c[0], c[1])
        return sr + 1, go, c, (tsid, tslot, solid_row, liq_row, pid_rows)

    def cond(state):
        sr, go, _, _ = state
        return (sr < sub_rounds) & (go != 0)

    any_active = jnp.any(act_ref[:] != 0)

    @pl.when(jnp.logical_not(any_active))
    def _():
        t_o[:] = t_ref[:]
        act_o[:] = act_ref[:]
        hit_o[:] = hit_ref[:]
        ax_o[:] = ax_ref[:]
        vox_o[:] = vox_ref[:]
        wat_o[:] = wat_ref[:]
        wen_o[:] = wen_ref[:]
        stp_o[:] = stp_ref[:]
        ww_o[:] = jnp.full(ww_o.shape, -1, i32)
        ws_o[:] = jnp.full(ws_o.shape, -1, i32)

    @pl.when(any_active)
    def _():
        tsid, tslot, solid_row, liq_row, pid_rows, go = boundary(
            t_ref[:], act_ref[:]
        )
        init_c = (
            t_ref[:], act_ref[:], hit_ref[:], ax_ref[:], vox_ref[:],
            wat_ref[:], wen_ref[:], stp_ref[:],
        )
        _, _, c, _ = jax.lax.while_loop(
            cond, sub_round,
            (jnp.int32(0), go, init_c,
             (tsid, tslot, solid_row, liq_row, pid_rows)),
        )
        t_o[:] = c[0]
        act_o[:] = c[1]
        hit_o[:] = c[2]
        ax_o[:] = c[3]
        vox_o[:] = c[4]
        wat_o[:] = c[5]
        wen_o[:] = c[6]
        stp_o[:] = c[7]
        want_w, want_s = wants(c[0], c[1])
        ww_o[:] = want_w
        ws_o[:] = want_s


def _march(
    scal, wids, sids, dx, dy, dz, gj, gl, wm, sm, ssol, sliq, spid,
    t, active, hit, axmask, vox, water, wenter, stp,
    *, sub_rounds, sub_steps, nw, ns, interpret,
):
    T = t.shape[0]
    blk = _BLK
    f32, i32 = jnp.float32, jnp.int32

    def vspec(w=128):
        return pl.BlockSpec((blk, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def cspec(n):
        return pl.BlockSpec(
            (1, n, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # scal
        cspec(N_WC),                                                # wids
        cspec(N_SC),                                                # sids
        vspec(), vspec(), vspec(),                                  # dx dy dz
        cspec(1), cspec(1), cspec(1), cspec(1),                     # gj gl wm sm
        cspec(N_SC), cspec(N_SC), cspec(N_SC * 4),            # ssol sliq spid
        vspec(), vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
        vspec(),
    ]
    out_specs = tuple([vspec()] * 8 + [vspec(1), vspec(4)])
    out_shape = tuple(
        [
            jax.ShapeDtypeStruct((T, 128), d)
            for d in (f32, i32, i32, i32, i32, f32, f32, i32)
        ]
        + [
            jax.ShapeDtypeStruct((T, 1), i32),
            jax.ShapeDtypeStruct((T, 4), i32),
        ]
    )
    kern = partial(
        _march_kernel, sub_rounds=sub_rounds, sub_steps=sub_steps,
        nw=nw, ns=ns,
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
        scal, wids, sids, dx, dy, dz, gj, gl, wm, sm, ssol, sliq, spid,
        t, active, hit, axmask, vox, water, wenter, stp,
    )


# --------------------------------------------------------------------- frame


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "resolve_ids",
    ),
)
def _trace_frame(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    brick_dir, bricks, to_pack,
    origin, dirs,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
    resolve_ids="palette",
):
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    n_tiles = tx * ty
    T = -(-n_tiles // _BLK) * _BLK
    nB = T // _BLK
    ns = int(round(sw_solid.shape[0] ** (1 / 3)))
    while ns * ns * ns < sw_solid.shape[0]:
        ns += 1
    nw = ns // 4
    bg_side = nw * 16  # bricks per padded world edge (v1 brick_dir layout)

    origin = jnp.asarray(origin, f32)
    d = dirs.reshape(ty, TILE_H, tx, TILE_W, 3)
    d = d.transpose(0, 2, 1, 3, 4).reshape(n_tiles, 128, 3)
    pad = [(0, T - n_tiles), (0, 0)]
    dx = jnp.pad(d[..., 0], pad)
    dy = jnp.pad(d[..., 1], pad)
    dz = jnp.pad(d[..., 2], pad)

    gj3 = jnp.broadcast_to(gw_jump[None], (nB, 1, 128))
    gl3 = jnp.broadcast_to(gw_liq[None], (nB, 1, 128))

    inside = (
        (origin[0] > 0.0) & (origin[0] < v)
        & (origin[1] > 0.0) & (origin[1] < v)
        & (origin[2] > 0.0) & (origin[2] < v)
    )
    shape = (T, 128)
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    valid = tile_i < n_tiles

    lane16 = jax.lax.broadcasted_iota(i32, (nB, N_WC), 1)
    lane128 = jax.lax.broadcasted_iota(i32, (nB, 128), 1)

    carry = dict(
        t=jnp.full(shape, EPS_T, f32),
        active=(jnp.broadcast_to(inside, shape) & valid).astype(i32),
        hit=jnp.zeros(shape, i32),
        axmask=jnp.zeros(shape, i32),
        vox=jnp.zeros(shape, i32),
        water=jnp.zeros(shape, f32),
        wenter=jnp.full(shape, -1.0, f32),
        steps=jnp.zeros(shape, i32),
        wc_ids=jnp.full((nB, N_WC), -1, i32),
        wc_meta=jnp.zeros((nB, 128), jnp.uint32),
        sc_ids=jnp.full((nB, N_SC), -1, i32),
        sc_meta=jnp.zeros((nB, 128), jnp.uint32),
        sc_solid=jnp.zeros((nB, N_SC, 128), jnp.uint32),
        sc_liq=jnp.zeros((nB, N_SC, 128), jnp.uint32),
        sc_pid=jnp.zeros((nB, N_SC, 4, 128), jnp.uint32),
        want_w=jnp.full((T, 1), -1, i32),
        want_s=jnp.full((T, 4), -1, i32),
    )
    # Pre-seed window slot 0 with the camera's window for every block.
    cam_w = jnp.clip(jnp.floor(origin / WIN).astype(i32), 0, nw - 1)
    cam_wid = cam_w[0] + cam_w[1] * nw + cam_w[2] * nw * nw
    carry["wc_ids"] = carry["wc_ids"].at[:, 0].set(cam_wid)
    m0 = wmeta[cam_wid]  # [8]
    carry["wc_meta"] = jnp.where(
        lane128 < 8,
        jnp.broadcast_to(m0[jnp.clip(lane128, 0, 7)], (nB, 128)),
        carry["wc_meta"],
    )

    def insert_windows(c, r):
        """Serve up to _W_INS distinct uncached window wants per block."""
        bigi = jnp.int32(_BIGI)
        pool = c["want_w"].reshape(nB, _BLK)
        cached = (pool[:, :, None] == c["wc_ids"][:, None, :]).any(axis=2)
        pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
        wc_ids, wc_meta = c["wc_ids"], c["wc_meta"]
        for j in range(_W_INS):
            pick = jnp.min(pool, axis=1)                       # [B]
            ok = pick < bigi
            pool = jnp.where(pool == pick[:, None], bigi, pool)
            slot = (r * _W_INS + j) % (N_WC - 1) + 1           # keep slot 0
            sel = (lane16 == slot) & ok[:, None]
            wc_ids = jnp.where(sel, pick[:, None], wc_ids)
            meta = wmeta[jnp.clip(pick, 0, wmeta.shape[0] - 1)]  # [B,8]
            spread = jnp.take_along_axis(
                meta, jnp.clip(lane128 & 7, 0, 7), axis=1
            )
            msel = (lane128 >> 3) == slot  # slot: traced scalar
            wc_meta = jnp.where(msel & ok[:, None], spread, wc_meta)
        return wc_ids, wc_meta

    def insert_subwindows(c, r):
        """Serve up to _S_INS distinct uncached subwindow wants per block."""
        bigi = jnp.int32(_BIGI)
        pool = c["want_s"].reshape(nB, _BLK * 4)
        cached = (pool[:, :, None] == c["sc_ids"][:, None, :]).any(axis=2)
        pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
        picks = []
        for j in range(_S_INS):
            pick = jnp.min(pool, axis=1)
            picks.append(pick)
            pool = jnp.where(pool == pick[:, None], bigi, pool)
        picks = jnp.stack(picks, axis=1)                       # [B,_S_INS]
        ok = picks < bigi
        safe = jnp.clip(picks, 0, sw_solid.shape[0] - 1)
        new_ids = jnp.where(ok, picks, -1)
        new_sol = jnp.where(ok[..., None], sw_solid[safe],
                            jnp.uint32(0))                     # [B,8,128]
        new_liq = jnp.where(ok[..., None], sw_liq[safe], jnp.uint32(0))
        new_meta = jnp.where(ok[..., None], sw_meta[safe], jnp.uint32(0))
        new_pid = jnp.where(
            ok[..., None, None], sw_pid[safe], jnp.uint32(0)
        )                                                      # [B,8,4,128]

        # rotating half-cache replacement: even rounds -> slots 0..7,
        # odd rounds -> slots 8..15
        lo = (r % 2) == 0

        def half(old, new):
            return jnp.where(
                lo,
                jnp.concatenate([new, old[:, _S_INS:]], axis=1),
                jnp.concatenate([old[:, :_S_INS], new], axis=1),
            )

        sc_ids = half(c["sc_ids"], new_ids)
        sc_solid = half(c["sc_solid"], new_sol)
        sc_liq = half(c["sc_liq"], new_liq)
        sc_pid = half(c["sc_pid"], new_pid)
        meta64 = new_meta.reshape(nB, 64)
        sc_meta = jnp.where(
            lo == (lane128 < 64),
            jnp.take_along_axis(
                meta64, jnp.clip(lane128 & 63, 0, 63), axis=1
            ),
            c["sc_meta"],
        )
        return sc_ids, sc_meta, sc_solid, sc_liq, sc_pid

    scal = jnp.concatenate([origin, jnp.asarray([v], f32)])

    def round_body(c, r):
        wc_ids, wc_meta = insert_windows(c, r)
        sc_ids, sc_meta, sc_solid, sc_liq, sc_pid = insert_subwindows(c, r)

        wid_k = jnp.broadcast_to(wc_ids[:, :, None], (nB, N_WC, 128))
        sid_k = jnp.broadcast_to(sc_ids[:, :, None], (nB, N_SC, 128))
        outs = _march(
            scal, wid_k, sid_k, dx, dy, dz, gj3, gl3,
            wc_meta[:, None, :], sc_meta[:, None, :], sc_solid, sc_liq,
            sc_pid.reshape(nB, N_SC * 4, 128),
            c["t"], c["active"], c["hit"], c["axmask"], c["vox"],
            c["water"], c["wenter"], c["steps"],
            sub_rounds=sub_rounds, sub_steps=sub_steps, nw=nw, ns=ns,
            interpret=interpret,
        )
        keys = ("t", "active", "hit", "axmask", "vox", "water", "wenter",
                "steps", "want_w", "want_s")
        c2 = dict(zip(keys, outs))
        c2.update(wc_ids=wc_ids, wc_meta=wc_meta, sc_ids=sc_ids,
                  sc_meta=sc_meta, sc_solid=sc_solid, sc_liq=sc_liq,
                  sc_pid=sc_pid)
        return c2, ()

    carry, _ = jax.lax.scan(round_body, carry, jnp.arange(rounds, dtype=i32))

    # ---- finish: forced-hit semantics + post-march voxel-id resolution ----
    def invh(cc):
        c2 = jnp.where(cc >= 0, jnp.maximum(cc, 1e-7), jnp.minimum(cc, -1e-7))
        return 1.0 / c2

    def slabh(oc, ivc):
        return jnp.maximum((0.0 - oc) * ivc, (jnp.float32(v) - oc) * ivc)

    t_cap = jnp.float32(4.0 * v + 16.0)
    t_exit = jnp.minimum(
        jnp.minimum(
            slabh(origin[0], invh(dx)),
            jnp.minimum(slabh(origin[1], invh(dy)), slabh(origin[2], invh(dz))),
        ),
        t_cap,
    )
    real_hit = carry["hit"] != 0
    hit = real_hit | (carry["active"] != 0)
    t_stop = jnp.minimum(carry["t"], t_exit)
    water = carry["water"] + jnp.where(
        carry["wenter"] >= 0.0, t_stop - carry["wenter"], 0.0
    )

    if resolve_ids == "palette":
        # hit ids were decoded in-kernel from the palette bit planes and
        # already hold pack ids — no XLA gather (~36 ms/frame at 1080p).
        voxel = jnp.where(real_hit, carry["vox"], 0)
    elif resolve_ids == "gather":
        # fallback: batched gather chain through the v1 content tables
        hx = jnp.floor(origin[0] + dx * carry["t"]).astype(i32)
        hy = jnp.floor(origin[1] + dy * carry["t"]).astype(i32)
        hz = jnp.floor(origin[2] + dz * carry["t"]).astype(i32)
        hxc = jnp.clip(hx, 0, bg_side * BRICK - 1)
        hyc = jnp.clip(hy, 0, bg_side * BRICK - 1)
        hzc = jnp.clip(hz, 0, bg_side * BRICK - 1)
        fb = (hxc >> 2) + (hyc >> 2) * bg_side \
            + (hzc >> 2) * bg_side * bg_side
        row = brick_dir[fb]
        vlin = (hxc & 3) + (hyc & 3) * 4 + (hzc & 3) * 16
        word = bricks[jnp.clip(row, 0, bricks.shape[0] - 1), vlin >> 2]
        rid = (
            (word >> ((vlin & 3).astype(jnp.uint32) * 8)) & 0xFF
        ).astype(i32)
        rid = jnp.where(real_hit & (row >= 0), rid, 0)
        voxel = to_pack[jnp.clip(rid, 0, 255)]
    else:  # "none": hit mask only (ablation/benchmarks)
        voxel = real_hit.astype(i32)

    norm = jnp.stack(
        [
            -jnp.sign(dx) * ((carry["axmask"] >> 0) & 1).astype(f32),
            -jnp.sign(dy) * ((carry["axmask"] >> 1) & 1).astype(f32),
            -jnp.sign(dz) * ((carry["axmask"] >> 2) & 1).astype(f32),
        ],
        axis=-1,
    )

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


def trace_wavefront3(
    rg: RenderGrid3,
    origin,
    dirs,
    *,
    width,
    height,
    rounds=10,
    steps_per_round=48,
    interpret=None,
    resolve_ids=None,
):
    """March one frame through a RenderGrid3 as a single fused program.

    ``rounds * steps_per_round`` plays the role of the reference kernel's
    500-step cap (ray_tracer.wgsl:220); convergence is usually service-bound
    (subwindow rows per round), not step-bound.
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    if resolve_ids is None:
        resolve_ids = "palette" if rg.palettes_ok else "gather"
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    return _trace_frame(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack,
        jnp.asarray(origin, jnp.float32), jnp.asarray(dirs),
        width=width, height=height, rounds=rounds,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), resolve_ids=str(resolve_ids),
    )

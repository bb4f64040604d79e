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
SB_W = 8      # tiles per superblock, x  (SB_W*SB_H == _BLK)
SB_H = 8      # tiles per superblock, y

# Tiles are ordered superblock-major: one Pallas grid program (= one
# superblock = 8×8 tiles) covers a square 128×64-PIXEL patch instead of a
# 1024×8 strip of 64 consecutive row-major tiles. Patch rays share a far
# smaller set of subwindows, so the per-block 16-row cache converges in
# fewer service rounds (frustum coherence is the whole point of tiling).


def _sb_dims(tx, ty):
    """Superblock grid dims + padded tile count for a (tx, ty) tile grid."""
    nsx = -(-tx // SB_W)
    nsy = -(-ty // SB_H)
    return nsx, nsy, nsx * nsy * _BLK
N_WC = 8      # windows cached per block (metas pack into one row)
N_SC = 16     # subwindows cached per block
_W_INS = 2    # window cache inserts per round
_S_INS = 8    # subwindow cache inserts per round
_H_REC = 16   # service-schedule rounds recorded in the frame cache token
_BIGI = 0x3FFFFFFF
_CLS = 1 << 28  # backfill priority-class stride (ids must stay below it)
_FL_BIAS = 0x30000000  # flags-in-f32 bias: keeps the bit pattern a normal f32


def _interpret_default():
    return jax.default_backend() != "tpu"


class RenderGrid3(NamedTuple):
    """Bit-plane world for the v3 tracer.

    gw_jump/gw_liq: ``uint32[1,128]`` global window bits (word w>>5, bit
      w&31; window id w = wx + wy*Nw + wz*Nw²). Worlds past 16 windows
      per axis store 2^gs-window SUPER-CELL bits on a ≤16³ grid instead
      (gs = _gs_for(Nw); a set bit = every covered window jumpable with
      uniform liquidity, crossed in (64<<gs)-voxel jumps).
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


def build_sw_palettes(vol_rows, solid_rows, to_pack):
    """Per-subwindow solid-id palettes + 4 palette-index bit planes.

    Shared by the one-shot host builder and the incremental engine builder
    (world/render_grid.py) so palette policy can't drift between them.
    Returns ``(pal_words u32[N,4], sw_pid u32[N,4,128], palettes_ok)``.

    Overflow policy: a 16³ subwindow with more than 16 distinct solid ids
    keeps its 16 MOST FREQUENT ids and maps the rest to the most frequent
    one — a best-effort color for a few voxels of a pathological region —
    and ``palettes_ok`` goes False so callers can route exact consumers
    through the gather fallback (trace_wavefront3 does automatically when
    real brick tables are present).
    """
    n_sw = vol_rows.shape[0]
    vr = vol_rows.astype(np.int64)
    # per-(row, id) solid counts (render ids are < 256). Non-solid voxels
    # land in each row's id-0 column, which is dropped (id 0 = air is
    # never solid). Native row histogram when available (~60x the
    # vectorized np.bincount, which dominated config4's streaming step);
    # fallback: one flat bincount with int64 keys (np.bincount's int32
    # path is ~28x slower; a boolean-mask fancy-index costs ~0.5 s).
    ids = np.where(solid_rows, vr, 0)
    from ..core import native as _native

    if _native.available():
        cnt = _native.hist256_u8(ids.astype(np.uint8))
    else:
        flat = (
            np.arange(n_sw, dtype=np.int64)[:, None] * 256 + ids
        ).ravel()
        cnt = np.bincount(flat, minlength=n_sw * 256).reshape(n_sw, 256)
    cnt[:, 0] = 0
    present = cnt > 0
    n_ids = present.sum(axis=1)
    over = n_ids > 16
    palettes_ok = not bool(over.any())

    # palette order: ascending id (matches np.unique) for ≤16-id rows;
    # for overflow rows, count-desc with id-asc tiebreak (deterministic)
    ids256 = np.arange(256, dtype=np.int64)[None]
    absent = np.int64(1) << 22
    key_asc = np.where(present, ids256, absent)
    key_cnt = np.where(present, -(cnt.astype(np.int64) << 9) + ids256,
                       absent)
    key = np.where(over[:, None], key_cnt, key_asc)
    pal_ids = np.argsort(key, axis=1, kind="stable")[:, :16]   # [N,16] ids
    k_valid = np.arange(16)[None, :] < np.minimum(n_ids, 16)[:, None]
    pal_ids = np.where(k_valid, pal_ids, 0)

    # per-row LUT id -> palette index; ids outside the palette (overflow)
    # keep 0 = the most-frequent entry (id 0 = air is never solid, so the
    # invalid-slot writes to column 0 can't clobber a real entry)
    lut = np.zeros((n_sw, 256), np.uint8)
    np.put_along_axis(
        lut, pal_ids,
        (np.arange(16, dtype=np.uint8)[None] * k_valid).astype(np.uint8),
        axis=1,
    )
    pidx = np.take_along_axis(lut, vr, axis=1)

    pal = np.where(k_valid, np.asarray(to_pack)[pal_ids], 0).astype(
        np.uint32)
    pal_words = (
        pal.reshape(n_sw, 4, 4)
        << (np.arange(4, dtype=np.uint32) * 8)[None, None]
    ).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    sw_pid = np.stack(
        [_pack_bits_np(((pidx >> b) & 1) != 0) for b in range(4)], axis=1
    )
    return pal_words, sw_pid, palettes_ok


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


def _gs_for(nw):
    """Global-plane super-cell shift for an ``nw``-window world.

    The global plane is one 4096-bit row (16³ granularity). Worlds past
    16 windows (32 chunks) per axis coarsen each bit to a 2^gs-window
    SUPER-CELL: gs is the smallest shift with ceil(nw/2^gs) <= 16. A set
    bit means every covered window is jumpable with uniform liquidity,
    so the kernel jumps (WIN<<gs)-voxel cells through it; a clear bit
    falls back to per-window service (correct, just finer-grained). The
    reference slides its window 10..80 chunks (clientdesktop/src/
    ui.rs:163-168); gs<=2 covers 128 chunks. gs=0 (<=32 chunks) packs
    bit-identically to the pre-super-cell format."""
    gs = 0
    while ((nw + (1 << gs) - 1) >> gs) > 16:
        gs += 1
    assert gs <= 3, "global plane supports <=128³ windows (256 chunks)"
    return gs


def _super_gplanes_np(w_jump, w_all_liq, nw):
    """Reduce per-window flags to the [1,128]-packed super-cell planes.

    ``w_jump``/``w_all_liq``: flat [nw³] bools, index X + Y*nw + Z*nw².
    Returns (gw_jump, gw_liq) u32[1,128]. Pad windows (beyond nw on any
    axis when nw isn't a multiple of 2^gs) never contain geometry and are
    excluded: jump=True, any-liq=False, all-liq=True."""
    gs = _gs_for(nw)
    nwg = (nw + (1 << gs) - 1) >> gs
    gsh = 1 << gs

    def grid(flat, pad):
        t = flat.reshape(nw, nw, nw)                 # (Z, Y, X)
        p = nwg * gsh - nw
        return np.pad(t, ((0, p),) * 3, constant_values=pad)

    def cells(g):
        return g.reshape(nwg, gsh, nwg, gsh, nwg, gsh)

    all_jump = cells(grid(w_jump, True)).all(axis=(1, 3, 5))
    all_liq = cells(grid(w_all_liq, True)).all(axis=(1, 3, 5))
    any_liq = cells(grid(w_all_liq, False)).any(axis=(1, 3, 5))
    sj = all_jump & (all_liq | ~any_liq)             # uniform liquidity
    sl = sj & all_liq & any_liq

    def gplane(bits):
        pad = np.zeros(4096, bool)
        pad[: bits.size] = bits.reshape(-1)          # (Z,Y,X) flat
        return _pack_bits_np(pad.reshape(1, 4096))   # [1,128]

    return gplane(sj), gplane(sl)


def _planes_from_masks_np(solid, liq, vpad, vol=None, to_pack=None):
    """NumPy: (solid, liq) [V,V,V] bool -> (seven v3 plane arrays, pal_ok).

    ``vol`` ([V,V,V] render ids) and ``to_pack`` drive the per-subwindow
    solid-id palettes; palettes hold *pack* ids so hit decode needs no
    further mapping.
    """
    ns = vpad // SW
    nw = vpad // WIN

    def sw_rows(m):
        t = m.reshape(ns, SW, ns, SW, ns, SW)       # (X,xl,Y,yl,Z,zl)
        t = t.transpose(4, 2, 0, 5, 3, 1)           # (Z,Y,X, zl,yl,xl)
        return t.reshape(ns * ns * ns, SW * SW * SW)

    sw_solid = _pack_bits_np(sw_rows(solid))
    sw_liq = _pack_bits_np(sw_rows(liq))

    # --- per-subwindow solid-id palettes + 4 palette-index bit planes ---
    vol_rows = sw_rows(vol)                          # [Ns³,4096] render ids
    solid_rows = sw_rows(solid)
    pal_words, sw_pid, palettes_ok = build_sw_palettes(
        vol_rows, solid_rows, to_pack
    )

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

    gw_jump, gw_liq = _super_gplanes_np(w_jump, w_jump & w_all_liq, nw)
    planes = (gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid)
    return planes, palettes_ok


# --------------------------------------------------------------- march kernel
#
# I/O is stream-collapsed: per grid program the kernel reads one SMEM
# scalar row (origin, world size, camera affine), one packed meta block
# (global planes + window/subwindow metas + cache ids), one cache block
# (subwindow solid/liquid/palette rows) and four ray-state arrays; it
# writes four state arrays and one want row. Ray directions are computed
# in-kernel from the camera affine (dir = a(x,y)·V0 + b(x,y)·V1 − V2,
# the unrolled form of create_ray_from_screen, ray_tracer.wgsl:159-171),
# so no direction arrays ever cross HBM. Fewer streams matter: this
# runtime costs ~1.8 µs per block DMA, so stream count × programs ×
# rounds was a first-order term.

# flags word layout (bit): 0 active, 1 hit, 2-4 axmask, 5-16 steps,
# 17-24 vox (pack id from the subwindow palette)
_FL_ACT = 0
_FL_HIT = 1
_FL_AX = 2
_FL_STP = 5
_FL_VOX = 17
_FL_SGN = 25  # 3 direction-sign bits (dx>0, dy>0, dz>0): lets the XLA
#               finish derive face normals without regenerating ray dirs
_SCAL_N = 27  # length of the _cam_scal row; the shade kernel's extra
#               scalars (sun dir/intensity, sky color, ambient) follow it


def _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0):
    """SMEM scalar row for _ray_dirs + world bounds; scal[21] = band y0."""
    f32 = jnp.float32
    return jnp.concatenate([
        origin,
        jnp.asarray([v], f32),
        jnp.asarray([2.0 / width], f32),
        2.0 / jnp.asarray(full_height, f32).reshape(1),
        jnp.stack([
            inv_proj[0, 0], inv_proj[1, 0],
            -inv_proj[2, 0] + inv_proj[3, 0],
            inv_proj[0, 1], inv_proj[1, 1],
            -inv_proj[2, 1] + inv_proj[3, 1],
        ]),
        inv_view[0, :3], inv_view[1, :3], inv_view[2, :3],
        jnp.asarray(y0, f32).reshape(1),
        # 22 srd | 23 step cap | 24 round-0 init flag | 25 tx | 26 ty
        jnp.zeros(5, f32),
    ])


def _ray_dirs(scal, tg, lane, nsx):
    """Per-ray directions from the camera affine; shared by the Mosaic
    kernel and the XLA finish (identical op order keeps them bit-equal).

    ``tg`` is a superblock-major tile index (see _sb_dims); ``scal[21]``
    is the band's first pixel row (0 for a full frame) — how a device
    renders its horizontal slice when the pixel grid is sharded.
    """
    f32 = jnp.float32
    sb = tg // _BLK
    l = tg - sb * _BLK
    txi = ((sb % nsx) * SB_W + l % SB_W).astype(f32)
    tyi = ((sb // nsx) * SB_H + l // SB_W).astype(f32)
    px = txi * TILE_W + (lane % TILE_W).astype(f32)
    py = tyi * TILE_H + (lane // TILE_W).astype(f32) + scal[21]
    x = px * scal[4] - 1.0   # scal[4] = 2/width
    y = py * scal[5] - 1.0   # scal[5] = 2/height
    ex = x * scal[6] - y * scal[7] + scal[8]
    ey = x * scal[9] - y * scal[10] + scal[11]
    dx = ex * scal[12] + ey * scal[15] - scal[18]
    dy = ex * scal[13] + ey * scal[16] - scal[19]
    dz = ex * scal[14] + ey * scal[17] - scal[20]
    # divide by sqrt (not rsqrt-multiply): bit-identical to
    # generate_rays_raw's d / ||d||, so the same camera yields the same
    # rays here and in the shading path
    n = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx / n, dy / n, dz / n


def _march_kernel(
    *refs,
    sub_rounds, sub_steps, nw, ns, nsx, per_ray, lookahead,
    with_tmap=False,
):
    """The march kernel. Ref order (inputs then outputs):

    scal_ref   SMEM f32[27]: ox,oy,oz,v, 2/w,2/h, cam affine (15), y0,
               srd | cap | init | tx | ty
    mc_ref     [1, 5 + 6*N_SC, 128] u32: meta rows (gj, gl, wmeta-pack,
               smeta-pack, ids) then cache rows (solid | liquid | 4 pid)
    (per_ray only) rays_ref [6, BLK, 128] f32: ox oy oz dx dy dz planes —
      per-ray origins/directions (secondary rays: shadows, bounces);
      otherwise the camera affine in scal generates directions in-register
    (with_tmap only) tmap_ref [BLK, 8] i32: original tile index per row
      (compacted tail grid)
    st_ref     [4, BLK, 128] f32: ts | flags (i32 bit pattern) | wa | we
    st_o       same 4 planes out
    want_o     [BLK,8] i32: lanes 0-3 subwindow wants, 4 window want

    Streams are packed this hard because this runtime charges ~1.8 µs of
    per-program setup per block-DMA: at 254 programs x ~10 rounds, every
    extra stream is ~5 ms/frame. The flags plane rides in the f32 state
    array via bitcast, biased by _FL_BIAS so the pattern is a NORMAL f32
    (raw flag values < 2^25 would be denormals, which this TPU flushes to
    zero somewhere in the copy path - observed as every ray dying).
    """
    refs = list(refs)
    scal_ref = refs.pop(0)
    mc_ref = refs.pop(0)
    rays_ref = refs.pop(0) if per_ray else None
    tmap_ref = refs.pop(0) if with_tmap else None
    (st_ref, st_o, want_o) = refs
    f32, i32 = jnp.float32, jnp.int32
    v = scal_ref[3]
    gs = _gs_for(nw)                      # global-plane super-cell shift
    nwg = (nw + (1 << gs) - 1) >> gs

    ts_ref = st_ref[0]
    fl_ref = (
        jax.lax.bitcast_convert_type(st_ref[1], i32) - _FL_BIAS
    )
    wa_ref = st_ref[2]
    we_ref = st_ref[3]

    blk = ts_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)
    if per_ray:
        ox = rays_ref[0]
        oy = rays_ref[1]
        oz = rays_ref[2]
        dx = rays_ref[3]
        dy = rays_ref[4]
        dz = rays_ref[5]
    else:
        ox = scal_ref[0]
        oy = scal_ref[1]
        oz = scal_ref[2]
        if tmap_ref is not None:
            # compacted tail grid: rows hold arbitrary original tiles;
            # their pixel identity comes from the tile-map input
            tg = jnp.broadcast_to(tmap_ref[:, 0:1], (blk, 128))
        else:
            rows = jax.lax.broadcasted_iota(i32, (blk, 128), 0)
            tg = pl.program_id(0) * blk + rows
        scal_v = [scal_ref[i] for i in range(24)]
        dx, dy, dz = _ray_dirs(scal_v, tg, lanes, nsx)

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

    meta = mc_ref[0]
    gj_row = jnp.broadcast_to(meta[0:1, :], (blk, 128))
    gl_row = jnp.broadcast_to(meta[1:2, :], (blk, 128))
    wm_row = jnp.broadcast_to(meta[2:3, :], (blk, 128))
    sm_row = jnp.broadcast_to(meta[3:4, :], (blk, 128))
    id_row8 = jnp.broadcast_to(meta[4:5, :].astype(i32), (8, 128))

    def id_at(k):
        # Mosaic's gather wants ≥8 sublanes; broadcast, gather the constant
        # lane, keep one row. Cheap: runs once per kernel invocation.
        g = jnp.take_along_axis(id_row8, jnp.full((8, 128), k, i32), axis=1)
        return g[:1, :]

    wid_rows = [id_at(k) for k in range(N_WC)]
    sid_rows = [id_at(N_WC + k) for k in range(N_SC)]

    cache = meta[5:]
    ssol = cache[:N_SC]
    sliq = cache[N_SC:2 * N_SC]
    spid = cache[2 * N_SC:]

    def bit_of(row, word_i, sh):
        wd = jnp.take_along_axis(row, jnp.clip(word_i, 0, 127), axis=1)
        return ((wd >> sh.astype(jnp.uint32)) & 1).astype(i32)

    def classify(t, need_sslot=True):
        """Everything position-derived: ids, slots, per-level bits.

        ``need_sslot=False`` skips the N_SC-way subwindow-slot compare
        chain — the hottest caller (step(), once per marched step) never
        reads it; only boundary()/wants() (once per sub-round) do.
        """
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        vx = jnp.floor(px).astype(i32)
        vy = jnp.floor(py).astype(i32)
        vz = jnp.floor(pz).astype(i32)

        w = (vx >> 6) + (vy >> 6) * nw + (vz >> 6) * nw * nw
        if gs:
            # >16-window worlds: the global plane's bits are 2^gs-window
            # super-cells (see _gs_for) — index it on the coarser grid
            wg = (
                (vx >> (6 + gs)) + (vy >> (6 + gs)) * nwg
                + (vz >> (6 + gs)) * nwg * nwg
            )
        else:
            wg = w
        g_jump = bit_of(gj_row, wg >> 5, wg & 31) != 0
        g_liq = bit_of(gl_row, wg >> 5, wg & 31) != 0

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
        if need_sslot:
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
         sw_jump, sw_liq, s, _) = classify(t, need_sslot=False)

        # The t < t_exit guard has a one-ulp float gap: the EPS_T nudge
        # can put a ray's POSITION outside [0,v)³ while t is still a hair
        # below t_exit. On the low side such a ray classifies to a
        # negative window id and zombies (no case matches — it never
        # steps, never emits a servable want, and keeps its block's round
        # loop alive forever); on the high side vx>>6 aliases INTO the
        # next window row and the ray marches through the wrong geometry.
        # Both die here on the position itself.
        inw = (
            (px >= 0.0) & (py >= 0.0) & (pz >= 0.0)
            & (px < v) & (py < v) & (pz < v)
        )
        # per-step cap check (the reference tests its iteration bound
        # every loop step, ray_tracer.wgsl:220 — a sub-round-boundary
        # check alone overshoots by up to sub_steps-1 steps)
        active = active & inw & (stp < step_cap)

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
        # (hit ids decode once per sub-round, not per step — see sub_round)

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
            case1, f32(WIN << gs),
            jnp.where(case2, f32(SW), jnp.where(in_br, f32(BRICK), f32(1.0))),
        )
        icell = 1.0 / cell

        def axis(pc, ivc, sgn):
            # Next crossing along this axis. Negative direction uses
            # ceil-1, NOT floor: for a position exactly ON a cell
            # boundary (px == 128.0 in f32 happens for real camera rays)
            # floor returns the ray's own plane, dt == 0, and the EPS_T
            # advance moves the position by |d|*EPS_T — below f32 ulp at
            # that magnitude, so the ray micro-steps in place forever,
            # marching the full budget every round and pinning its
            # block's early-exit. ceil-1 is identical off-boundary and
            # targets the next plane strictly below when on it (the
            # reference escapes the same degeneracy with its positional
            # 0.001 nudge, ray_tracer.wgsl:274-283).
            q = pc * icell
            b = jnp.where(sgn > 0.5, jnp.floor(q) + 1.0, jnp.ceil(q) - 1.0)
            dt = (b * cell - pc) * ivc
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
        """Lookahead want-list: walk each stalled ray's FUTURE path.

        The subwindow chain a ray crosses is pure geometry (a DDA over the
        16-voxel grid) given the skip planes — contents only decide where
        it stops. So instead of requesting one subwindow per service round
        (discovery serialization: want -> served next round -> march ->
        next want), walk up to ``lookahead`` cells forward from the stall
        point, optimistically crossing unknown subwindows, and emit the
        first few UNCACHED subwindow ids along the way. Wants are hints —
        serving a subwindow a ray never reaches is harmless — so the
        optimistic walk is always sound. The walk halts at the first
        uncached WINDOW (its subwindow-skip meta is unreadable) and emits
        that window id instead.
        """
        bigi = jnp.int32(_BIGI)
        tw = t
        alive = active_i != 0
        wwid = jnp.full((blk, 128), -1, i32)
        ch = [jnp.full((blk, 128), -1, i32) for _ in range(4)]
        for j in range(lookahead):
            (px, py, pz, _, _, _, w, g_jump, _, wslot,
             sw_jump, _, s, sslot) = classify(tw)
            alive = alive & (tw < t_exit)
            wun = alive & ~g_jump & (wslot < 0)
            wwid = jnp.where((wwid < 0) & wun, w, wwid)
            alive = alive & ~wun
            sun_ = alive & ~g_jump & ~sw_jump & (sslot < 0)
            new = sun_
            for c in ch:
                new = new & (s != c)
            if j == 0:
                # true immediate stall — the only emission allowed into
                # chain slot 0 (it feeds the priority want cols 0-3; a
                # FUTURE id there would starve other rays' real stalls)
                ch[0] = jnp.where(new, s, ch[0])
            else:
                prev = None
                for k in range(1, len(ch)):
                    e = new & (ch[k] < 0)
                    if prev is not None:
                        e = e & ~prev
                        prev = prev | e
                    else:
                        prev = e
                    ch[k] = jnp.where(e, s, ch[k])
            if j + 1 < lookahead:
                cell = jnp.where(g_jump, f32(WIN << gs), f32(SW))
                icell = 1.0 / cell

                def adv(pc, ivc, sgn):
                    # same ceil-1 negative-direction form as step()'s
                    # axis(): on-boundary positions must make progress
                    q = pc * icell
                    b = jnp.where(
                        sgn > 0.5, jnp.floor(q) + 1.0, jnp.ceil(q) - 1.0
                    )
                    dt = (b * cell - pc) * ivc
                    return jnp.where(
                        jnp.abs(ivc) >= 0.99 * _BIG_IV, f32(_BIG), dt
                    )

                dt = jnp.minimum(
                    adv(px, ivx, sx),
                    jnp.minimum(adv(py, ivy, sy), adv(pz, ivz, sz)),
                )
                tw = jnp.where(alive, tw + dt + EPS_T, tw)

        wkey = jnp.where(wwid >= 0, wwid, bigi)
        wmin = jnp.min(wkey, axis=1, keepdims=True)
        want_w = jnp.where(wmin < bigi, wmin, -1)

        # slots 0-3: per-32-lane-group min of each ray's FIRST uncached
        # subwindow (the immediate stalls — same as the non-lookahead form)
        skey = jnp.where(ch[0] >= 0, ch[0], bigi)
        for sh in (1, 2, 4, 8, 16):
            skey = jnp.minimum(
                skey, jnp.take_along_axis(skey, lanes ^ sh, axis=1)
            )
        cols = [skey[:, j * 32:j * 32 + 1] for j in range(4)]
        want_s = jnp.concatenate(cols, axis=1)
        want_s = jnp.where(want_s < bigi, want_s, -1)

        # slots 5-7: whole-tile min of chain elements 2..4 (prefetch)
        if lookahead <= 1:
            deep = [jnp.full((blk, 3), -1, i32)]
        else:
            deep = []
            for c in ch[1:]:
                k = jnp.where(c >= 0, c, bigi)
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    k = jnp.minimum(
                        k, jnp.take_along_axis(k, lanes ^ sh, axis=1)
                    )
                deep.append(jnp.where(k[:, :1] < bigi, k[:, :1], -1))
        return jnp.concatenate([want_s, want_w] + deep, axis=1)

    def decode_hits(c, tslot, pid_rows):
        """Resolve pack ids for rays that hit during this sub-round.

        A hit leaves ``t`` at the solid voxel's entry and its subwindow was
        the tile's composed one, so the composed pid rows/palette still
        apply at sub-round end — decode once here instead of every step.
        """
        t, active_i, hit_i, axmask, vox, water, wenter, stp = c
        undec = (hit_i != 0) & (vox == 0)
        vx = jnp.floor(ox + dx * t).astype(i32)
        vy = jnp.floor(oy + dy * t).astype(i32)
        vz = jnp.floor(oz + dz * t).astype(i32)
        l = (vx & 15) + (vy & 15) * 16 + (vz & 15) * 256
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
        vox = jnp.where(undec, pid, vox)
        return (t, active_i, hit_i, axmask, vox, water, wenter, stp)

    # scal[23] > 0 is the TOTAL step cap (reference: the 500-iteration
    # loop bound, ray_tracer.wgsl:220). A ray that exhausts it without
    # hitting is dead — it renders as a MISS either way (_finish cap
    # semantics) — so killing it here lets the frame's early-exit round
    # loop fire instead of marching zombie rays for every budgeted round.
    cap_f = scal_ref[23]
    step_cap = jnp.where(cap_f > 0.5, cap_f, jnp.float32(1e9)).astype(
        jnp.int32
    )

    def sub_round(state):
        sr, _, c, rows_c = state
        tsid, tslot, solid_row, liq_row, pid_rows = rows_c

        def sbody(_, cc):
            return step(cc, tsid, tslot, solid_row, liq_row, pid_rows)

        c = jax.lax.fori_loop(0, sub_steps, sbody, c)
        c = decode_hits(c, tslot, pid_rows)
        t, a, h, axm, vox, wat, wen, stp = c
        # clamp t to the world-exit distance: a no-op for live rays
        # (active requires t < t_exit), and for dead rays it makes the
        # carried ts the final t_stop directly — the XLA finish no
        # longer recomputes the exit slab per ray
        t = jnp.minimum(t, t_exit)
        c = (t, jnp.where(stp < step_cap, a, 0), h, axm, vox, wat, wen, stp)
        tsid, tslot, solid_row, liq_row, pid_rows, go = boundary(c[0], c[1])
        return sr + 1, go, c, (tsid, tslot, solid_row, liq_row, pid_rows)

    def cond(state):
        sr, go, _, _ = state
        # scal[22] > 0 overrides the static sub_rounds budget: the host
        # round loop RAISES it for tail rounds (few active, step-bound
        # rays) so deep rays finish in far fewer grid sweeps. Idle blocks
        # exit on go==0 regardless, so a big budget costs them nothing.
        srd_f = scal_ref[22]
        srd = jnp.where(
            srd_f > 0.5, srd_f, jnp.float32(sub_rounds)
        ).astype(jnp.int32)
        return (sr < srd) & (go != 0)

    fl_in = fl_ref
    # round-0 in-kernel state init (primary path): the state planes
    # arrive as plain zeros; activity, ts=EPS_T, wa=0, we=-1 are
    # synthesized here from the camera scalars + tile index instead of
    # six full-frame XLA writes in the prep
    if not per_ray:
        init = scal_ref[24] > 0.5
        sbi = tg // _BLK
        li = tg - sbi * _BLK
        txi = (sbi % nsx) * SB_W + li % SB_W
        tyi = (sbi // nsx) * SB_H + li // SB_W
        val_t = (
            (txi.astype(f32) < scal_ref[25])
            & (tyi.astype(f32) < scal_ref[26])
        )
        in_w = (
            (ox > 0.0) & (ox < v)
            & (oy > 0.0) & (oy < v)
            & (oz > 0.0) & (oz < v)
        )
        act_i = (val_t & in_w).astype(i32)
        ts0_in = jnp.where(init, f32(EPS_T), ts_ref)
        wa_in = jnp.where(init, f32(0.0), wa_ref)
        we_in = jnp.where(init, f32(-1.0), we_ref)
        acti_in = jnp.where(init, act_i, (fl_in >> _FL_ACT) & 1)
        zi_ = jnp.zeros_like(fl_in)
        hit_in = jnp.where(init, zi_, (fl_in >> _FL_HIT) & 1)
        ax_in = jnp.where(init, zi_, (fl_in >> _FL_AX) & 7)
        stp_in = jnp.where(init, zi_, (fl_in >> _FL_STP) & 0xFFF)
        vox_in = jnp.where(init, zi_, (fl_in >> _FL_VOX) & 0xFF)
    else:
        ts0_in, wa_in, we_in = ts_ref, wa_ref, we_ref
        acti_in = (fl_in >> _FL_ACT) & 1
        hit_in = (fl_in >> _FL_HIT) & 1
        ax_in = (fl_in >> _FL_AX) & 7
        stp_in = (fl_in >> _FL_STP) & 0xFFF
        vox_in = (fl_in >> _FL_VOX) & 0xFF
    any_active = jnp.any(acti_in != 0)

    @pl.when(jnp.logical_not(any_active))
    def _():
        st_o[:] = st_ref[:]
        want_o[:] = jnp.full(want_o.shape, -1, i32)

    @pl.when(any_active)
    def _():
        act0, hit0, ax0, stp0, vox0 = acti_in, hit_in, ax_in, stp_in, vox_in
        ts_in = ts0_in
        act0 = jnp.where(stp0 < step_cap, act0, 0)
        # Kill rays that are already out of bounds HERE, not only inside
        # step(): a block whose active rays are all stuck has go==0, so
        # the while body (and any kill logic in it) never runs for them.
        px0 = ox + dx * ts_in
        py0 = oy + dy * ts_in
        pz0 = oz + dz * ts_in
        inw0 = (
            (px0 >= 0.0) & (py0 >= 0.0) & (pz0 >= 0.0)
            & (px0 < v) & (py0 < v) & (pz0 < v)
        )
        act0 = jnp.where(inw0 & (ts_in < t_exit), act0, 0)
        tsid, tslot, solid_row, liq_row, pid_rows, go = boundary(
            ts_in, act0
        )
        init_c = (
            ts_in, act0, hit0, ax0, vox0, wa_in, we_in, stp0,
        )
        _, _, c, _ = jax.lax.while_loop(
            cond, sub_round,
            (jnp.int32(0), go, init_c,
             (tsid, tslot, solid_row, liq_row, pid_rows)),
        )
        sgn_bits = (
            sx.astype(i32)
            | (sy.astype(i32) << 1)
            | (sz.astype(i32) << 2)
        )
        fl_out = (
            c[1]
            | (c[2] << _FL_HIT)
            | (c[3] << _FL_AX)
            | (jnp.minimum(c[7], 0xFFF) << _FL_STP)
            | (c[4] << _FL_VOX)
            | (sgn_bits << _FL_SGN)
        )
        st_o[0, :, :] = c[0]
        st_o[1, :, :] = jax.lax.bitcast_convert_type(
            fl_out + _FL_BIAS, f32
        )
        st_o[2, :, :] = c[5]
        st_o[3, :, :] = c[6]
        want_o[:] = wants(c[0], c[1])


def _march(
    scal, metacache, state,
    *, sub_rounds, sub_steps, nw, ns, nsx, interpret, rays=None,
    lookahead=1, tile_map=None,
):
    """state: f32[4, T, 128] (ts | flags-bits | wa | we); metacache:
    u32[nB, 5 + 6*N_SC, 128]; rays: f32[6, T, 128] or None; tile_map:
    i32[T, 8] original tile index per row (compacted grids) or None.
    Returns (state', want[T,8])."""
    T = state.shape[1]
    blk = _BLK
    f32, i32 = jnp.float32, jnp.int32
    per_ray = rays is not None

    def pspec(p):
        return pl.BlockSpec((p, blk, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # scal
        pl.BlockSpec(                                   # meta+cache block
            (1, 5 + 6 * N_SC, 128), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [scal, metacache]
    if per_ray:
        in_specs.append(pspec(6))                       # ray planes
        args.append(rays)
    if tile_map is not None:
        in_specs.append(
            pl.BlockSpec((blk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(tile_map)
    in_specs.append(pspec(4))                           # state planes
    args.append(state)
    out_specs = (
        pspec(4),
        pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((4, T, 128), f32),
        jax.ShapeDtypeStruct((T, 8), i32),
    )
    kern = partial(
        _march_kernel, sub_rounds=sub_rounds, sub_steps=sub_steps,
        nw=nw, ns=ns, nsx=nsx, per_ray=per_ray, lookahead=lookahead,
        with_tmap=tile_map is not None,
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
    )(*args)


# --------------------------------------------------------------------- frame


def _tile_hw(x, tx, ty, T):
    """[H, W(,C)] -> [T, 128(,C)] superblock-major tile layout (16x8 pixels
    per 128-lane row, 8x8 tiles per superblock; edge superblocks pad)."""
    nsx, nsy, T2 = _sb_dims(tx, ty)
    assert T2 == T, (T2, T)
    ne = len(x.shape[2:])
    extra = x.shape[2:]
    y = x.reshape((ty, TILE_H, tx, TILE_W) + extra)
    y = y.transpose((0, 2, 1, 3) + tuple(range(4, 4 + ne)))
    # (ty, tx, TILE_H, TILE_W, *e) -> pad tile grid to the superblock grid
    y = jnp.pad(
        y,
        [(0, nsy * SB_H - ty), (0, nsx * SB_W - tx), (0, 0), (0, 0)]
        + [(0, 0)] * ne,
    )
    y = y.reshape((nsy, SB_H, nsx, SB_W, TILE_H, TILE_W) + extra)
    y = y.transpose((0, 2, 1, 3, 4, 5) + tuple(range(6, 6 + ne)))
    return y.reshape((T, 128) + extra)


def _untile_hw(x, tx, ty, width, height):
    """Inverse of _tile_hw: [T, 128(,C)] -> [height, width(,C)]."""
    nsx, nsy, _ = _sb_dims(tx, ty)
    ne = len(x.shape[2:])
    extra = x.shape[2:]
    y = x.reshape((nsy, nsx, SB_H, SB_W, TILE_H, TILE_W) + extra)
    y = y.transpose((0, 2, 4, 1, 3, 5) + tuple(range(6, 6 + ne)))
    y = y.reshape(
        (nsy * SB_H * TILE_H, nsx * SB_W * TILE_W) + extra
    )
    return y[:height, :width]


def _tile_valid(tx, ty, T):
    """bool[T, 128]: tiles that carry real pixels (edge superblocks pad)."""
    nsx, _, _ = _sb_dims(tx, ty)
    i32 = jnp.int32
    tile_i = jax.lax.broadcasted_iota(i32, (T, 128), 0)
    sb = tile_i // _BLK
    l = tile_i - sb * _BLK
    txi = (sb % nsx) * SB_W + l % SB_W
    tyi = (sb // nsx) * SB_H + l // SB_W
    return (txi < tx) & (tyi < ty)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "sub_rounds", "sub_steps", "v",
        "interpret", "resolve_ids", "per_ray", "raw_out", "full_height",
        "warm", "return_cache", "lookahead", "tail_start",
        "tail_sub_rounds", "compact",
    ),
)
def _trace_frame(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    brick_dir, bricks, to_pack,
    origin, inv_view, inv_proj, origins3, dirs3, active0,
    wc_ids0=None, sc_ids0=None, hist0=None, rounds=16, step_cap=None,
    *, width, height, sub_rounds, sub_steps, v, interpret,
    resolve_ids="palette", per_ray=False, raw_out=False,
    full_height=None, y0=0.0, warm=False, return_cache=False,
    lookahead=1, tail_start=5, tail_sub_rounds=30, compact=True,
):
    # ``rounds`` is a TRACED scalar: the round loop is a while_loop, so the
    # budget can vary per call without recompiling this (expensive) program.
    rounds = jnp.asarray(rounds, jnp.int32)
    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)
    nB = T // _BLK
    # subwindow ids must fit under the backfill class stride (bits 28+
    # carry the service-priority class in insert_subwindows)
    assert sw_solid.shape[0] < _CLS
    ns = int(round(sw_solid.shape[0] ** (1 / 3)))
    while ns * ns * ns < sw_solid.shape[0]:
        ns += 1
    nw = ns // 4
    bg_side = nw * 16  # bricks per padded world edge (v1 brick_dir layout)

    origin = jnp.asarray(origin, f32)
    inv_view = jnp.asarray(inv_view, f32)
    inv_proj = jnp.asarray(inv_proj, f32)
    # camera affine for _ray_dirs: eye0 = (x, -y, -1, 1)·inv_proj, dir =
    # eye0.x·V0 + eye0.y·V1 − V2 (see ops/camera.py:generate_rays_raw)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)

    shape = (T, 128)
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    lane_i = jax.lax.broadcasted_iota(i32, shape, 1)
    valid = _tile_valid(tx, ty, T)
    if per_ray:
        pre_tiled = (
            origins3.ndim == 3 and origins3.shape[0] == T
            and origins3.shape[1] == 128
        )
        if pre_tiled:
            ot = jnp.asarray(origins3, f32)
            dt3 = jnp.asarray(dirs3, f32)
            act0 = jnp.asarray(active0, bool)
        else:
            ot = _tile_hw(jnp.asarray(origins3, f32), tx, ty, T)
            dt3 = _tile_hw(jnp.asarray(dirs3, f32), tx, ty, T)
            act0 = _tile_hw(jnp.asarray(active0, bool), tx, ty, T)
        oxr, oyr, ozr = ot[..., 0], ot[..., 1], ot[..., 2]
        dx, dy, dz = dt3[..., 0], dt3[..., 1], dt3[..., 2]
        rays = jnp.stack([oxr, oyr, ozr, dx, dy, dz])   # [6, T, 128]
        inside = (
            (oxr > 0.0) & (oxr < v)
            & (oyr > 0.0) & (oyr < v)
            & (ozr > 0.0) & (ozr < v)
        )
        inside = inside & act0
        seed_o = ot[0, 0]  # any in-world point works as the cache seed
    else:
        # ray dirs are generated in-register inside the kernel; the XLA
        # side only needs them for the "gather" id-resolve fallback
        dx = dy = dz = None
        rays = None
        inside = (
            (origin[0] > 0.0) & (origin[0] < v)
            & (origin[1] > 0.0) & (origin[1] < v)
            & (origin[2] > 0.0) & (origin[2] < v)
        )
        seed_o = origin

    lane16 = jax.lax.broadcasted_iota(i32, (nB, N_WC), 1)
    lane128 = jax.lax.broadcasted_iota(i32, (nB, 128), 1)

    # Combined service-content table: solid row, liquid row, 4 palette
    # bit-plane rows, then the 8 meta words padded to a lane row —
    # [nsw, 7, 128]. Serving a subwindow is then ONE gather per round
    # instead of four (each gather fusion costs ~0.25 ms of launch
    # overhead at 1080p); built once per frame, loop-invariant.
    sw_cont = jnp.concatenate(
        [
            sw_solid[:, None, :],
            sw_liq[:, None, :],
            sw_pid,
            jnp.pad(sw_meta, ((0, 0), (0, 128 - sw_meta.shape[1])))[
                :, None, :
            ],
        ],
        axis=1,
    )

    if per_ray:
        fl0 = (jnp.broadcast_to(inside, shape) & valid).astype(i32)
        state0 = jnp.stack([
            jnp.full(shape, EPS_T, f32),
            jax.lax.bitcast_convert_type(fl0 + _FL_BIAS, f32),
            jnp.zeros(shape, f32),
            jnp.full(shape, -1.0, f32),
        ])
    else:
        # primary path: plain zeros — the kernel synthesizes activity,
        # ts=EPS_T, wa=0, we=-1 on round 0 from the camera scalars (the
        # all-zero flags pattern reads as inactive/no-hit/0-steps after
        # the _FL_BIAS bitcast, so an untouched block stays harmless)
        state0 = jnp.zeros((4,) + shape, f32)
    carry = dict(
        # ts | flags (i32 bits, always < 2^25 so never NaN) | wa | we
        state=state0,
        wc_ids=jnp.full((nB, N_WC), -1, i32),
        sc_ids=jnp.full((nB, N_SC), -1, i32),
        want=jnp.full((T, 8), -1, i32),
        # this frame's service schedule: ids served per round (the replay
        # source for the NEXT frame's warm start)
        hist=jnp.full((_H_REC, nB, _S_INS), -1, i32),
    )
    # the cache content lives as ONE packed per-block metacache carry —
    # the exact array the kernel consumes (rows: gj, gl, wm, sm, ids,
    # then ssol/sliq/spid) — updated per round with dynamic slices
    # instead of rebuilding ~40 MB of concatenated halves every round
    wc_meta0 = jnp.zeros((nB, 128), jnp.uint32)
    sc_meta0 = jnp.zeros((nB, 128), jnp.uint32)
    sc_solid0 = jnp.zeros((nB, N_SC, 128), jnp.uint32)
    sc_liq0 = jnp.zeros((nB, N_SC, 128), jnp.uint32)
    sc_pid0 = jnp.zeros((nB, N_SC, 4, 128), jnp.uint32)
    if warm and hist0 is not None and getattr(hist0, "ndim", 0) == 3:
        hist_in = jnp.asarray(hist0, i32)
    else:
        hist_in = jnp.full((_H_REC, nB, _S_INS), -1, i32)
    # Pre-seed window slot 0 with the camera's window for every block.
    cam_w = jnp.clip(jnp.floor(seed_o / WIN).astype(i32), 0, nw - 1)
    cam_wid = cam_w[0] + cam_w[1] * nw + cam_w[2] * nw * nw
    carry["wc_ids"] = carry["wc_ids"].at[:, 0].set(cam_wid)
    m0 = wmeta[cam_wid]  # [8]
    wc_meta0 = jnp.where(
        lane128 < 8,
        jnp.broadcast_to(m0[jnp.clip(lane128, 0, 7)], (nB, 128)),
        wc_meta0,
    )
    if warm:
        # Persistent service cache: warm-start from the previous frame's
        # cache IDS but re-gather every row's CONTENT from the current
        # planes — temporal coherence without any staleness (world edits
        # land in the planes and are re-read here every frame). Slot 0
        # stays the camera window, matching the cold seed above.
        wc0 = jnp.asarray(wc_ids0, i32).at[:, 0].set(cam_wid)
        sc0 = jnp.asarray(sc_ids0, i32)
        okw = wc0 >= 0
        wmall = jnp.where(
            okw[..., None],
            wmeta[jnp.clip(wc0, 0, wmeta.shape[0] - 1)],
            jnp.uint32(0),
        )                                            # [nB, N_WC, 8]
        carry["wc_ids"] = jnp.where(okw, wc0, -1)
        wc_meta0 = jnp.pad(
            wmall.reshape(nB, 8 * N_WC),
            ((0, 0), (0, 128 - 8 * N_WC)),
        )
        oks = sc0 >= 0
        safe = jnp.clip(sc0, 0, sw_solid.shape[0] - 1)
        carry["sc_ids"] = jnp.where(oks, sc0, -1)
        conts = jnp.where(
            oks[..., None, None], sw_cont[safe], jnp.uint32(0)
        )                                            # [nB, N_SC, 7, 128]
        sc_meta0 = conts[:, :, 6, : sw_meta.shape[1]].reshape(nB, 128)
        sc_solid0 = conts[:, :, 0]
        sc_liq0 = conts[:, :, 1]
        sc_pid0 = conts[:, :, 2:6]

    carry.update(wc_meta=wc_meta0, sc_meta=sc_meta0, sc_solid=sc_solid0,
                 sc_liq=sc_liq0, sc_pid=sc_pid0)

    def make_round_body(nBx, hist_x, rays_x, tmap_x):
        """Service + march for one grid shape: the full frame grid, or a
        compacted tail grid (nBx blocks, rays/tile-map gathered)."""
        lane16 = jax.lax.broadcasted_iota(i32, (nBx, N_WC), 1)
        lane128 = jax.lax.broadcasted_iota(i32, (nBx, 128), 1)
        gj_bcast = jnp.broadcast_to(gw_jump.reshape(1, 128), (nBx, 128))
        gl_bcast = jnp.broadcast_to(gw_liq.reshape(1, 128), (nBx, 128))

        def insert_windows(c, wc_meta, r):
            """Serve up to _W_INS distinct uncached window wants per block.

            ``wc_meta`` is mc row 2; returns the updated ids and row."""
            bigi = jnp.int32(_BIGI)
            pool = c["want"][:, 4].reshape(nBx, _BLK)
            cached = (pool[:, :, None] == c["wc_ids"][:, None, :]).any(axis=2)
            pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
            wc_ids = c["wc_ids"]
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
            """Serve up to _S_INS distinct uncached subwindow wants per block.

            One pick per block *eighth* (8 consecutive tiles): spatially fair —
            a global min-first order would starve tiles wanting high ids until
            every low id in the block retires.

            Service priority: immediate stalls (want cols 0-3) always come
            first; lookahead prefetch hints (cols 5-7) only fill capacity the
            immediate wants leave unused — a low prefetch id must never starve
            a high immediate id (that livelocks under rotating eviction)."""
            bigi = jnp.int32(_BIGI)
            pool = c["want"][:, :4].reshape(nBx, _BLK * 4)
            cached = (pool[:, :, None] == c["sc_ids"][:, None, :]).any(axis=2)
            pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
            seg = pool.reshape(nBx, _S_INS, (_BLK * 4) // _S_INS)
            picks = jnp.min(seg, axis=2)                           # [B,_S_INS]
            # cross-segment duplicates waste a slot; keep only the first
            dup = picks[:, :, None] == picks[:, None, :]
            first = jnp.argmax(dup, axis=2)                        # [B,_S_INS]
            j_i = jnp.arange(_S_INS, dtype=i32)[None, :]
            picks = jnp.where(first == j_i, picks, bigi)
            # fill unused slots with the combined class-biased backfill
            # chain: leftover immediate wants, then history-replay ids (the
            # ids served at this round in the PREVIOUS frame — temporal
            # coherence: rays want the same rows at the same point of the
            # schedule), then lookahead prefetch hints (want cols 5-7).
            # These used to run three separate monotone min-chains merged
            # with prefix arithmetic (~70 launch-bound ops per round); one
            # chain over a single pool whose keys carry a priority bias in
            # bits 28+ yields the identical service order — every immediate
            # key sorts below every history key, which sorts below every
            # prefetch key, ascending by id within a class.
            taken = (pool[:, :, None] == picks[:, None, :]).any(axis=2)
            pool = jnp.where(taken, bigi, pool)
            hrow = jax.lax.dynamic_slice_in_dim(
                hist_x, jnp.clip(r, 0, _H_REC - 1), 1, axis=0
            )[0]                                                   # [B,_S_INS]
            prepool = c["want"][:, 5:8].reshape(nBx, _BLK * 3)

            def _mask(p, bias):
                cachedx = (
                    p[:, :, None] == c["sc_ids"][:, None, :]
                ).any(axis=2)
                pickedx = (p[:, :, None] == picks[:, None, :]).any(axis=2)
                return jnp.where(
                    (p >= 0) & ~cachedx & ~pickedx, p + bias, bigi
                )

            cpool = jnp.concatenate(
                [pool, _mask(hrow, _CLS), _mask(prepool, 2 * _CLS)], axis=1
            )
            idm = _CLS - 1
            fill_seq = []
            for _ in range(_S_INS):
                g = jnp.min(cpool, axis=1)
                fill_seq.append(jnp.where(g < bigi, g & idm, bigi))
                # clear every copy of the picked id across all classes
                cpool = jnp.where(
                    (cpool & idm) == (g[:, None] & idm), bigi, cpool
                )
            fill_seq = jnp.stack(fill_seq, axis=1)                 # [B,_S_INS]
            need_fill = picks >= bigi
            order = jnp.cumsum(need_fill.astype(i32), axis=1) - 1  # fill index
            fill_v = jnp.take_along_axis(
                fill_seq, jnp.clip(order, 0, _S_INS - 1), axis=1
            )
            picks = jnp.where(need_fill, fill_v, picks)
            ok = picks < bigi
            safe = jnp.clip(picks, 0, sw_solid.shape[0] - 1)
            new_ids = jnp.where(ok, picks, -1)
            cont = sw_cont[safe]                                # [B,8,7,128]
            new_sol = cont[:, :, 0]                             # [B,8,128]
            new_liq = cont[:, :, 1]
            new_pid = cont[:, :, 2:6]                           # [B,8,4,128]
            new_meta = cont[:, :, 6, : sw_meta.shape[1]]        # [B,8,8]

            # rotating half-cache replacement: even rounds -> slots 0..7,
            # odd rounds -> slots 8..15. A slot whose pick is invalid KEEPS
            # its old row (clearing it silently evicted still-wanted rows in
            # low-traffic tail rounds) — elementwise merges only, no gathers.
            # (A dynamic-slice in-place variant on the packed metacache
            # carry measured ~3 ms/frame WORSE: XLA copies the carry.)
            lo = (r % 2) == 0

            def half(old, new, okx):
                lo_m = jnp.where(okx, new, old[:, :_S_INS])
                hi_m = jnp.where(okx, new, old[:, _S_INS:])
                return jnp.where(
                    lo,
                    jnp.concatenate([lo_m, old[:, _S_INS:]], axis=1),
                    jnp.concatenate([old[:, :_S_INS], hi_m], axis=1),
                )

            okc = ok[..., None]
            sc_ids = half(c["sc_ids"], new_ids, ok)
            sc_solid = half(c["sc_solid"], new_sol, okc)
            sc_liq = half(c["sc_liq"], new_liq, okc)
            sc_pid = half(c["sc_pid"], new_pid, ok[..., None, None])
            meta64 = new_meta.reshape(nBx, _S_INS * 8)
            spread = jnp.take_along_axis(
                meta64, jnp.clip(lane128 & (_S_INS * 8 - 1), 0,
                                 _S_INS * 8 - 1), axis=1
            )
            ok_ln = jnp.take_along_axis(
                ok.astype(i32),
                jnp.clip((lane128 >> 3) & (_S_INS - 1), 0, _S_INS - 1),
                axis=1,
            ) != 0
            sc_meta = jnp.where(
                (lo == (lane128 < _S_INS * 8)) & ok_ln, spread, c["sc_meta"]
            )
            return sc_ids, sc_meta, sc_solid, sc_liq, sc_pid, new_ids

        def round_body(c, r):
            wc_ids, wc_meta = insert_windows(c, c["wc_meta"], r)
            (sc_ids, sc_meta, sc_solid, sc_liq, sc_pid,
             served) = insert_subwindows(c, r)
            hist = jax.lax.dynamic_update_slice_in_dim(
                c["hist"], served[None], jnp.clip(r, 0, _H_REC - 1), axis=0
            )

            ids_u = jnp.concatenate(
                [wc_ids, sc_ids, jnp.full((nBx, 128 - N_WC - N_SC), -1, i32)],
                axis=1,
            ).astype(jnp.uint32)
            mc = jnp.concatenate(
                [
                    jnp.stack(
                        [gj_bcast, gl_bcast, wc_meta, sc_meta, ids_u], axis=1
                    ),                                         # [B,5,128]
                    sc_solid, sc_liq, sc_pid.reshape(nBx, N_SC * 4, 128),
                ],
                axis=1,
            )                                                  # [B,101,128]
            # adaptive step budget: bulk rounds use sub_rounds; once the bulk
            # has converged (tail_start) the survivors are deep step-bound
            # rays — give them a much larger budget per sweep so they finish
            # in 2-3 rounds instead of 10 (each idle sweep costs ~2.5 ms at
            # 1080p in grid-program launch overhead alone)
            srd = jnp.where(
                r < tail_start,
                jnp.float32(sub_rounds),
                jnp.float32(max(tail_sub_rounds, sub_rounds)),
            )
            # Total step budget: an explicit step_cap (the reference's
            # 500-iteration bound, decoupled from the service-round budget so
            # converged frames exit early), else the nominal rounds x
            # steps-per-round cap. The kernel kills rays at the cap so the
            # early-exit loop can fire even for step-bound deep rays.
            if step_cap is None:
                cap = jnp.minimum(
                    jnp.asarray(rounds, jnp.float32)
                    * (sub_rounds * sub_steps),
                    4000.0,
                )
            else:
                cap = jnp.minimum(jnp.asarray(step_cap, jnp.float32), 4000.0)
            scal_r = scal.at[22].set(srd).at[23].set(cap)
            if rays_x is None:
                # primary path: the kernel initializes ray state itself on
                # round 0 (the state planes arrive as plain zeros)
                scal_r = (
                    scal_r.at[24].set(jnp.where(r == 0, 1.0, 0.0))
                    .at[25].set(jnp.float32(tx))
                    .at[26].set(jnp.float32(ty))
                )
            state, want = _march(
                scal_r, mc, c["state"],
                sub_rounds=sub_rounds, sub_steps=sub_steps, nw=nw, ns=ns,
                nsx=nsx, interpret=interpret, rays=rays_x, lookahead=lookahead,
                tile_map=tmap_x,
            )
            return dict(state=state, want=want, hist=hist,
                        wc_ids=wc_ids, wc_meta=wc_meta, sc_ids=sc_ids,
                        sc_meta=sc_meta, sc_solid=sc_solid, sc_liq=sc_liq,
                        sc_pid=sc_pid), ()

        return round_body

    round_body = make_round_body(nB, hist_in, rays, None)

    # Tail-compaction cascade: each time the survivor count fits the next
    # smaller grid, gather the surviving tiles into it and continue there.
    # Compacted rounds launch proportionally fewer Pallas programs (an idle
    # program still costs ~6 µs of launch+DMA) and march lane-dense blocks.
    # The gathers/scatters run OUTSIDE the while_loops — at top level they
    # move at HBM speed; the same gather inside a loop body lowers to the
    # ~126 M lookups/s scoped-staging emulation (docs/TPU_NOTES.md).
    # ``compact`` is True (one quarter-size level), False (no compaction),
    # or a tuple of grid divisors, e.g. (2, 8): compact to T/2, then T/8.
    divisors = (4,) if compact is True else (tuple(compact) if compact else ())
    sizes = []
    for d in divisors:
        Tk = max(_BLK, -(-(T // int(d)) // _BLK) * _BLK)
        if Tk < (sizes[-1] if sizes else T):
            sizes.append(Tk)

    def _act_tiles(c):
        fl_c = jax.lax.bitcast_convert_type(c["state"][1], i32) - _FL_BIAS
        return jnp.any((fl_c & 1) != 0, axis=1)            # [T_cur]

    def run_level(body_fn, cy, r0, orig_ids, level):
        """Early-exit round loop for one grid, then hand off to the next
        cascade level (if any) once the survivors fit it. A frame stops
        paying for service rounds the moment every ray has hit or left the
        world, so the round budget can be generous. ``orig_ids`` maps this
        grid's rows to original frame tiles (None = identity/full grid)."""
        nxt = sizes[level] if level < len(sizes) else None
        # compacted grids re-request rows their seeded caches lost at the
        # hand-off, so they get a doubled service-round budget — their
        # rounds cost a fraction of a full-grid round, and the per-ray
        # step_cap (the reference's semantic bound) is unchanged
        r_cap = rounds if level == 0 else 2 * rounds

        def cond(state):
            r, c = state
            act_t = _act_tiles(c)
            more = (
                jnp.any(act_t) if nxt is None
                else jnp.sum(act_t.astype(i32)) > nxt
            )
            if level == 0:
                # round 0 must always run: on the primary path the ray
                # state is initialized inside the kernel, so the carried
                # flags are still all-zero when this is first evaluated
                more = (r == 0) | more
            return (r < r_cap) & more

        def body(state):
            r, c = state
            c2, _ = body_fn(c, r)
            return r + 1, c2

        rX, cy = jax.lax.while_loop(cond, body, (r0, cy))
        if nxt is None:
            return cy

        Tn = nxt
        nBn = Tn // _BLK
        act_t = _act_tiles(cy)
        # stable partition: active tiles first, original order preserved
        perm = jnp.argsort(jnp.logical_not(act_t), stable=True)
        selt = perm[:Tn]                                   # [Tn] distinct
        src_b = selt.reshape(nBn, _BLK)[:, 0] // _BLK      # seed block

        def _run(cy):
            orig_n = selt if orig_ids is None else orig_ids[selt]
            hist_b = cy["hist"][:, src_b]
            rays_b = rays[:, orig_n, :] if per_ray else None
            tmap_b = jnp.broadcast_to(
                orig_n[:, None], (Tn, 8)
            ).astype(i32)
            c_b = dict(
                state=cy["state"][:, selt, :],
                want=cy["want"][selt],
                hist=hist_b,
                wc_ids=cy["wc_ids"][src_b],
                wc_meta=cy["wc_meta"][src_b],
                sc_ids=cy["sc_ids"][src_b],
                sc_meta=cy["sc_meta"][src_b],
                sc_solid=cy["sc_solid"][src_b],
                sc_liq=cy["sc_liq"][src_b],
                sc_pid=cy["sc_pid"][src_b],
            )
            body_b = make_round_body(nBn, hist_b, rays_b, tmap_b)
            c_b = run_level(body_b, c_b, rX, orig_n, level + 1)
            out = dict(cy)
            out["state"] = cy["state"].at[:, selt, :].set(c_b["state"])
            # learned cache ids/schedule flow back to the seed blocks so
            # the next frame's warm token sees the compacted service too
            out["wc_ids"] = cy["wc_ids"].at[src_b].set(c_b["wc_ids"])
            out["sc_ids"] = cy["sc_ids"].at[src_b].set(c_b["sc_ids"])
            out["hist"] = cy["hist"].at[:, src_b].set(c_b["hist"])
            return out

        return jax.lax.cond(jnp.any(act_t), _run, lambda cy: cy, cy)

    carry = run_level(round_body, carry, jnp.int32(0), None, 0)

    st = carry["state"]
    carry_ts, carry_wa, carry_we = st[0], st[2], st[3]
    fl = jax.lax.bitcast_convert_type(st[1], i32) - _FL_BIAS
    cache_out = (carry["wc_ids"], carry["sc_ids"], carry["hist"])
    if raw_out:
        # tiled raw state for fused pipelines (shadow pass, shade kernel)
        if return_cache:
            return carry_ts, fl, carry_wa, carry_we, cache_out
        return carry_ts, fl, carry_wa, carry_we

    # ---- finish: forced-hit semantics; ids already decoded in-kernel ----
    real_hit = ((fl >> _FL_HIT) & 1) != 0
    axmask = (fl >> _FL_AX) & 7
    steps = (fl >> _FL_STP) & 0xFFF
    voxk = (fl >> _FL_VOX) & 0xFF
    sgnb = (fl >> _FL_SGN) & 7

    # Cap semantics match the reference kernel: a ray that exhausts its
    # step/service budget without hitting renders as a MISS (sky), exactly
    # like falling out of the 500-iteration loop (ray_tracer.wgsl:220).
    # The kernel clamps the carried ts to the world-exit distance at
    # death, so it IS the stop distance — no per-ray slab recompute here.
    hit = real_hit
    t_stop = carry_ts
    water = carry_wa + jnp.where(
        carry_we >= 0.0, t_stop - carry_we, 0.0
    )

    if resolve_ids == "palette":
        # hit ids were decoded in-kernel from the palette bit planes and
        # already hold pack ids — no XLA gather (~36 ms/frame at 1080p).
        voxel = jnp.where(real_hit, voxk, 0)
    elif resolve_ids == "gather":
        # fallback: batched gather chain through the v1 content tables
        if per_ray:
            o0, o1, o2 = rays[0], rays[1], rays[2]
        else:
            o0, o1, o2 = origin[0], origin[1], origin[2]
            dx, dy, dz = _ray_dirs(
                [scal[i] for i in range(24)], tile_i, lane_i, nsx
            )
        hx = jnp.floor(o0 + dx * carry_ts).astype(i32)
        hy = jnp.floor(o1 + dy * carry_ts).astype(i32)
        hz = jnp.floor(o2 + dz * carry_ts).astype(i32)
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

    # One batched untile over 8 f32 planes instead of 6 separate
    # transpose chains (norm stays component-form until the very end —
    # a [T,128,3] intermediate pads its minor dim to 128 lanes). All
    # packed values (hit/voxel/steps <= 4095) are exact in f32.
    def nrm(b):
        # -sign(d)*crossed_bit, sign reconstructed from the packed
        # direction-sign bit (d == 0 axes are divisor-guarded in the
        # kernel and never the crossing axis of a live hit)
        s = 2.0 * ((sgnb >> b) & 1).astype(f32) - 1.0
        return -s * ((axmask >> b) & 1).astype(f32)

    planes = jnp.stack(
        [
            hit.astype(f32),
            voxel.astype(f32),
            nrm(0),
            nrm(1),
            nrm(2),
            t_stop,
            water,
            steps.astype(f32),
        ]
    )                                                      # [8, T, 128]
    out = jax.vmap(lambda x: _untile_hw(x, tx, ty, width, height))(planes)
    res = WavefrontResult(
        hit=out[0] != 0.0,
        voxel=out[1].astype(i32),
        norm=jnp.stack([out[2], out[3], out[4]], axis=-1),
        t=out[5],
        water_dist=out[6],
        steps=out[7].astype(i32),
    )
    if return_cache:
        return res, cache_out
    return res


def trace_wavefront3(
    rg: RenderGrid3,
    origin,
    dirs=None,
    *,
    cam=None,
    width=None,
    height=None,
    rounds=16,
    steps_per_round=48,
    interpret=None,
    resolve_ids=None,
    cache=None,
    return_cache=False,
    lookahead=1,
    step_cap=None,
    compact=True,
):
    """March one frame through a RenderGrid3 as a single fused program.

    Rays come from ``cam`` (a :class:`~.camera.CamData`; preferred — the
    kernel generates directions in-register, no direction arrays cross
    HBM) — the legacy ``dirs`` argument is accepted and ignored apart from
    a shape check, since directions are always re-derived from ``cam``.
    ``origin`` must already be world-local (camera pos − world min), as
    produced by :func:`~.camera.generate_rays`.

    ``rounds * steps_per_round`` plays the role of the reference kernel's
    500-step cap (ray_tracer.wgsl:220). Pass ``step_cap`` (e.g. 500) to
    set the per-ray step budget independently of the service-round
    budget: step-bound rays then die at the cap while service-stalled
    rays keep being fed, and a converged frame's remaining rounds cost
    nothing (the round loop exits the moment no ray is active).

    ``cache``: an opaque service-cache token from a previous frame's
    ``return_cache=True`` call — warm-starts each block's cached window /
    subwindow IDS (contents are always re-gathered from the current
    planes, so world edits are honored). Temporally coherent frames then
    converge in a few rounds instead of re-serving geometry from scratch.
    """
    assert cam is not None, "trace_wavefront3 needs cam=CamData"
    if width is None or height is None:
        width, height = cam.proj_size
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    if resolve_ids is None:
        resolve_ids = "palette" if rg.palettes_ok else "gather"
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    z = jnp.zeros((), jnp.float32)
    wc0, sc0, h0, warm = _cache_args(cache, width, height)
    return _trace_frame(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        z, z, z, wc0, sc0, h0, rounds, step_cap,
        width=width, height=height,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), resolve_ids=str(resolve_ids),
        per_ray=False, warm=warm, return_cache=bool(return_cache),
        lookahead=int(lookahead),
        compact=compact if isinstance(compact, bool) else tuple(compact),
    )


def _cache_args(cache, width, height):
    """(wc_ids0, sc_ids0, hist0, warm) from an opaque frame-cache token.

    Accepts the legacy 2-tuple (ids only, no schedule) as well as the
    3-tuple with the recorded service schedule."""
    del width, height
    if cache is not None:
        if len(cache) == 2:
            wc0, sc0 = cache
            h0 = jnp.zeros((), jnp.int32)
        else:
            wc0, sc0, h0 = cache
        return wc0, sc0, h0, True
    # scalar dummies: ignored under warm=False (a static branch)
    z = jnp.zeros((), jnp.int32)
    return z, z, z, False


def empty_frame_cache(width, height):
    """An all-empty service-cache token for a width x height frame.

    Passing this as ``cache=`` reproduces cold-start semantics through the
    warm code path — useful to keep a frame loop on ONE compiled program
    (frame 0 empty, then chain each frame's returned token).
    """
    tx = width // TILE_W
    ty = height // TILE_H
    _, _, T = _sb_dims(tx, ty)
    nB = T // _BLK
    return (
        jnp.full((nB, N_WC), -1, jnp.int32),
        jnp.full((nB, N_SC), -1, jnp.int32),
        jnp.full((_H_REC, nB, _S_INS), -1, jnp.int32),
    )


def trace_wavefront3_rays(
    rg: RenderGrid3,
    origins,
    dirs,
    active,
    *,
    width,
    height,
    rounds=16,
    steps_per_round=48,
    interpret=None,
    resolve_ids=None,
    cache=None,
    return_cache=False,
    compact=True,
):
    """March arbitrary per-ray (origin, direction) bundles — the secondary
    -ray path for hard shadows and path-trace bounces.

    ``origins``/``dirs``: ``f32[H, W, 3]`` world-local; ``active``:
    ``bool[H, W]`` — rays to march (e.g. the primary pass's hits). Returns
    the same :class:`WavefrontResult` as the primary tracer; inactive rays
    report miss. Enables BASELINE configs 2/3/5 on the fast path
    (path_tracer.wgsl:149-194 is the reference's latent equivalent).
    """
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    if resolve_ids is None:
        resolve_ids = "palette" if rg.palettes_ok else "gather"
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    eye = jnp.eye(4, dtype=jnp.float32)
    wc0, sc0, h0, warm = _cache_args(cache, width, height)
    return _trace_frame(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack,
        jnp.zeros(3, jnp.float32), eye, eye,
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32),
        jnp.asarray(active, bool), wc0, sc0, h0,
        width=width, height=height, rounds=rounds,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), resolve_ids=str(resolve_ids),
        per_ray=True, warm=warm, return_cache=bool(return_cache),
        compact=compact if isinstance(compact, bool) else tuple(compact),
    )


# --------------------------------------------------------------- shade kernel
#
# Shading runs tiled and in-kernel: face tints, sky gradient + sun disc,
# water overlay and the hard-shadow multiply are all [BLK,128] component
# math (shade_hits does the same in [H,W,3] layout, which pads the
# 3-channel minor dim to 128 lanes — ~42x the traffic — and resolves
# material colors with a 2M-element XLA gather). Output is one packed
# RGBA8 word per ray, the same rgba8unorm quantization the reference's
# result texture stores (clientdesktop/src/graphics/mod.rs:158-168).

def _shade_kernel(
    scal_ref,        # SMEM f32[40]: cam scal[24] + shade params (below)
    lut_ref,         # [1, 6, 128] f32: color LUT rows r0 r1 g0 g1 b0 b1
    ts_ref, fl_ref, wa_ref, we_ref, sh_ref,
    out_ref,         # [BLK,128] u32 packed RGBA8
    *, nsx, show_steps, shadows, max_steps,
):
    # scal[24..]: 24-26 sun_dir, 27 sun_intensity, 28-30 sky_color,
    # 31 shadow_ambient, 32 water_overlay_strength (unused: overlay color
    # and horizon/void are compile-time constants, matching shade_hits)
    f32, i32 = jnp.float32, jnp.int32
    v = scal_ref[3]
    blk = ts_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)
    rows = jax.lax.broadcasted_iota(i32, (blk, 128), 0)
    tg = pl.program_id(0) * blk + rows
    scal_v = [scal_ref[i] for i in range(24)]
    dx, dy, dz = _ray_dirs(scal_v, tg, lanes, nsx)

    fl = fl_ref[:]
    # budget-exhausted actives shade as miss/sky, the reference's
    # fell-out-of-the-loop behavior (ray_tracer.wgsl:220)
    hit = ((fl >> _FL_HIT) & 1) != 0
    ax = (fl >> _FL_AX) & 7
    stp = (fl >> _FL_STP) & 0xFFF
    vox = (fl >> _FL_VOX) & 0xFF

    # water interval close (the raw carry leaves open intervals)
    def inv(c):
        c2 = jnp.where(c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7))
        return 1.0 / c2

    def slab(oc, ivc):
        return jnp.maximum((0.0 - oc) * ivc, (v - oc) * ivc)

    t_exit = jnp.minimum(
        jnp.minimum(
            slab(scal_ref[0], inv(dx)),
            jnp.minimum(slab(scal_ref[1], inv(dy)), slab(scal_ref[2], inv(dz))),
        ),
        4.0 * v + 16.0,
    )
    t_stop = jnp.minimum(ts_ref[:], t_exit)
    we = we_ref[:]
    water = wa_ref[:] + jnp.where(we >= 0.0, t_stop - we, 0.0)

    # material color via the 2-row-per-channel LUT (lane-local gathers)
    lut = lut_ref[0]
    lo = (vox & 127)
    hi = vox >> 7

    def chan(r0, r1):
        a = jnp.take_along_axis(jnp.broadcast_to(r0, (blk, 128)), lo, axis=1)
        b = jnp.take_along_axis(jnp.broadcast_to(r1, (blk, 128)), lo, axis=1)
        return jnp.where(hi != 0, b, a)

    cr = chan(lut[0:1], lut[1:2])
    cg = chan(lut[2:3], lut[3:4])
    cb = chan(lut[4:5], lut[5:6])

    # face tints (ray_tracer.wgsl:298-305): X faces x0.5, Z x0.7, bottom x0.2
    tint = jnp.where((ax & 1) != 0, f32(0.5), f32(1.0))
    tint = tint * jnp.where((ax & 4) != 0, f32(0.7), f32(1.0))
    bottom = ((ax & 2) != 0) & (dy > 0.0)
    tint = tint * jnp.where(bottom, f32(0.2), f32(1.0))
    cr = cr * tint
    cg = cg * tint
    cb = cb * tint

    if show_steps:
        fstep = jnp.clip(stp.astype(f32) / f32(max_steps), 0.0, 1.0)
        cr = fstep
        cg = fstep
        cb = fstep

    if shadows:
        amb = scal_ref[_SCAL_N + 7]
        shm = jnp.where((sh_ref[:] != 0) & hit, amb, f32(1.0))
        cr = cr * shm
        cg = cg * shm
        cb = cb * shm

    # sky (ops/sky.py:ray_sky, ray_tracer.wgsl:144-157)
    def sstep(e0, e1, x):
        t = jnp.clip((x - e0) * (1.0 / (e1 - e0)), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    gts = sstep(-0.01, 0.0, dy)
    grad_t = sstep(0.0, 0.4, dy) ** 0.35
    sun_dot = (dx * scal_ref[_SCAL_N] + dy * scal_ref[_SCAL_N + 1]
               + dz * scal_ref[_SCAL_N + 2])
    sun = (
        ((sun_dot > (1.0 - 0.01)) & (gts >= 1.0)).astype(f32)
        * scal_ref[_SCAL_N + 3]
    )

    def sky_chan(h, vd, sc):
        g = h + (sc - h) * grad_t
        return vd + (g - vd) * gts + sun

    sr = sky_chan(f32(1.0), f32(0.03), scal_ref[_SCAL_N + 4])
    sg = sky_chan(f32(0.3), f32(0.03), scal_ref[_SCAL_N + 5])
    sb = sky_chan(f32(0.0), f32(0.03), scal_ref[_SCAL_N + 6])

    r = jnp.where(hit, cr, sr)
    g = jnp.where(hit, cg, sg)
    b = jnp.where(hit, cb, sb)

    # water overlay (ray_tracer.wgsl:137-141; shade_hits parity)
    factor = jnp.clip(water * (1.0 / 14.0), 0.8, 1.0)
    wet = water != 0.0
    r = jnp.where(wet, r * (1.0 - factor) + 0.2 * factor, r)
    g = jnp.where(wet, g * (1.0 - factor) + 0.5 * factor, g)
    b = jnp.where(wet, b * (1.0 - factor) + 1.0 * factor, b)

    def q(c):
        # f32 -> i32 -> u32: Mosaic has no direct f32->u32 convert
        return (jnp.clip(c, 0.0, 1.0) * 255.0).astype(i32).astype(jnp.uint32)

    out_ref[:] = q(r) | (q(g) << 8) | (q(b) << 16) | jnp.uint32(0xFF000000)


def _shade(scal, lut, ts, fl, wa, we, sh,
           *, nsx, show_steps, shadows, max_steps, interpret):
    T = ts.shape[0]
    blk = 256 if T % 256 == 0 else _BLK

    def vspec(w=128):
        return pl.BlockSpec((blk, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kern = partial(
        _shade_kernel, nsx=nsx, show_steps=show_steps, shadows=shadows,
        max_steps=max_steps,
    )
    return pl.pallas_call(
        kern,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(), vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.uint32),
        interpret=interpret,
    )(scal, lut, ts, fl, wa, we, sh)


def color_lut_rows(colors):
    """[n,3] f32 material colors -> [6,128] LUT rows (r0 r1 g0 g1 b0 b1)."""
    c = np.zeros((256, 3), np.float32)
    cn = np.asarray(colors, np.float32)
    c[: len(cn)] = cn[:256]
    rows = np.zeros((6, 128), np.float32)
    for ch in range(3):
        rows[ch * 2] = c[:128, ch]
        rows[ch * 2 + 1] = c[128:, ch]
    return jnp.asarray(rows)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "shadows", "show_steps", "full_height",
        "warm", "return_cache", "step_cap", "compact",
    ),
)
def _render_frame(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    brick_dir, bricks, to_pack,
    origin, inv_view, inv_proj, lut,
    sky_color, sun_pos_local, sun_intensity, shadow_ambient,
    wc_p=None, sc_p=None, h_p=None, wc_s=None, sc_s=None, h_s=None,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
    shadows, show_steps, full_height=None, y0=0.0,
    warm=False, return_cache=False, step_cap=None, compact=True,
):
    """Primary trace (+ optional hard-shadow trace) + shade, fully tiled.

    Returns ``uint32[H, W]`` packed RGBA8 — the fast-path frame product
    (the reference's result texture is rgba8unorm too). All intermediate
    state stays in the [T,128] tile layout; the only image-space reshape
    is the final one-array untile.
    """
    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)

    args = (gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
            brick_dir, bricks, to_pack)
    z = jnp.zeros((), f32)
    zi = jnp.zeros((), i32)
    tr = _trace_frame(
        *args, origin, inv_view, inv_proj, z, z, z,
        wc_p if warm else zi, sc_p if warm else zi,
        h_p if warm else zi,
        width=width, height=height, rounds=rounds, step_cap=step_cap,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
        interpret=interpret, per_ray=False, raw_out=True,
        full_height=full_height, y0=y0,
        warm=warm, return_cache=return_cache, compact=compact,
    )
    if return_cache:
        ts, fl, wa, we, cache_p = tr
    else:
        ts, fl, wa, we = tr
        cache_p = None

    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)

    sh = jnp.zeros((T, 128), i32)
    if shadows:
        # shadow rays from hit points toward the sun (per-ray bundles)
        shape = (T, 128)
        tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
        lane_i = jax.lax.broadcasted_iota(i32, shape, 1)
        dx, dy, dz = _ray_dirs(
            [scal[i] for i in range(24)], tile_i, lane_i, nsx
        )
        hitm = ((fl >> _FL_HIT) & 1) != 0
        ax = (fl >> _FL_AX) & 7
        nx = -jnp.sign(dx) * ((ax >> 0) & 1).astype(f32)
        ny = -jnp.sign(dy) * ((ax >> 1) & 1).astype(f32)
        nz = -jnp.sign(dz) * ((ax >> 2) & 1).astype(f32)
        hx = origin[0] + dx * ts + nx * 1e-3
        hy = origin[1] + dy * ts + ny * 1e-3
        hz = origin[2] + dz * ts + nz * 1e-3
        svx = sun_pos_local[0] - hx
        svy = sun_pos_local[1] - hy
        svz = sun_pos_local[2] - hz
        sn = jnp.sqrt(svx * svx + svy * svy + svz * svz)
        ot = jnp.stack([hx, hy, hz], axis=-1)
        dt3 = jnp.stack([svx / sn, svy / sn, svz / sn], axis=-1)
        trs = _trace_frame(
            *args, jnp.zeros(3, f32), inv_view, inv_proj, ot, dt3, hitm,
            wc_s if warm else zi, sc_s if warm else zi,
            h_s if warm else zi,
            width=width, height=height, rounds=max(rounds // 2, 4),
            step_cap=step_cap,
            sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
            interpret=interpret, per_ray=True, raw_out=True,
            warm=warm, return_cache=return_cache, compact=compact,
        )
        if return_cache:
            _, fls, _, _, cache_s = trs
        else:
            _, fls, _, _ = trs
            cache_s = None
        sh = ((fls >> _FL_HIT) & 1)
    else:
        cache_s = cache_p

    # sun direction for the sky disc: constant per frame
    # (normalize(sun_pos − origin), ray_tracer.wgsl:152)
    sv = sun_pos_local - origin
    sun_dir = sv / jnp.linalg.norm(sv)
    scal2 = jnp.concatenate([
        scal,
        sun_dir,
        jnp.asarray([sun_intensity], f32),
        jnp.asarray(sky_color, f32),
        jnp.asarray([shadow_ambient], f32),
        jnp.zeros(8, f32),
    ])
    packed = _shade(
        scal2, lut[None], ts, fl, wa, we, sh,
        nsx=nsx, show_steps=show_steps, shadows=shadows,
        max_steps=rounds * sub_rounds * sub_steps, interpret=interpret,
    )

    def untile(x):
        return _untile_hw(x, tx, ty, width, height)

    # the flags image rides along for overlays/picking feedback (hit mask,
    # step heatmap, hit voxel ids) at the cost of one extra untile
    if return_cache:
        return untile(packed), untile(fl), (cache_p, cache_s)
    return untile(packed), untile(fl)


def render_frame3(
    rg: RenderGrid3,
    cam,
    materials_color,
    *,
    world_min=None,
    sky_color=(0.81, 0.93, 1.0),
    sun_pos=(0.0, 10_000.0, 0.0),
    sun_intensity=4.0,
    shadows=False,
    shadow_ambient=0.4,
    show_steps=False,
    rounds=16,
    steps_per_round=48,
    step_cap=None,
    interpret=None,
    with_flags=False,
    cache=None,
    return_cache=False,
    compact=True,
):
    """One shaded frame through the v3 fast path -> ``uint32[H,W]`` RGBA8.

    ``materials_color``: [n,3] f32 pack-id colors (MaterialTable.color) or a
    prebuilt :func:`color_lut_rows` result. Unpack to u8 RGB with
    :func:`unpack_rgba8`. ``with_flags=True`` also returns the per-pixel
    trace flags word (hit bit 1, axmask 2-4, steps 5-16, vox 17-24).
    ``cache``/``return_cache``: persistent service-cache token (primary +
    shadow) — see :func:`trace_wavefront3`; pass the previous frame's
    token back for temporally-coherent convergence in a few rounds.
    """
    width, height = cam.proj_size
    if interpret is None:
        interpret = _interpret_default()
    if not rg.palettes_ok:
        from ..utils.log import get_logger

        get_logger(__name__).warning(
            "rendering with overflowed subwindow palettes: a few voxels in "
            ">16-solid-id regions take the most-frequent entry's color"
        )
    wm = rg.world_min if world_min is None else world_min
    wm = jnp.asarray(wm, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm
    sun_local = jnp.asarray(sun_pos, jnp.float32) - wm
    lut = (jnp.asarray(materials_color)
           if getattr(materials_color, "shape", None) == (6, 128)
           else color_lut_rows(materials_color))
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    zi = jnp.zeros((), jnp.int32)
    if cache is not None:
        prim, cs = cache
        wc_p, sc_p, h_p = (prim if len(prim) == 3 else (*prim, zi))
        wc_s, sc_s, h_s = (
            cs if cs is not None and len(cs) == 3
            else (*cs, zi) if cs is not None
            else (zi, zi, zi)
        )
        warm = True
    else:
        wc_p = sc_p = h_p = wc_s = sc_s = h_s = zi
        warm = False
    out = _render_frame(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack,
        origin,
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        lut,
        jnp.asarray(sky_color, jnp.float32), sun_local,
        jnp.float32(sun_intensity), jnp.float32(shadow_ambient),
        wc_p, sc_p, h_p, wc_s, sc_s, h_s,
        width=width, height=height, rounds=rounds,
        step_cap=None if step_cap is None else int(step_cap),
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), shadows=bool(shadows),
        show_steps=bool(show_steps), warm=warm,
        return_cache=bool(return_cache),
        compact=compact if isinstance(compact, bool) else tuple(compact),
    )
    if return_cache:
        img, fl, cache_out = out
    else:
        img, fl = out
        cache_out = None
    ret = (img, fl) if with_flags else (img,)
    if return_cache:
        ret = ret + (cache_out,)
    return ret if len(ret) > 1 else ret[0]


def unpack_rgba8(img_u32):
    """uint32[H,W] packed RGBA8 -> uint8[H,W,3] (host-side, cheap)."""
    a = np.asarray(img_u32)
    return np.stack(
        [(a & 0xFF), (a >> 8) & 0xFF, (a >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)


# ------------------------------------------------------------- path tracing
#
# The wavefront bounce loop of models/pathtracer.py rebuilt on the v3
# march: every bounce is one fused per-ray trace plus tiled component
# math. Material properties come from a lane-local LUT kernel (a 2M-ray
# XLA gather costs ~18 ms on this runtime; the kernel costs microseconds).
# Semantics follow path_tracer.wgsl:149-194 as completed by PathTracer.

_WATER_ABSORB = (0.35, 0.08, 0.04)  # per-voxel-length (models/pathtracer.py)


def _mat_kernel(lut_ref, fl_ref, e_o, sc_o, r_o, g_o, b_o):
    """Per-ray material fetch: vox (from flags) -> emission, scatter, RGB."""
    i32 = jnp.int32
    fl = fl_ref[:]
    blk = fl.shape[0]
    vox = (fl >> _FL_VOX) & 0xFF
    lo = vox & 127
    hi = vox >> 7
    lut = lut_ref[0]

    def chan(i):
        a = jnp.take_along_axis(
            jnp.broadcast_to(lut[i:i + 1], (blk, 128)), lo, axis=1
        )
        b = jnp.take_along_axis(
            jnp.broadcast_to(lut[i + 1:i + 2], (blk, 128)), lo, axis=1
        )
        return jnp.where(hi != 0, b, a)

    e_o[:] = chan(0)
    sc_o[:] = chan(2)
    r_o[:] = chan(4)
    g_o[:] = chan(6)
    b_o[:] = chan(8)


def _matfetch(lut, fl, *, interpret):
    T = fl.shape[0]
    blk = 256 if T % 256 == 0 else _BLK

    def vspec():
        return pl.BlockSpec((blk, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    return pl.pallas_call(
        _mat_kernel,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((1, 10, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(),
        ],
        out_specs=tuple([vspec()] * 5),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T, 128), f32) for _ in range(5)
        ),
        interpret=interpret,
    )(lut, fl)


def material_lut_rows(color, emission, scatter):
    """Material tables -> [10,128] LUT rows (e0 e1 s0 s1 r0 r1 g0 g1 b0 b1)."""
    n = len(np.asarray(emission))
    e = np.zeros(256, np.float32)
    s = np.zeros(256, np.float32)
    c = np.zeros((256, 3), np.float32)
    e[:n] = np.asarray(emission, np.float32)[:256]
    s[:n] = np.asarray(scatter, np.float32)[:256]
    c[: len(np.asarray(color))] = np.asarray(color, np.float32)[:256]
    rows = np.zeros((10, 128), np.float32)
    rows[0], rows[1] = e[:128], e[128:]
    rows[2], rows[3] = s[:128], s[128:]
    for ch in range(3):
        rows[4 + ch * 2] = c[:128, ch]
        rows[5 + ch * 2] = c[128:, ch]
    return jnp.asarray(rows)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "bounces", "samples", "full_height", "step_cap",
        "v4", "prepacked", "return_cache", "bounce_sub_rounds",
        "bounce_rounds", "compact_tiles", "retry_s_ins", "retry_n_sc",
        "retry_sub_rounds", "prim_s_seg", "bounce_s_ins", "bounce_w_ins",
        "bounce_n_sc", "bounce_grouped", "bounce_s_seg", "bounce_sort",
        "bounce_spin_ramp", "prim_rounds", "prim_compact",
        "bounce_rebin", "bounce_wm_full", "compact_lanes",
        "retry_rounds1", "compact_tiles2",
    ),
)
def _path_frame(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    brick_dir, bricks, to_pack,
    origin, inv_view, inv_proj, mlut,
    sky_color, sun_pos_local, sun_intensity, key,
    warm_ids=None, sw_cont_pre=None, wmeta_pre=None,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
    bounces, samples, full_height=None, y0=0.0, step_cap=None, v4=False,
    prepacked=False, return_cache=False, bounce_sub_rounds=None,
    bounce_rounds=None, compact_tiles=0, retry_s_ins=32, retry_n_sc=64,
    retry_sub_rounds=None, prim_s_seg=1, bounce_s_ins=None,
    bounce_w_ins=None, bounce_n_sc=None, bounce_grouped=False,
    bounce_s_seg=1, bounce_sort=False, bounce_spin_ramp=0,
    prim_rounds=None, prim_compact=0, bounce_rebin=0,
    bounce_wm_full=False, compact_lanes=False, retry_rounds1=8,
    compact_tiles2=0,
):
    """Path-traced frame -> f32[H,W,3] linear radiance (sample average).

    v4 route perf carries (all bit-exact no-ops semantically):
      * every leg runs the self-serving kernel WARM — bounce b prefetches
        bounce b-1's per-block cache ids (secondary rays START where the
        previous leg's rays stopped, so the previous leg's cache is the
        ideal round-0 cache), and the primary leg warms from ``warm_ids``
        (the previous FRAME's token, like render_frame4);
      * ``prepacked`` + ``sw_cont_pre``/``wmeta_pre`` skip the per-frame
        HBM table packing (prepare_grid4);
      * the primary march is hoisted out of the sample loop (it doesn't
        depend on the sample key);
      * ``bounce_sub_rounds``: smaller in-kernel spin budget for the
        incoherent bounce legs (scattered rays stall early and want
        frequent serves; measured 118 -> 140 ms/frame when bounces spin
        256 steps/round like the coherent primary likes);
      * ``bounce_rounds`` + ``compact_tiles``: straggler re-batching —
        cap each bounce leg at ``bounce_rounds`` in-kernel serve rounds
        (most rays converge in a few), then row-compact the tiles still
        holding active rays into a dense ``compact_tiles``-tile resume
        launch (:func:`~.wavefront4._bounce_retry4`). Without this, a
        handful of deep stragglers pin whole 8K-ray blocks for the full
        ``rounds`` budget. Bit-exact vs an uncapped leg whenever the
        stragglers fit ``compact_tiles`` (marching is cache-content-
        deterministic); overflow keeps the old capped behavior.
    ``return_cache``: also return the primary leg's ids token for the
    next frame."""
    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)
    shape = (T, 128)

    args = (gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
            brick_dir, bricks, to_pack)
    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    lane_i = jax.lax.broadcasted_iota(i32, shape, 1)
    dx0, dy0, dz0 = _ray_dirs(
        [scal[i] for i in range(24)], tile_i, lane_i, nsx
    )
    kx, ky, kz = _WATER_ABSORB

    def sstep(e0, e1, x):
        t = jnp.clip((x - e0) * (1.0 / (e1 - e0)), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    def sky_rgb(dX, dY, dZ, oX, oY, oZ):
        gts = sstep(-0.01, 0.0, dY)
        grad_t = sstep(0.0, 0.4, dY) ** 0.35
        svx = sun_pos_local[0] - oX
        svy = sun_pos_local[1] - oY
        svz = sun_pos_local[2] - oZ
        sn = jnp.sqrt(svx * svx + svy * svy + svz * svz)
        sdot = (dX * svx + dY * svy + dZ * svz) / sn
        sun = ((sdot > 0.99) & (gts >= 1.0)).astype(f32) * sun_intensity

        def chanl(h, vd, sc):
            g = h + (sc - h) * grad_t
            return vd + (g - vd) * gts + sun

        return (chanl(1.0, 0.03, sky_color[0]),
                chanl(0.3, 0.03, sky_color[1]),
                chanl(0.0, 0.03, sky_color[2]))

    # ---- primary march: sample-independent, traced ONCE per frame ----
    z = jnp.zeros((), f32)
    ids_prim = None
    if v4:
        # self-serving kernel: drop the brick/pool args, cap is
        # positional-traced (0.0 = uncapped), rounds is a bound
        from .wavefront4 import _trace_frame4

        cap4 = 0.0 if step_cap is None else float(step_cap)
        a4 = args[:7]
        k4 = dict(
            width=width, height=height, sub_steps=sub_steps, v=v,
            interpret=interpret, raw_out=True, warm=True,
            prepacked=prepacked,
        )
        p_rounds = rounds if prim_rounds is None else int(prim_rounds)
        prim = _trace_frame4(
            *a4, origin, inv_view, inv_proj, z, z, z, p_rounds, cap4,
            warm_ids=warm_ids, sw_cont_pre=sw_cont_pre,
            wmeta_pre=wmeta_pre, sub_rounds=sub_rounds,
            s_seg=prim_s_seg, **k4,
        )
        ids_prim = prim[4]
        prim = prim[:4]
        if prim_compact:
            # primary-leg cap + compact-resume (the primary's stragglers
            # ARE a thin tail, unlike the bounce population): bit-exact,
            # measured -15% on the render path (primary_bench_probe)
            from .wavefront4 import _pack_tables4 as _pt4
            from .wavefront4 import _primary_retry4

            if prepacked:
                swc_p, wmp_p = sw_cont_pre, wmeta_pre
            else:
                swc_p, wmp_p = _pt4(
                    wmeta, sw_meta, sw_solid, sw_liq, sw_pid)
            pts, pfl, pwa, pwe = _primary_retry4(
                prim[0], prim[1], prim[2], prim[3], origin, inv_view,
                inv_proj, gw_jump, gw_liq, swc_p, wmp_p,
                jnp.asarray(cap4, f32),
                t_c=-(-int(prim_compact) // 64) * 64,
                rounds=max(rounds, 64), sub_rounds=sub_rounds,
                sub_steps=sub_steps, v=v, interpret=interpret,
                width=width, height=height,
                lane_compact=int(compact_lanes),
            )
            prim = (pts, pfl, pwa, pwe)
        b_sub_rounds = (
            sub_rounds if bounce_sub_rounds is None else bounce_sub_rounds
        )
        comp_t = int(compact_tiles)
        b_rounds = rounds if bounce_rounds is None else int(bounce_rounds)
        if comp_t:
            from .wavefront4 import _bounce_retry4, _pack_tables4

            comp_t = -(-comp_t // 64) * 64
            if prepacked:
                swc_r, wmp_r = sw_cont_pre, wmeta_pre
            else:
                swc_r, wmp_r = _pack_tables4(
                    wmeta, sw_meta, sw_solid, sw_liq, sw_pid
                )
    else:
        prim = _trace_frame(
            *args, origin, inv_view, inv_proj, z, z, z,
            width=width, height=height, rounds=rounds,
            step_cap=step_cap,
            sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
            interpret=interpret, per_ray=False, raw_out=True,
        )

    def one_sample(skey):
        oX = jnp.broadcast_to(origin[0], shape)
        oY = jnp.broadcast_to(origin[1], shape)
        oZ = jnp.broadcast_to(origin[2], shape)
        dX, dY, dZ = dx0, dy0, dz0
        cr = jnp.ones(shape, f32)
        cg = jnp.ones(shape, f32)
        cb = jnp.ones(shape, f32)
        lr = jnp.zeros(shape, f32)
        lg = jnp.zeros(shape, f32)
        lb = jnp.zeros(shape, f32)
        alive = jnp.ones(shape, bool)
        ids_prev = ids_prim

        for bounce in range(bounces + 1):
            if bounce == 0:
                ts, fl, wa, we = prim
            elif v4:
                rperm = None
                if bounce_rebin:
                    # GLOBAL tile-level spatial re-binning. The serve
                    # cost of a bounce leg is set by each 64-tile block
                    # program's DISTINCT-subwindow want-set: scattered
                    # bounce rays fan one block across dozens of
                    # subwindows, and the in-kernel cache replays a
                    # full fetch wave per block. Block-LOCAL direction
                    # sorting (bounce_sort) cannot shrink that set — it
                    # only rearranges lanes within the same block. This
                    # pass instead permutes whole 128-ray TILES across
                    # the frame, sorting by the subwindow id of each
                    # tile's bounce origins (adjacent pixels hit nearby
                    # voxels, so a tile's origins share a subwindow):
                    # after the sort, a block's tiles all start in the
                    # same few subwindows. Tile permutation is a ROW
                    # gather, which runs at ~HBM speed on this runtime
                    # (unlike element gathers — docs/TPU_NOTES.md), so
                    # the rebin costs ~2 ms of bandwidth, not a 2M-lane
                    # sort. BIT-EXACT: marching is lane/block-placement
                    # independent given cache contents, and results
                    # restore through the inverse permutation (pinned
                    # by tests/test_pathtrace4.py).
                    i32 = jnp.int32
                    ns_k = v // SW
                    vxk = jnp.floor(oX).astype(i32)
                    vyk = jnp.floor(oY).astype(i32)
                    vzk = jnp.floor(oZ).astype(i32)
                    s_ray = ((vxk >> 4) + (vyk >> 4) * ns_k
                             + (vzk >> 4) * ns_k * ns_k)
                    key_ray = jnp.where(alive, s_ray, jnp.int32(_BIGI))
                    tkey = jnp.min(key_ray, axis=1)              # [T]
                    if bounce_rebin >= 2:
                        # secondary key: octant of the tile's mean
                        # bounce direction — same-subwindow runs are
                        # further grouped by traversal direction
                        am = alive.astype(f32)
                        mdx = jnp.sum(dX * am, axis=1)
                        mdy = jnp.sum(dY * am, axis=1)
                        mdz = jnp.sum(dZ * am, axis=1)
                        okt = ((mdx > 0).astype(i32)
                               + ((mdy > 0).astype(i32) << 1)
                               + ((mdz > 0).astype(i32) << 2))
                        skey_t = jnp.where(
                            tkey < _BIGI, tkey * 8 + okt,
                            jnp.int32(_BIGI))
                    else:
                        skey_t = tkey
                    # (the binned leg runs with trust_active=True —
                    # tile validity is positional in the kernel, and
                    # permuted rays sit at arbitrary tile positions;
                    # `alive` is already False on padded tiles, so the
                    # caller-side mask is authoritative)
                    rperm = jnp.argsort(skey_t, stable=True)
                    rinv = jnp.argsort(rperm, stable=True)

                    def rp(x):
                        return jnp.take(x, rperm, axis=0)

                    inv = None
                    alive_s = rp(alive)
                    ot = rp(jnp.stack([oX, oY, oZ], axis=-1))
                    dt3 = rp(jnp.stack([dX, dY, dZ], axis=-1))
                    if bounce_rebin >= 3:
                        # ...plus an in-block LANE sort on the SPATIAL
                        # key (sid, octant): the march serializes
                        # INSIDE a tile too — boundary() targets ONE
                        # subwindow per tile per cycle (at_ts), so a
                        # tile whose diffuse lanes span K subwindows
                        # pays K service cycles. After the row rebin a
                        # block holds few distinct sids; this sort
                        # makes each 128-lane tile (mostly) single-sid
                        # and direction-coherent. (Round-4's
                        # bounce_sort used a direction-only key and
                        # measured a wash — the spatial half is what
                        # shrinks the per-tile want-set.)
                        s_rp = rp(key_ray)           # BIGI for dead
                        dxs = dt3[..., 0]
                        dys = dt3[..., 1]
                        dzs = dt3[..., 2]
                        okt_l = ((dxs > 0).astype(i32)
                                 + ((dys > 0).astype(i32) << 1)
                                 + ((dzs > 0).astype(i32) << 2))
                        lkey = jnp.where(
                            s_rp < _BIGI, s_rp * 8 + okt_l,
                            jnp.int32(_BIGI))
                        BL = _BLK * 128

                        def br(x):
                            return x.reshape(-1, BL)

                        lidx = jnp.broadcast_to(
                            jax.lax.broadcasted_iota(i32, (1, BL), 1),
                            (T // _BLK, BL),
                        )
                        srt = jax.lax.sort(
                            (br(lkey), lidx,
                             br(ot[..., 0]), br(ot[..., 1]),
                             br(ot[..., 2]), br(dxs), br(dys), br(dzs),
                             br(alive_s.astype(i32))),
                            dimension=-1, num_keys=1, is_stable=True,
                        )
                        lane_inv = srt[1]
                        ot = jnp.stack(
                            [x.reshape(T, 128) for x in srt[2:5]],
                            axis=-1)
                        dt3 = jnp.stack(
                            [x.reshape(T, 128) for x in srt[5:8]],
                            axis=-1)
                        alive_s = srt[8].reshape(T, 128) != 0
                    # Synthetic warm token from the binned keys: after
                    # the sort, block b's want-set is (mostly) the
                    # sorted run of sids covering its 64 tiles — sample
                    # them at stride 64/n_sc, drop consecutive
                    # duplicates, and hand the kernel a round-0
                    # prefetch list. Wrong/missing entries only cost a
                    # re-serve (warm tokens carry no geometry).
                    skt = jnp.take(tkey, rperm)
                    nB = T // _BLK
                    n_sc_b = int(bounce_n_sc) if bounce_n_sc else N_SC
                    stp_ = max(_BLK // min(n_sc_b, _BLK), 1)
                    samp = skt.reshape(nB, _BLK)[:, ::stp_][:, :n_sc_b]
                    samp = jnp.where(samp >= _BIGI, -1, samp)
                    sprev = jnp.concatenate(
                        [jnp.full((nB, 1), -1, i32), samp[:, :-1]],
                        axis=1)
                    samp = jnp.where(
                        (samp == sprev) & (sprev >= 0), -1, samp)
                    nw_k = ns_k // 4
                    sxs = samp % ns_k
                    sys_ = (samp // ns_k) % ns_k
                    szs = samp // (ns_k * ns_k)
                    wsamp = jnp.where(
                        samp >= 0,
                        (sxs >> 2) + (sys_ >> 2) * nw_k
                        + (szs >> 2) * nw_k * nw_k, -1)
                    wprev = jnp.concatenate(
                        [jnp.full((nB, 1), -1, i32), wsamp[:, :-1]],
                        axis=1)
                    wrow = jnp.where(
                        (wsamp == wprev) & (wprev >= 0), -1, wsamp
                    )[:, :N_WC]

                    def padlane(x):
                        return jnp.pad(
                            x, ((0, 0), (0, 128 - x.shape[1])),
                            constant_values=-1)

                    rebin_tok = jnp.stack(
                        [padlane(samp), padlane(wrow)], axis=1)
                elif bounce_sort:
                    # Block-level direction sort: boundary() advances
                    # ONE subwindow per TILE per sub-round, and the
                    # march is order-invariant within a tile — so
                    # redistribute rays ACROSS the block's 64 tiles,
                    # grouping by direction octant (refined by the
                    # dominant axis): each tile then holds a coherent
                    # bundle that traverses the same cells. One
                    # multi-operand lax.sort carries all ray planes
                    # (no gathers); a second sort by the carried index
                    # restores pixel order. BIT-EXACT: marching is
                    # lane-placement-independent given cache contents
                    # (pinned by tests/test_pathtrace4.py).
                    i32 = jnp.int32
                    okey = (
                        (dX > 0.0).astype(i32)
                        + ((dY > 0.0).astype(i32) << 1)
                        + ((dZ > 0.0).astype(i32) << 2)
                    )
                    okey = (okey << 2) + jnp.argmax(
                        jnp.stack([jnp.abs(dX), jnp.abs(dY),
                                   jnp.abs(dZ)]), axis=0
                    ).astype(i32)
                    BL = 64 * 128  # rays per block program

                    def breshape(x):
                        return x.reshape(-1, BL)

                    ridx = jnp.broadcast_to(
                        jax.lax.broadcasted_iota(i32, (1, BL), 1),
                        (T // 64, BL),
                    )
                    srt = jax.lax.sort(
                        (breshape(okey), ridx, breshape(oX),
                         breshape(oY), breshape(oZ), breshape(dX),
                         breshape(dY), breshape(dZ),
                         breshape(alive.astype(i32))),
                        dimension=-1, num_keys=1, is_stable=True,
                    )
                    inv = srt[1]
                    oXs, oYs, oZs, dXs, dYs, dZs = (
                        x.reshape(shape) for x in srt[2:8]
                    )
                    alive_s = srt[8].reshape(shape) != 0
                    ot = jnp.stack([oXs, oYs, oZs], axis=-1)
                    dt3 = jnp.stack([dXs, dYs, dZs], axis=-1)
                else:
                    inv = None
                    alive_s = alive
                    ot = jnp.stack([oX, oY, oZ], axis=-1)
                    dt3 = jnp.stack([dX, dY, dZ], axis=-1)
                bkw = {}
                if bounce_s_ins is not None:
                    bkw["s_ins"] = int(bounce_s_ins)
                if bounce_w_ins is not None:
                    bkw["w_ins"] = int(bounce_w_ins)
                if bounce_n_sc is not None:
                    bkw["n_sc"] = int(bounce_n_sc)
                if bounce_grouped:
                    bkw["grouped"] = True
                if bounce_s_seg != 1:
                    bkw["s_seg"] = int(bounce_s_seg)
                if bounce_spin_ramp:
                    bkw["spin_ramp"] = int(bounce_spin_ramp)
                # use_wm_full=False: the in-VMEM window table lets
                # incoherent rays march deeper between serves, widening
                # each round's subwindow want-set — measured 4.6x the
                # unconverged residual at equal rounds on the bounce
                # legs (1.32% vs 0.29%, pt_compact_probe r7) with no
                # speed gain there; the dynamic window cache keeps the
                # round-3 convergence schedule. The coherent PRIMARY
                # keeps wm_full (it is part of the 156->167 Mrays/s
                # headline gain).
                ts, fl, wa, we, ids_b = _trace_frame4(
                    *a4, jnp.zeros(3, f32), inv_view, inv_proj,
                    ot, dt3, alive_s, b_rounds, cap4,
                    warm_ids=(rebin_tok if rperm is not None
                              else ids_prev),
                    sw_cont_pre=sw_cont_pre,
                    wmeta_pre=wmeta_pre, sub_rounds=b_sub_rounds,
                    per_ray=True, use_wm_full=bool(bounce_wm_full),
                    trust_active=rperm is not None,
                    **bkw, **k4,
                )
                if rperm is None:
                    # binned legs build their own token per leg; the
                    # kernel's returned ids are in binned block order
                    # and would mislead the next leg
                    ids_prev = ids_b
                if rperm is not None:
                    if bounce_rebin >= 3:
                        # lane-unsort within each block first
                        BL = _BLK * 128
                        uns = jax.lax.sort(
                            (lane_inv, ts.reshape(-1, BL),
                             fl.reshape(-1, BL), wa.reshape(-1, BL),
                             we.reshape(-1, BL)),
                            dimension=-1, num_keys=1, is_stable=True,
                        )
                        ts = uns[1].reshape(shape)
                        fl = uns[2].reshape(shape)
                        wa = uns[3].reshape(shape)
                        we = uns[4].reshape(shape)

                    def runsort(x):
                        return jnp.take(x, rinv, axis=0)

                    ts = runsort(ts)
                    fl = runsort(fl)
                    wa = runsort(wa)
                    we = runsort(we)
                    ot = jnp.stack([oX, oY, oZ], axis=-1)
                    dt3 = jnp.stack([dX, dY, dZ], axis=-1)
                elif bounce_sort:
                    BL = 64 * 128
                    uns = jax.lax.sort(
                        (inv, ts.reshape(-1, BL), fl.reshape(-1, BL),
                         wa.reshape(-1, BL), we.reshape(-1, BL)),
                        dimension=-1, num_keys=1, is_stable=True,
                    )
                    ts = uns[1].reshape(shape)
                    fl = uns[2].reshape(shape)
                    wa = uns[3].reshape(shape)
                    we = uns[4].reshape(shape)
                    ot = jnp.stack([oX, oY, oZ], axis=-1)
                    dt3 = jnp.stack([dX, dY, dZ], axis=-1)
                if comp_t:
                    # the retry is tiny (comp_t/64 blocks), so its round
                    # budget is raised to full convergence — stragglers
                    # actually finish instead of shading as the rounds-
                    # cap sky (the on-chip PT correctness gap's source)
                    ts, fl, wa, we = _bounce_retry4(
                        ts, fl, wa, we, ot, dt3, gw_jump, gw_liq,
                        swc_r, wmp_r, cap4,
                        t_c=comp_t, rounds=max(rounds, 64),
                        sub_rounds=(b_sub_rounds if retry_sub_rounds
                                    is None else retry_sub_rounds),
                        sub_steps=sub_steps,
                        v=v, interpret=interpret,
                        s_ins=retry_s_ins, n_sc=retry_n_sc,
                        lane_compact=compact_lanes,
                        rounds1=int(retry_rounds1),
                        t_c2=(-(-int(compact_tiles2) // 64) * 64
                              if compact_tiles2 else 0),
                    )
            else:
                ot = jnp.stack([oX, oY, oZ], axis=-1)
                dt3 = jnp.stack([dX, dY, dZ], axis=-1)
                ts, fl, wa, we = _trace_frame(
                    *args, jnp.zeros(3, f32), inv_view, inv_proj,
                    ot, dt3, alive,
                    width=width, height=height,
                    rounds=max(rounds * 2 // 3, 4),
                    step_cap=step_cap,
                    sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
                    interpret=interpret, per_ray=True, raw_out=True,
                )
            hit = ((fl >> _FL_HIT) & 1) != 0
            ax = (fl >> _FL_AX) & 7

            def invc(c):
                c2 = jnp.where(
                    c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7)
                )
                return 1.0 / c2

            def slabc(oc, ivc):
                return jnp.maximum((0.0 - oc) * ivc, (v - oc) * ivc)

            t_exit = jnp.minimum(
                jnp.minimum(
                    slabc(oX, invc(dX)),
                    jnp.minimum(slabc(oY, invc(dY)), slabc(oZ, invc(dZ))),
                ),
                jnp.float32(4.0 * v + 16.0),
            )
            t_stop = jnp.minimum(ts, t_exit)
            water = wa + jnp.where(we >= 0.0, t_stop - we, 0.0)

            emis, scat, ar, ag, ab = _matfetch(
                mlut[None], fl, interpret=interpret
            )

            # Beer–Lambert water absorption along this segment
            live = alive
            cr = cr * jnp.where(live, jnp.exp(-water * kx), 1.0)
            cg = cg * jnp.where(live, jnp.exp(-water * ky), 1.0)
            cb = cb * jnp.where(live, jnp.exp(-water * kz), 1.0)

            skr, skg, skb = sky_rgb(dX, dY, dZ, oX, oY, oZ)
            miss = live & ~hit
            lr = lr + jnp.where(miss, cr * skr, 0.0)
            lg = lg + jnp.where(miss, cg * skg, 0.0)
            lb = lb + jnp.where(miss, cb * skb, 0.0)

            h = live & hit
            lr = lr + jnp.where(h, cr * emis * ar, 0.0)
            lg = lg + jnp.where(h, cg * emis * ag, 0.0)
            lb = lb + jnp.where(h, cb * emis * ab, 0.0)
            cr = jnp.where(h, cr * ar, cr)
            cg = jnp.where(h, cg * ag, cg)
            cb = jnp.where(h, cb * ab, cb)
            alive = h

            if bounce == bounces:
                break

            # next ray: mix diffuse/specular about the face normal
            nx = -jnp.sign(dX) * ((ax >> 0) & 1).astype(f32)
            ny = -jnp.sign(dY) * ((ax >> 1) & 1).astype(f32)
            nz = -jnp.sign(dZ) * ((ax >> 2) & 1).astype(f32)
            degen = (nx == 0.0) & (ny == 0.0) & (nz == 0.0)
            nx = jnp.where(degen, -dX, nx)
            ny = jnp.where(degen, -dY, ny)
            nz = jnp.where(degen, -dZ, nz)

            # Counter-hash normals (murmur3 finalizer -> Box-Muller),
            # keyed on (ray id, bounce-derived key) — the same
            # construction as the fused kernel's on-core RNG
            # (ops/pathtrace4.py rand_u01). Replaces 6M threefry draws
            # per leg with a few int ops per lane; measured NEUTRAL on
            # 1080p frame time (the threefry was pipeline-hidden), kept
            # for the 2D shape (no [.,128,3] minor-dim materialization)
            # and the shared construction. Same estimator; still
            # deterministic per key and key-sensitive.
            bkey = jax.random.fold_in(skey, bounce)
            kd = bkey
            if jnp.issubdtype(jnp.asarray(kd).dtype, jax.dtypes.prng_key):
                kd = jax.random.key_data(kd)
            kd = jnp.asarray(kd, jnp.uint32).reshape(-1)
            sbase = kd[0] ^ (kd[-1] * jnp.uint32(0x9E3779B9))
            rid = (tile_i * 128 + lane_i).astype(jnp.uint32)

            def u01(j):
                h = rid ^ sbase ^ jnp.uint32((j * 0x632BE5AB) & 0xFFFFFFFF)
                h = h ^ (h >> 16)
                h = h * jnp.uint32(0x85EBCA6B)
                h = h ^ (h >> 13)
                h = h * jnp.uint32(0xC2B2AE35)
                h = h ^ (h >> 16)
                # 23 mantissa-exact bits in (0,1): never 0 -> ln finite
                return (h >> 9).astype(f32) * f32(1.0 / (1 << 23)) \
                    + f32(1.0 / (1 << 24))

            u1, u2, u3, u4 = u01(0), u01(1), u01(2), u01(3)
            r1 = jnp.sqrt(-2.0 * jnp.log(u1))
            a1 = f32(2.0 * np.pi) * u2
            r2 = jnp.sqrt(-2.0 * jnp.log(u3))
            a2 = f32(2.0 * np.pi) * u4
            rv = jnp.stack([
                r1 * jnp.cos(a1), r1 * jnp.sin(a1), r2 * jnp.cos(a2),
            ], axis=-1)
            rn = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
            rn = jnp.maximum(rn, 1e-6)
            vx_ = rv[..., 0] / rn
            vy_ = rv[..., 1] / rn
            vz_ = rv[..., 2] / rn
            dfx = nx + vx_
            dfy = ny + vy_
            dfz = nz + vz_
            dn = jnp.sqrt(dfx * dfx + dfy * dfy + dfz * dfz)
            ok = dn > 1e-6
            dnm = jnp.maximum(dn, 1e-6)
            dfx = jnp.where(ok, dfx / dnm, nx)
            dfy = jnp.where(ok, dfy / dnm, ny)
            dfz = jnp.where(ok, dfz / dnm, nz)
            dot = dX * nx + dY * ny + dZ * nz
            spx = dX - 2.0 * dot * nx
            spy = dY - 2.0 * dot * ny
            spz = dZ - 2.0 * dot * nz
            ndx = dfx * scat + spx * (1.0 - scat)
            ndy = dfy * scat + spy * (1.0 - scat)
            ndz = dfz * scat + spz * (1.0 - scat)
            nn = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
            ok = nn > 1e-6
            nnm = jnp.maximum(nn, 1e-6)
            ndx = jnp.where(ok, ndx / nnm, nx)
            ndy = jnp.where(ok, ndy / nnm, ny)
            ndz = jnp.where(ok, ndz / nnm, nz)

            # Rebase at the hit point. The crossing-axis coordinate of
            # o + d*t lies ON an integer voxel face BY CONSTRUCTION (t
            # solves the face crossing), so floor() of it downstream is
            # knife-edge: a 1-ulp cross-platform difference in t moves
            # the scatter origin into a different voxel cell and the
            # whole secondary path diverges chaotically (the on-chip PT
            # pixel-agreement gap, tools/tpu_correctness.py). Snap that
            # coordinate to its integer face — round() is maximally
            # STABLE exactly where floor() is maximally fragile — before
            # the eps nudge, making the scatter origin platform-stable.
            # floor(x+0.5) (not jnp.round) so the fused kernel
            # (ops/pathtrace4.py, Mosaic) can use the bit-identical
            # formula. Bit-exactness across routes is pinned by
            # tests/test_pathtrace4.py.
            eps = 4.0 * 1e-3
            px = oX + dX * ts
            py = oY + dY * ts
            pz = oZ + dZ * ts
            px = jnp.where(
                ((ax >> 0) & 1) != 0, jnp.floor(px + 0.5), px)
            py = jnp.where(
                ((ax >> 1) & 1) != 0, jnp.floor(py + 0.5), py)
            pz = jnp.where(
                ((ax >> 2) & 1) != 0, jnp.floor(pz + 0.5), pz)
            oX = px + nx * eps
            oY = py + ny * eps
            oZ = pz + nz * eps
            dX, dY, dZ = ndx, ndy, ndz

        return lr, lg, lb

    keys = jax.random.split(key, samples)
    ar_ = jnp.zeros(shape, f32)
    ag_ = jnp.zeros(shape, f32)
    ab_ = jnp.zeros(shape, f32)
    for si in range(samples):
        r, g, b = one_sample(keys[si])
        ar_ = ar_ + r
        ag_ = ag_ + g
        ab_ = ab_ + b
    inv_s = 1.0 / samples

    def untile(x):
        return _untile_hw(x, tx, ty, width, height)

    img = jnp.stack(
        [untile(ar_ * inv_s), untile(ag_ * inv_s), untile(ab_ * inv_s)],
        axis=-1,
    )
    if return_cache:
        return img, ids_prim
    return img


def path_trace3(
    rg: RenderGrid3,
    cam,
    materials,
    *,
    world_min=None,
    sky_color=(0.81, 0.93, 1.0),
    sun_pos=(0.0, 10_000.0, 0.0),
    sun_intensity=4.0,
    bounces=1,
    samples=1,
    key=None,
    rounds=16,
    steps_per_round=48,
    bounce_steps_per_round=None,
    bounce_rounds=None,
    compact_tiles=0,
    retry_s_ins=32,
    retry_n_sc=64,
    retry_steps_per_round=None,
    prim_steps_per_round=None,
    prim_s_seg=1,
    bounce_s_ins=None,
    bounce_w_ins=None,
    bounce_n_sc=None,
    bounce_grouped=False,
    bounce_s_seg=1,
    bounce_sort=False,
    bounce_spin_ramp=0,
    bounce_rebin=0,
    bounce_wm_full=False,
    compact_lanes=False,
    retry_rounds1=8,
    compact_tiles2=0,
    prim_rounds=None,
    prim_compact=0,
    step_cap=None,
    interpret=None,
    v4=False,
    prepared=None,
    cache=None,
    return_cache=False,
):
    """Path-traced frame through the v3 fast path -> f32[H,W,3] radiance.
    ``v4=True`` swaps every bounce's march to the self-serving v4 kernel
    (ops/wavefront4.py) — same semantics, no host round loop.

    v4-route perf carries (all bit-exact; see _path_frame):
    ``prepared`` = :func:`~voxelraytracing_tpu.ops.wavefront4.prepare_grid4`
    packed tables; ``cache``/``return_cache`` = the previous frame's
    warm-start ids token (carried like render_frame4's);
    ``bounce_steps_per_round`` = in-kernel spin budget for the incoherent
    bounce legs (default: same as ``steps_per_round``);
    ``bounce_rounds``/``compact_tiles`` = straggler re-batching: cap each
    bounce leg's in-kernel serve rounds, then compact the tiles still
    carrying active rays into one dense resume launch (see _path_frame).

    ``materials``: a MaterialTable (color/emission/scatter used). The
    reference's path tracer was never dispatched (path_tracer.wgsl, stale
    node format); this is the working fast-path equivalent.
    """
    width, height = cam.proj_size
    if interpret is None:
        interpret = _interpret_default()
    wm = rg.world_min if world_min is None else world_min
    wm = jnp.asarray(wm, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm
    sun_local = jnp.asarray(sun_pos, jnp.float32) - wm
    mlut = material_lut_rows(
        materials.color, materials.emission, materials.scatter
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    if prim_steps_per_round is not None:
        # a bigger in-kernel spin budget for the COHERENT primary leg
        # only (the incoherent bounce legs keep steps_per_round)
        if bounce_steps_per_round is None:
            bounce_steps_per_round = steps_per_round
        sub_rounds = max(int(prim_steps_per_round) // sub_steps, 1)
    bounce_sub_rounds = (
        None if bounce_steps_per_round is None
        else max(int(bounce_steps_per_round) // sub_steps, 1)
    )
    out = _path_frame(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack,
        origin,
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        mlut,
        jnp.asarray(sky_color, jnp.float32), sun_local,
        jnp.float32(sun_intensity), key,
        warm_ids=cache,
        sw_cont_pre=None if prepared is None else prepared.sw_cont,
        wmeta_pre=None if prepared is None else prepared.wmeta_pad,
        width=width, height=height, rounds=rounds,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), bounces=int(bounces),
        samples=int(samples),
        step_cap=None if step_cap is None else int(step_cap),
        v4=bool(v4), prepacked=prepared is not None,
        return_cache=bool(return_cache),
        bounce_sub_rounds=bounce_sub_rounds,
        bounce_rounds=bounce_rounds, compact_tiles=int(compact_tiles),
        retry_s_ins=int(retry_s_ins), retry_n_sc=int(retry_n_sc),
        retry_sub_rounds=(
            None if retry_steps_per_round is None
            else max(int(retry_steps_per_round) // sub_steps, 1)
        ),
        prim_s_seg=int(prim_s_seg),
        bounce_s_ins=bounce_s_ins, bounce_w_ins=bounce_w_ins,
        bounce_n_sc=bounce_n_sc, bounce_grouped=bool(bounce_grouped),
        bounce_s_seg=int(bounce_s_seg), bounce_sort=bool(bounce_sort),
        bounce_spin_ramp=int(bounce_spin_ramp),
        bounce_rebin=int(bounce_rebin),
        bounce_wm_full=bool(bounce_wm_full),
        compact_lanes=int(compact_lanes),
        retry_rounds1=int(retry_rounds1),
        compact_tiles2=int(compact_tiles2),
        prim_rounds=prim_rounds, prim_compact=int(prim_compact),
    )
    return out

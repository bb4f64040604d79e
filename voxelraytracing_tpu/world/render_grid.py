"""Incrementally-maintained RenderGrid3 for the interactive engine.

The fused tracer's world (ops/wavefront3.py:RenderGrid3) is a set of flat
bit-plane tables. This module keeps host (NumPy) copies of those tables
for a scrolling chunk window and re-derives only what a chunk arrival,
edit, or eviction touches: a 32³ chunk covers exactly eight 16³
subwindows and one-eighth of a 64³ window, so an update rewrites 8
subwindow rows, refreshes one window's meta, and flips at most one global
-plane bit (client/src/world.rs:126-183 is the reference's analogous
incremental path — node spans into one GPU buffer).

Uploads are incremental too: ``grid()`` scatters only dirty rows into the
cached device arrays (`.at[rows].set`), so a steady-state frame moves a
few KB, not the ~4 MB tables.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..core.constants import CHUNK_SIZE
from ..ops.wavefront import render_id_maps
from ..ops.wavefront3 import (
    SW,
    WIN,
    RenderGrid3,
    _gs_for,
    _pack_bits_np,
    _super_gplanes_np,
    build_sw_palettes,
)
from ..utils.log import get_logger

log = get_logger(__name__)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(dst, rows, vals):
    """In-place row scatter: donating ``dst`` lets XLA update the buffer
    without copying it (the tables are ~0.7 GB at the 30-chunk window, so a
    functional update would move gigabytes per frame)."""
    return dst.at[rows].set(vals)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_pack_sw(dst, rows, solid, liq, pid, meta):
    """Pack + scatter dirty subwindow rows of the v4 wire table
    (sw_cont [Ns³,7,128]) in place — row i is a pure function of the
    raw planes' row i, so a world change repacks ONLY its rows instead
    of the whole table (prepare_grid4's full repack costs ~6.7 ms/frame
    at 1080p-scale windows)."""
    from ..ops.wavefront4 import _interleave_meta

    meta_i = _interleave_meta(meta)
    cont = jnp.concatenate(
        [
            solid[:, None, :],
            liq[:, None, :],
            pid,
            jnp.pad(
                meta_i, ((0, 0), (0, 128 - meta_i.shape[1]))
            )[:, None, :],
        ],
        axis=1,
    )
    return dst.at[rows].set(cont)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_pack_w(dst, rows, meta):
    from ..ops.wavefront4 import _interleave_meta

    meta_i = _interleave_meta(meta)
    pad = jnp.pad(meta_i, ((0, 0), (0, 128 - meta_i.shape[1])))[:, None, :]
    return dst.at[rows].set(pad)


def _spread16_np(v):
    v = v.astype(np.uint32) & np.uint32(0xFFFF)
    v = (v | (v << 8)) & np.uint32(0x00FF00FF)
    v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint32(0x33333333)
    return (v | (v << 1)) & np.uint32(0x55555555)


def _interleave_meta_np(m):
    """NumPy twin of ops.wavefront4._interleave_meta (equality pinned by
    tests/test_engine_app.py sparse tests)."""
    j, l = m[:, 0:2], m[:, 2:4]
    out = np.stack(
        [
            _spread16_np(j[:, 0]) | (_spread16_np(l[:, 0]) << 1),
            _spread16_np(j[:, 0] >> 16) | (_spread16_np(l[:, 0] >> 16) << 1),
            _spread16_np(j[:, 1]) | (_spread16_np(l[:, 1]) << 1),
            _spread16_np(j[:, 1] >> 16) | (_spread16_np(l[:, 1] >> 16) << 1),
        ],
        axis=1,
    )
    return np.concatenate([out, m[:, 4:]], axis=1)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows3(dst, rows, vals):
    return dst.at[rows].set(vals)


_CANON_STAMP = 0xFFFFFFFE  # sid stamp for shared canonical rows: never
#                            matches a real sid, so warm restores skip
#                            them (they re-serve; buried rows are rarely
#                            in view anyway)


def chunk_batch_sw_data(rgrids, n_liquid, to_pack):
    """Vectorized per-subwindow data for a batch of chunks.

    ``rgrids``: int array [B,32,32,32] of *render* ids (see render_id_maps).
    Returns a dict of arrays over the B*8 subwindows, ordered chunk-major
    with local subwindow index ``sz*4 + sy*2 + sx`` — plus per-sw flags
    needed for window meta upkeep. Mirrors ops/wavefront3.py:
    _planes_from_masks_np at chunk scale.
    """
    rg = np.asarray(rgrids)
    b = rg.shape[0]

    def sw_rows(m):
        t = m.reshape(b, 2, SW, 2, SW, 2, SW)        # (B, X,xl, Y,yl, Z,zl)
        t = t.transpose(0, 5, 3, 1, 6, 4, 2)         # (B, Z,Y,X, zl,yl,xl)
        return t.reshape(b * 8, SW * SW * SW)

    from ..core import native

    if native.available():
        # one native pass over the rows: bit packing, brick metas,
        # palettes and pid planes at memory speed (~15x the NumPy path;
        # equality pinned by tests/test_native.py)
        return native.sw_rows_build(sw_rows(rg), n_liquid, to_pack)

    solid = rg > n_liquid
    liq = (rg >= 1) & (rg <= n_liquid)

    solid_rows = sw_rows(solid)
    sw_solid = _pack_bits_np(solid_rows)
    sw_liq = _pack_bits_np(sw_rows(liq))

    def brick_reduce(m, op):
        t = m.reshape(b, 2, 4, 4, 2, 4, 4, 2, 4, 4)
        # (B, X,bx,vx, Y,by,vy, Z,bz,vz) -> any/all over voxel dims
        r = op(t, (3, 6, 9))                         # (B, X,bx, Y,by, Z,bz)
        r = r.transpose(0, 5, 3, 1, 6, 4, 2)         # (B, Z,Y,X, bz,by,bx)
        return r.reshape(b * 8, 64)

    b_any_solid = brick_reduce(solid, np.ndarray.any)
    b_all_liq = brick_reduce(liq, np.ndarray.all)
    b_any_liq = brick_reduce(liq, np.ndarray.any)
    b_jump = ~b_any_solid & (b_all_liq | ~b_any_liq)

    sw_meta = np.zeros((b * 8, 8), np.uint32)
    sw_meta[:, 0:2] = _pack_bits_np(b_jump)
    sw_meta[:, 2:4] = _pack_bits_np(b_all_liq)

    # palettes + palette-index planes: shared with the one-shot builder
    # (ops/wavefront3.build_sw_palettes) so overflow policy can't drift
    pal_words, sw_pid, pal_ok = build_sw_palettes(
        sw_rows(rg), solid_rows, to_pack
    )
    sw_meta[:, 4:8] = pal_words

    s_any_solid = b_any_solid.any(axis=1)
    s_all_liq = b_all_liq.all(axis=1)
    s_any_liq = b_any_liq.any(axis=1)
    return dict(
        sw_solid=sw_solid, sw_liq=sw_liq, sw_meta=sw_meta, sw_pid=sw_pid,
        any_solid=s_any_solid, all_liq=s_all_liq, any_liq=s_any_liq,
        palettes_ok=pal_ok,
    )


class RenderGrid3Builder:
    """Host-side RenderGrid3 with incremental chunk updates + uploads.

    ``sparse``: maintain the v4 packed tables SPARSELY (content rows only
    for non-jump subwindows, uniform-solid rows deduplicated) instead of
    densely. Auto-enabled past 64 chunks, where the dense tables cannot
    fit a chip at all (~15 GB at the reference's 80-chunk window,
    ui.rs:165); consumers that only render through :meth:`prepared`
    (the engine) opt in explicitly from 33 chunks. Sparse mode skips
    the dense device planes entirely — grid() returns placeholder raw
    planes, so the v3/per-plane fallback paths are unavailable."""

    def __init__(self, size_in_chunks, materials, world_min=(0, 0, 0),
                 sparse=None):
        self.w = int(size_in_chunks)
        v = self.w * CHUNK_SIZE
        self.v = v
        vpad = -(-v // WIN) * WIN
        self.ns = vpad // SW
        self.nw = vpad // WIN
        _gs_for(self.nw)  # asserts the supported ceiling (128³ windows)
        ns3, nw3 = self.ns ** 3, self.nw ** 3
        self.sw_solid = np.zeros((ns3, 128), np.uint32)
        self.sw_liq = np.zeros((ns3, 128), np.uint32)
        self.sw_meta = np.zeros((ns3, 8), np.uint32)
        self.sw_pid = np.zeros((ns3, 4, 128), np.uint32)
        self.s_any_solid = np.zeros(ns3, bool)
        self.s_all_liq = np.zeros(ns3, bool)
        self.s_any_liq = np.zeros(ns3, bool)
        self.wmeta = np.zeros((nw3, 8), np.uint32)
        self._rebuild_all_windows = True
        self.world_min = np.asarray(world_min, np.int64)

        is_liquid = np.asarray(materials.is_liquid)
        self.to_render, self.to_pack, self.n_liquid = render_id_maps(
            is_liquid
        )
        self._dirty_sw = set()
        self._dirty_w = set()
        self._dev = None  # cached device arrays
        self._cached_rg = None  # identity-stable RenderGrid3 when clean
        self.palettes_ok = True
        # v4 packed-table twin (prepare_grid4's wire layout), maintained
        # incrementally by prepared(); separate dirty sets because grid()
        # clears the raw ones
        self._dirty_sw_pack = set()
        self._dirty_w_pack = set()
        self._prep = None
        # sparse twin state (see class docstring)
        self.sparse = (self.w > 64) if sparse is None else bool(sparse)
        self._sp_row = np.full(ns3, -1, np.int64)   # sid -> content row
        self._sp_own = np.zeros(ns3, bool)          # row owned (not canon)
        self._sp_free = []
        self._sp_next = 0
        self._sp_cap = 0
        self._sp_host = None                        # u32[cap,7,128] mirror
        self._sp_canon = {}                         # row bytes -> row
        self._sp_dirty_rows = set()
        self._sp_dirty_sids = set()
        self._sp_dirty_w = set()
        self._sp_widx = np.zeros((nw3, 128), np.uint32)
        self._sp_widx[:, 64:] = 0xFFFFFFFF
        self._sp_dev = None
        self._sp_wdev = None

    # ------------------------------------------------------------ updates

    def _sw_ids_for_cell(self, cell):
        """Global subwindow row ids for a chunk cell, in chunk-major
        (sz,sy,sx) order matching chunk_batch_sw_data."""
        cx, cy, cz = cell
        out = []
        for sz in range(2):
            for sy in range(2):
                for sx in range(2):
                    X = cx * 2 + sx
                    Y = cy * 2 + sy
                    Z = cz * 2 + sz
                    out.append(X + Y * self.ns + Z * self.ns * self.ns)
        return out

    def set_chunks(self, cells, grids_packids):
        """Install/replace chunk contents. ``cells``: [(cx,cy,cz) window
        -local chunk coords]; ``grids_packids``: [B,32,32,32] pack ids."""
        if not len(cells):
            return
        rg = self.to_render[np.asarray(grids_packids, np.int64)]
        data = chunk_batch_sw_data(rg, self.n_liquid, self.to_pack)
        if not data["palettes_ok"]:
            self.palettes_ok = False
            log.warning(
                "subwindow palette overflow (>16 solid ids in a 16^3 "
                "region): overflow voxels render with the most-frequent "
                "palette entry on the fused path (exact consumers should "
                "use the one-shot host builder, whose gather fallback has "
                "real brick tables)"
            )
        sids = np.asarray(
            [self._sw_ids_for_cell(c) for c in cells], np.int64
        ).ravel()                                    # [B*8] row-aligned
        self.sw_solid[sids] = data["sw_solid"]
        self.sw_liq[sids] = data["sw_liq"]
        self.sw_meta[sids] = data["sw_meta"]
        self.sw_pid[sids] = data["sw_pid"]
        self.s_any_solid[sids] = data["any_solid"]
        self.s_all_liq[sids] = data["all_liq"]
        self.s_any_liq[sids] = data["any_liq"]
        self._dirty_sw.update(sids.tolist())
        self._dirty_sw_pack.update(sids.tolist())
        self._sp_dirty_sids.update(sids.tolist())
        for cx, cy, cz in cells:
            w = (cx // 2) + (cy // 2) * self.nw + (cz // 2) * self.nw ** 2
            self._dirty_w.add(w)
            self._dirty_w_pack.add(w)
            self._sp_dirty_w.add(w)

    def clear_cells(self, cells):
        """Evicted chunks become air."""
        for cell in cells:
            for sid in self._sw_ids_for_cell(cell):
                self.sw_solid[sid] = 0
                self.sw_liq[sid] = 0
                self.sw_meta[sid] = 0
                self.sw_pid[sid] = 0
                self.s_any_solid[sid] = False
                self.s_all_liq[sid] = False
                self.s_any_liq[sid] = False
                self._dirty_sw.add(sid)
                self._dirty_sw_pack.add(sid)
                self._sp_dirty_sids.add(sid)
            cx, cy, cz = cell
            w = (cx // 2) + (cy // 2) * self.nw + (cz // 2) * self.nw ** 2
            self._dirty_w.add(w)
            self._dirty_w_pack.add(w)
            self._sp_dirty_w.add(w)

    # ------------------------------------------------------------ windows

    def _window_meta(self, wids):
        """Recompute wmeta rows + window flags from subwindow flags."""
        ns, nw = self.ns, self.nw
        for w in wids:
            wx, wy, wz = w % nw, (w // nw) % nw, w // (nw * nw)
            sids = np.empty(64, np.int64)
            i = 0
            for sz in range(4):
                for sy in range(4):
                    for sx in range(4):
                        X = wx * 4 + sx
                        Y = wy * 4 + sy
                        Z = wz * 4 + sz
                        sids[i] = X + Y * ns + Z * ns * ns
                        i += 1
            a_sol = self.s_any_solid[sids]
            a_all = self.s_all_liq[sids]
            a_any = self.s_any_liq[sids]
            s_jump = ~a_sol & (a_all | ~a_any)
            self.wmeta[w, 0:2] = _pack_bits_np(s_jump.reshape(1, 64))
            self.wmeta[w, 2:4] = _pack_bits_np(a_all.reshape(1, 64))

    def _global_planes(self):
        ns, nw = self.ns, self.nw

        def win_flags(sflags, op):
            t = sflags.reshape(ns, ns, ns)            # rows are (Z,Y,X)!
            # s_* arrays are indexed sid = X + Y*ns + Z*ns² -> reshape
            # gives (Z,Y,X); reduce windows in that order, then flatten to
            # wid = X + Y*nw + Z*nw² the same way.
            t = t.reshape(nw, 4, nw, 4, nw, 4)        # (Z,sz, Y,sy, X,sx)
            return op(t, (1, 3, 5)).reshape(-1)       # (Z,Y,X) flat

        w_any_solid = win_flags(self.s_any_solid, np.ndarray.any)
        w_all_liq = win_flags(self.s_all_liq, np.ndarray.all)
        w_any_liq = win_flags(self.s_any_liq, np.ndarray.any)
        w_jump = ~w_any_solid & (w_all_liq | ~w_any_liq)

        # shared super-cell reduction (no-op packing at <=16 windows) so
        # the two builders can't drift on the >32-chunk format
        return _super_gplanes_np(w_jump, w_jump & w_all_liq, nw)

    # ------------------------------------------------------------- upload

    def grid(self) -> RenderGrid3:
        """Current device RenderGrid3; uploads only dirty rows.

        Identity-stable: consecutive calls with no intervening edits
        return the SAME NamedTuple object, so callers can key derived
        tokens (e.g. :func:`~..ops.wavefront4.prepare_grid4` packed
        tables) on grid identity and re-derive only after real changes.
        """
        if (
            self._cached_rg is not None
            and not self._dirty_sw
            and not self._dirty_w
            and not self._rebuild_all_windows
        ):
            return self._cached_rg
        if self._dirty_w or self._rebuild_all_windows:
            wids = (range(self.nw ** 3) if self._rebuild_all_windows
                    else sorted(self._dirty_w))
            self._window_meta(wids)
            self._rebuild_all_windows = False
        gw_jump, gw_liq = self._global_planes()

        if self.sparse:
            # sparse mode: the dense device planes would be ~15 GB at an
            # 80-chunk window — never materialize them. Consumers render
            # through prepared() (sparse token); raw planes are tiny
            # placeholders that prepacked executables prune.
            self._dirty_sw.clear()
            self._dirty_w.clear()
            z128 = jnp.zeros((1, 128), jnp.uint32)
            self._cached_rg = RenderGrid3(
                gw_jump=jnp.asarray(gw_jump),
                gw_liq=jnp.asarray(gw_liq),
                wmeta=jnp.zeros((1, 8), jnp.uint32),
                sw_meta=jnp.zeros((1, 8), jnp.uint32),
                sw_solid=z128,
                sw_liq=z128,
                sw_pid=jnp.zeros((1, 4, 128), jnp.uint32),
                brick_dir=jnp.zeros(1, jnp.int32),
                bricks=jnp.zeros((1, 16), jnp.uint32),
                world_min=jnp.asarray(self.world_min, jnp.int32),
                to_pack=jnp.asarray(self.to_pack),
                n_liquid=jnp.asarray(np.int32(self.n_liquid)),
                size_voxels=self.v,
                palettes_ok=self.palettes_ok,
            )
            return self._cached_rg

        if self._dev is None:
            self._dev = dict(
                sw_solid=jnp.asarray(self.sw_solid),
                sw_liq=jnp.asarray(self.sw_liq),
                sw_meta=jnp.asarray(self.sw_meta),
                sw_pid=jnp.asarray(self.sw_pid),
                wmeta=jnp.asarray(self.wmeta),
            )
        else:
            if self._dirty_sw:
                rows = np.asarray(sorted(self._dirty_sw), np.int32)
                d = self._dev
                for name, host in (
                    ("sw_solid", self.sw_solid), ("sw_liq", self.sw_liq),
                    ("sw_meta", self.sw_meta), ("sw_pid", self.sw_pid),
                ):
                    d[name] = _scatter_rows(
                        d[name], jnp.asarray(rows), jnp.asarray(host[rows])
                    )
            if self._dirty_w:
                rows = np.asarray(sorted(self._dirty_w), np.int32)
                self._dev["wmeta"] = _scatter_rows(
                    self._dev["wmeta"], jnp.asarray(rows),
                    jnp.asarray(self.wmeta[rows]),
                )
        self._dirty_sw.clear()
        self._dirty_w.clear()

        zeros_i = jnp.zeros(1, jnp.int32)
        zeros_b = jnp.zeros((1, 16), jnp.uint32)
        self._cached_rg = RenderGrid3(
            gw_jump=jnp.asarray(gw_jump),
            gw_liq=jnp.asarray(gw_liq),
            wmeta=self._dev["wmeta"],
            sw_meta=self._dev["sw_meta"],
            sw_solid=self._dev["sw_solid"],
            sw_liq=self._dev["sw_liq"],
            sw_pid=self._dev["sw_pid"],
            brick_dir=zeros_i,   # gather fallback unused when palettes_ok
            bricks=zeros_b,
            world_min=jnp.asarray(self.world_min, jnp.int32),
            to_pack=jnp.asarray(self.to_pack),
            n_liquid=jnp.asarray(np.int32(self.n_liquid)),
            size_voxels=self.v,
            palettes_ok=self.palettes_ok,
        )
        return self._cached_rg

    # --------------------------------------------------- sparse twin

    def _sp_alloc(self):
        if self._sp_free:
            return self._sp_free.pop()
        r = self._sp_next
        self._sp_next += 1
        if r >= self._sp_cap:
            new_cap = max(self._sp_cap * 2, 4096)
            host = np.zeros((new_cap, 7, 128), np.uint32)
            if self._sp_host is not None:
                host[: self._sp_cap] = self._sp_host
            self._sp_host = host
            self._sp_cap = new_cap
            self._sp_dev = None      # full re-upload on next prepared()
        return r

    def _sp_row_content(self, sid):
        row = np.zeros((7, 128), np.uint32)
        row[0] = self.sw_solid[sid]
        row[1] = self.sw_liq[sid]
        row[2:6] = self.sw_pid[sid]
        row[6, :8] = _interleave_meta_np(self.sw_meta[sid:sid + 1])[0]
        return row

    def prepared_sparse(self):
        """Sparse v4 packed tables (PreparedGrid4Sparse) — see the class
        docstring. Content rows: one per non-jump subwindow, with
        all-solid rows deduplicated to shared canonical rows (buried
        volume collapses to ~#distinct materials); window-meta rows
        carry the 64 member subwindows' row indices in lanes 64-127."""
        from ..ops.wavefront4 import PreparedGrid4Sparse

        self.grid()  # refresh window metas + per-sw flags first
        ns, nw = self.ns, self.nw
        for sid in sorted(self._sp_dirty_sids):
            jump = (not self.s_any_solid[sid]) and (
                self.s_all_liq[sid] or not self.s_any_liq[sid])
            old = int(self._sp_row[sid])
            owned = bool(self._sp_own[sid])
            if jump:
                new, own = -1, False
            else:
                row = self._sp_row_content(sid)
                all_solid = bool((row[0] == 0xFFFFFFFF).all())
                key = row.tobytes() if all_solid else None
                if key is not None and (
                    key in self._sp_canon or len(self._sp_canon) < 4096
                ):
                    r = self._sp_canon.get(key)
                    if r is None:
                        r = self._sp_alloc()
                        c = row.copy()
                        c[6, 8] = np.uint32(_CANON_STAMP)
                        self._sp_host[r] = c
                        self._sp_dirty_rows.add(r)
                        self._sp_canon[key] = r
                    new, own = r, False
                else:
                    r = old if (owned and old >= 0) else self._sp_alloc()
                    row[6, 8] = np.uint32(sid)
                    self._sp_host[r] = row
                    self._sp_dirty_rows.add(r)
                    new, own = r, True
            if new != old or own != owned:
                if owned and old >= 0 and old != new:
                    self._sp_free.append(old)
                self._sp_row[sid] = new
                self._sp_own[sid] = own
                sx, sy, sz = sid % ns, (sid // ns) % ns, sid // (ns * ns)
                self._sp_dirty_w.add(
                    (sx >> 2) + (sy >> 2) * nw + (sz >> 2) * nw * nw
                )
        self._sp_dirty_sids.clear()

        l = np.arange(64)
        for w in sorted(self._sp_dirty_w):
            self._sp_widx[w, :8] = _interleave_meta_np(
                self.wmeta[w:w + 1])[0]
            self._sp_widx[w, 8:64] = 0
            wx, wy, wz = w % nw, (w // nw) % nw, w // (nw * nw)
            X = wx * 4 + (l & 3)
            Y = wy * 4 + ((l >> 2) & 3)
            Z = wz * 4 + (l >> 4)
            rows = self._sp_row[X + Y * ns + Z * ns * ns]
            self._sp_widx[w, 64:] = np.where(
                rows >= 0, rows, 0xFFFFFFFF
            ).astype(np.uint32)
        dirty_w = sorted(self._sp_dirty_w)
        self._sp_dirty_w.clear()

        if self._sp_host is None:
            self._sp_cap = 16
            self._sp_host = np.zeros((16, 7, 128), np.uint32)
        if self._sp_dev is None:
            self._sp_dev = jnp.asarray(self._sp_host)
            self._sp_dirty_rows.clear()
            self._sp_wdev = jnp.asarray(self._sp_widx[:, None, :])
        else:
            if self._sp_dirty_rows:
                rows = np.asarray(sorted(self._sp_dirty_rows), np.int32)
                self._sp_dev = _scatter_rows3(
                    self._sp_dev, jnp.asarray(rows),
                    jnp.asarray(self._sp_host[rows]),
                )
                self._sp_dirty_rows.clear()
            if dirty_w:
                rows = np.asarray(dirty_w, np.int32)
                self._sp_wdev = _scatter_rows3(
                    self._sp_wdev, jnp.asarray(rows),
                    jnp.asarray(self._sp_widx[rows][:, None, :]),
                )
        return PreparedGrid4Sparse(self._sp_dev, self._sp_wdev, self.ns)

    def sparse_tables_mb(self):
        """Device footprint of the sparse tables (content + window rows)."""
        if self._sp_dev is None:
            return 0.0
        return (self._sp_dev.size + self._sp_wdev.size) * 4 / 1e6

    def prepared(self):
        """Incrementally-maintained v4 packed tables (PreparedGrid4).

        The one-shot :func:`~..ops.wavefront4.prepare_grid4` repacks the
        WHOLE sw_cont table on any world change (~6.7 ms/frame at
        1080p-scale windows — the flythrough bottleneck, config4c). Each
        packed row is a pure function of the same raw row, so this twin
        repacks only the rows a chunk install/edit/eviction touched and
        scatters them in place (donated buffers). Bit-identical to the
        one-shot packer (tests/test_engine_app.py pins it).

        In sparse mode this returns the sparse token instead."""
        if self.sparse:
            return self.prepared_sparse()
        from ..ops.wavefront4 import PreparedGrid4, prepare_grid4

        rg = self.grid()  # refresh window metas before packing them
        if self._prep is None:
            self._prep = prepare_grid4(rg)
            self._dirty_sw_pack.clear()
            self._dirty_w_pack.clear()
            return self._prep
        sw_cont, wmeta_pad = self._prep
        if self._dirty_sw_pack:
            rows = np.asarray(sorted(self._dirty_sw_pack), np.int32)
            sw_cont = _scatter_pack_sw(
                sw_cont, jnp.asarray(rows),
                jnp.asarray(self.sw_solid[rows]),
                jnp.asarray(self.sw_liq[rows]),
                jnp.asarray(self.sw_pid[rows]),
                jnp.asarray(self.sw_meta[rows]),
            )
            self._dirty_sw_pack.clear()
        if self._dirty_w_pack:
            rows = np.asarray(sorted(self._dirty_w_pack), np.int32)
            wmeta_pad = _scatter_pack_w(
                wmeta_pad, jnp.asarray(rows),
                jnp.asarray(self.wmeta[rows]),
            )
            self._dirty_w_pack.clear()
        self._prep = PreparedGrid4(sw_cont, wmeta_pad)
        return self._prep

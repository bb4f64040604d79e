"""Self-serving march kernel (v4) — in-kernel service over HBM tables.

v3 (ops/wavefront3.py) alternates a Pallas march sweep with an XLA service
pass per round: the host round loop relaunches ~T/64 grid programs (~6 µs
each, idle or not) and stages cache inserts as ~40 small launch-bound XLA
ops — together the large majority of frame time on this runtime (the march
compute itself is cheap). v4 moves the service *into* the kernel:

  * the combined subwindow content table (``sw_cont`` [Ns³,7,128]: solid |
    liquid | 4 palette planes | meta) and the padded window-meta table
    (``wmeta_pad`` [Nw³,1,128]) stay in HBM (``pl.ANY``);
  * each block program runs the whole frame's round loop itself: march
    until every lane stalls (with a fixed-point early exit inside each
    sub-round), pick up to ``s_ins`` distinct stalled subwindow ids +
    ``w_ins`` window ids (scalar min-chains, or one vectorized per-group
    min with ``grouped=True``), fetch them with batched
    ``make_async_copy`` DMAs into VMEM cache slots, merge, and keep
    marching until the block's rays are all done. Window metas are
    fetched BEFORE subwindow picks so a two-level-cold ray clears in one
    round; jump/liquid meta bits ride interleaved so one gather serves
    both flags per level;
  * ONE kernel launch per block per frame — no idle-round relaunches and
    no XLA staging: a converged block's program simply exits;
  * optional warm-start token (``cache``/``return_cache``): an
    i32[nB,2,128] plane of the previous frame's per-block cache IDS,
    prefetched in one DMA wave at round 0. Contents are always
    re-fetched, so world edits are safe and warm frames are bit-exact.

March semantics (classification, DDA exit + EPS nudge, water interval,
step cap) are identical to v3 — the executable spec of the reference
kernel (ray_tracer.wgsl:182-291). Agreement with the v3/SVO tracers is
pinned by tests/test_wavefront4.py.

Round-4 machinery (all pixel-exact by construction or by test):

  * ``wm_full`` — for worlds <=128 windows the whole interleaved
    window-meta table rides in VMEM (16 windows per 128-lane row): no
    window cache, serving, or warm restore at all;
  * ``fused_shadow`` — with ``fused=True, shadows=True`` the hard-shadow
    leg (ray_tracer's shade consumes it; _shadow_prep4 semantics) runs
    INSIDE the primary launch: hit rays rebase toward the sun and
    re-march on the primary leg's warm cache (one launch per frame,
    measured +6.6% at 720p vs the split dispatches);
  * ``_bounce_retry4`` / ``_primary_retry4`` — cap + tile-compacted
    resume for straggler re-batching. Bit-exact ONLY when the capacity
    covers every straggler tile; on real frames the "stragglers" under
    aggressive caps are 15% of pixels, so shipped configs use full
    budgets and the retry only as a convergence CLEANUP pass;
  * ``spin_ramp`` — in-kernel spin budget grows with the round index
    (serve-bound early, step-bound late); schedule-only;
  * SPARSE tables (``PreparedGrid4Sparse``) — see its docstring; covers
    the reference's 80-chunk window slider (ui.rs:165).

CAUTION (axon runtime): a long in-kernel DMA loop is the pattern that once
wedged the device tunnel (experiments/v35_virt_probe.py; see
docs/TPU_NOTES.md). v4 avoids that probe's grid=(1,) virtualization and
input_output_aliases, but on real hardware: compile first, then run a tiny
frame under a timeout before trusting it with a session.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
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
)
from .wavefront3 import (
    _BIGI,
    _BLK,
    _FL_AX,
    _FL_HIT,
    _FL_SGN,
    _FL_STP,
    _FL_VOX,
    _FL_BIAS,
    N_SC,
    N_WC,
    SW,
    WIN,
    RenderGrid3,
    _cam_scal,
    _gs_for,
    _interpret_default,
    _ray_dirs,
    _sb_dims,
    _tile_hw,
    _tile_valid,
    _untile_hw,
)

def _gather8(mrow, idx):
    """Lane gather on a [1,128] row.

    Mosaic rejects 1-sublane gathers ("Shape mismatch in input, indices
    and output"); broadcast both operands to 8 sublanes and slice back
    (docs/TPU_NOTES.md: lane gathers need >=8 sublanes).
    """
    src = jnp.take_along_axis(
        jnp.broadcast_to(mrow, (8, 128)),
        jnp.broadcast_to(idx, (8, 128)),
        axis=1,
    )
    return src[0:1]


def _spread16(v):
    """Spread the low 16 bits of each u32 to the even bit positions."""
    u32 = jnp.uint32
    v = v.astype(u32) & u32(0xFFFF)
    v = (v | (v << 8)) & u32(0x00FF00FF)
    v = (v | (v << 4)) & u32(0x0F0F0F0F)
    v = (v | (v << 2)) & u32(0x33333333)
    return (v | (v << 1)) & u32(0x55555555)


def _interleave_gw(gw_jump, gw_liq):
    """(jump|liquid)-pair global plane: bit i of word w in each input
    becomes bits 2i/2i+1 of flat word 2w+(i>=16). Returned as [2,128]
    rows (row 0 = flat words 0..127 = windows 0..2047). When nw³ <= 2048
    the whole plane lives in row 0, so ONE in-kernel lane gather at word
    w>>4, shift (w&15)*2 serves both flags (see _march_kernel4 gw_pair)."""
    lo = _spread16(gw_jump) | (_spread16(gw_liq) << 1)
    hi = _spread16(gw_jump >> 16) | (_spread16(gw_liq >> 16) << 1)
    flat = jnp.stack([lo, hi], axis=-1).reshape(gw_jump.shape[0], 256)
    return flat.reshape(2, 128)


def _interleave_meta(m):
    """Meta words 0-1 (jump bits) + 2-3 (liquid bits) -> words 0-3
    with bit 2i = jump_i, 2i+1 = liq_i: ONE kernel gather yields both
    flags (the v4-only wire layout; words 4+ pass through)."""
    u32 = jnp.uint32

    def spread16(v):
        v = v.astype(u32) & u32(0xFFFF)
        v = (v | (v << 8)) & u32(0x00FF00FF)
        v = (v | (v << 4)) & u32(0x0F0F0F0F)
        v = (v | (v << 2)) & u32(0x33333333)
        return (v | (v << 1)) & u32(0x55555555)

    j, l = m[:, 0:2], m[:, 2:4]
    out = jnp.stack(
        [
            spread16(j[:, 0]) | (spread16(l[:, 0]) << 1),
            spread16(j[:, 0] >> 16) | (spread16(l[:, 0] >> 16) << 1),
            spread16(j[:, 1]) | (spread16(l[:, 1]) << 1),
            spread16(j[:, 1] >> 16) | (spread16(l[:, 1] >> 16) << 1),
        ],
        axis=1,
    )
    return jnp.concatenate([out, m[:, 4:]], axis=1)


def _wm_full_rows(nw, sparse_ns=0):
    """Rows of the in-VMEM full window-meta table, or 0 to use the
    dynamic window cache. Enabled for small worlds (<=128 windows, i.e.
    <=32-chunk axes at 8 rows of unrolled row-select per classify):
    kills window-meta serving entirely — the serve bottleneck on
    incoherent (bounce/shadow) legs, whose blocks fan across dozens of
    windows against an 8-slot cache fed 2 metas per round."""
    if sparse_ns:
        return 0
    n3 = nw * nw * nw
    return -(-n3 // 16) if n3 <= 128 else 0


S_INS = 16  # default subwindow fetches per in-kernel service round
#             (= N_SC: serve() only runs when NO ray can march, so a
#             full-cache replacement evicts only rows nothing can use
#             right now; measured 64->24 rounds to converge)
W_INS = 2   # default window-meta fetches per in-kernel service round


def _march_kernel4(
    *refs, sub_rounds, sub_steps, rounds_cap, nw, ns, nsx, per_ray,
    s_ins, w_ins, grouped=False, warm=False, n_sc=N_SC, gw_pair=False,
    fused=False, show_steps=False, warm_pre=False, s_seg=1, vb=1,
    warm_seg=1, fused_flags=True, fused_shadow=False, sparse=False,
    wm_full=0, spin_ramp=0,
):
    """One self-serving block program. Ref order:

    scal_ref  SMEM f32[27] (as v3: origin, v, proj, cam affine, y0,
              srd | step-cap | init | tx | ty); with ``fused`` the row
              extends to f32[43] with the shade params at the v3 shade
              kernel's indices (27-29 sun_dir, 30 intensity, 31-33 sky)
    gw_ref    VMEM u32[2,128]: global window jump | liquid bit rows;
              with ``gw_pair`` (nw³ <= 2048) row 0 holds the
              (jump|liquid)-interleaved pair plane instead — one lane
              gather per step serves both flags (5 gathers/step, not 6)
    (fused)   lut_ref VMEM f32[6,128]: color LUT rows r0 r1 g0 g1 b0 b1
    sw_cont   ANY  u32[Ns³,7,128]: per-subwindow content (DMA source)
    wmeta_pad ANY  u32[Nw³,1,128]: per-window meta words 0-7 (DMA source)
    (per_ray) rays_ref VMEM f32[6,BLK,128]
    st_ref    VMEM f32[4,BLK,128]: ts | flags | wa | we (absent when
              ``fused``: primary rays are synthesized in-kernel and no
              state plane is streamed at all)
    st_o      same 4 planes out; with ``fused`` instead pk_o u32[BLK,128]
              (packed RGBA8, shaded in-kernel) + fl_o i32[BLK,128]
    scratch:  stage u32[S_INS,7,128], wstage u32[W_INS,1,128],
              ssem DMA[S_INS], wsem DMA[W_INS],
              csol u32[N_SC,128], cliq u32[N_SC,128], cpid u32[4*N_SC,128]

    ``fused`` shades the march products in the same program — the
    reference kernel's trace-AND-shade-in-one-pass shape
    (ray_tracer.wgsl:173-316) — skipping the whole state-plane HBM
    round-trip and the separate shade dispatch. Primary-only (no
    per-ray bundles), no shadows.
    """
    assert not (fused and per_ray), "fused shade is primary-only"
    assert not (fused_shadow and not fused), "fused_shadow needs fused"
    refs = list(refs)
    scal_ref = refs.pop(0)
    gw_ref = refs.pop(0)
    wmf_ref = refs.pop(0) if wm_full else None
    lut_ref = refs.pop(0) if fused else None
    swc_ref = refs.pop(0)
    wmp_ref = refs.pop(0)
    rays_ref = refs.pop(0) if per_ray else None
    warm_ref = refs.pop(0) if warm else None
    # hoisted warm-cache planes: the previous frame's cache CONTENTS,
    # row-gathered by XLA outside the kernel and streamed in as ordinary
    # pipelined block inputs — zero in-kernel DMA issue/wait cost at
    # round 0 (the ~24 us/program floor was mostly this prefetch wave)
    swcw_ref = refs.pop(0) if (warm and warm_pre) else None
    wmpw_ref = refs.pop(0) if (warm and warm_pre) else None
    st_ref = None if fused else refs.pop(0)
    if fused:
        pk_o = refs.pop(0)
        fl_o = refs.pop(0) if fused_flags else None
        st_o = None
    else:
        pk_o = fl_o = None
        st_o = refs.pop(0)
    ids_o = refs.pop(0) if warm else None
    stage, wstage, ssem, wsem, csol, cliq, cpid, widx = refs
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    v = scal_ref[3]
    bigi = jnp.int32(_BIGI)

    if st_ref is not None:
        blk = st_ref.shape[1] // vb
    else:
        blk = pk_o.shape[0] // vb
    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)
    lane_row = jax.lax.broadcasted_iota(i32, (1, 128), 1)
    gj_row = jnp.broadcast_to(gw_ref[0:1, :], (blk, 128))
    gl_row = jnp.broadcast_to(gw_ref[1:2, :], (blk, 128))

    def bit_of(row, word_i, sh, bounded=False):
        # ``bounded``: the index is structurally < 128 (e.g. l>>5 with
        # l <= 4095) even for garbage lane values — skip the clip.
        wi = word_i if bounded else jnp.clip(word_i, 0, 127)
        wd = jnp.take_along_axis(row, wi, axis=1)
        return ((wd >> sh.astype(u32)) & 1).astype(i32)

    def pair_of(row, word_i, sh, bounded=False):
        wi = word_i if bounded else jnp.clip(word_i, 0, 127)
        wd = jnp.take_along_axis(row, wi, axis=1)
        return ((wd >> sh.astype(u32)) & 3).astype(i32)

    # ---- cache state carried through the round loop -------------------
    # wid_all/sid_all: [N,128] i32, row k = slot k's id broadcast across
    # lanes (update = one 2D where; classify reads row k statically — no
    # in-loop lane gathers at all). wm_row/sm_row: packed meta rows
    # exactly as v3's mc rows 2-3 (slot k words at lanes k*8..k*8+8).
    wid0 = jnp.full((N_WC, 128), -1, i32)
    sid0 = jnp.full((n_sc, 128), -1, i32)
    wm0 = jnp.zeros((1, 128), u32)
    # subwindow meta rows: 8 words per slot, 16 slots per 128-lane row;
    # carried as a fixed [8,128] plane (supports n_sc up to 128)
    n_smr = max(n_sc // 16, 1)
    sm0 = jnp.zeros((8, 128), u32)
    wrow_iota = jax.lax.broadcasted_iota(i32, (N_WC, 128), 0)
    srow_iota = jax.lax.broadcasted_iota(i32, (n_sc, 128), 0)
    smrow_iota = jax.lax.broadcasted_iota(i32, (8, 128), 0)
    lane8 = jax.lax.broadcasted_iota(i32, (8, 128), 1)

    def sm_sel(sm_rows, tslot):
        """Per-tile meta row: each tile reads its slot's 16-slot row."""
        sm_b = jnp.broadcast_to(sm_rows[0:1], (blk, 128))
        for r in range(1, n_smr):
            sm_b = jnp.where(
                (tslot >> 4) == r,
                jnp.broadcast_to(sm_rows[r:r + 1], (blk, 128)), sm_b,
            )
        return sm_b

    def sm_merge(sm_rows, mrow, slot, ok):
        """Insert slot's 8 meta words (lanes 0-7 of mrow) into the [8,128]
        sm plane at row slot>>4, lanes (slot&15)*8.."""
        slot8 = (slot & 15) * 8
        src = jnp.take_along_axis(
            jnp.broadcast_to(mrow, (8, 128)),
            jnp.clip(lane8 - slot8, 0, 127), axis=1,
        )
        sel = (
            (lane8 >= slot8) & (lane8 < slot8 + 8)
            & (smrow_iota == (slot >> 4)) & ok
        )
        return jnp.where(sel, src, sm_rows)

    gs = _gs_for(nw)                      # global-plane super-cell shift
    nwg = (nw + (1 << gs) - 1) >> gs

    # ``vb`` sub-blocks are virtualized into one grid program (python-
    # unrolled): the ~16 us/program pipeline setup amortizes over vb
    # independent round loops, which was ~30% of a warm 1080p frame
    # (sky-floor probe: ~4.2 ms/frame of per-program setup at 254
    # programs). Each sub-block is a full independent march (own rays,
    # own cache state); scratch buffers are reused serially.
    def do_block(sb):
        s0 = sb * blk
        if st_ref is not None:
            ts_ref = st_ref[0, s0:s0 + blk]
            fl_in = jax.lax.bitcast_convert_type(
                st_ref[1, s0:s0 + blk], i32) - _FL_BIAS
            wa_ref = st_ref[2, s0:s0 + blk]
            we_ref = st_ref[3, s0:s0 + blk]
        if per_ray:
            ox = rays_ref[0, s0:s0 + blk]
            oy = rays_ref[1, s0:s0 + blk]
            oz = rays_ref[2, s0:s0 + blk]
            dx = rays_ref[3, s0:s0 + blk]
            dy = rays_ref[4, s0:s0 + blk]
            dz = rays_ref[5, s0:s0 + blk]
            tg = None
        else:
            ox = scal_ref[0]
            oy = scal_ref[1]
            oz = scal_ref[2]
            rows = jax.lax.broadcasted_iota(i32, (blk, 128), 0)
            tg = pl.program_id(0) * (vb * blk) + s0 + rows
            scal_v = [scal_ref[i] for i in range(24)]
            dx, dy, dz = _ray_dirs(scal_v, tg, lanes, nsx)

        cap_f = scal_ref[23]
        step_cap = jnp.where(cap_f > 0.5, cap_f, jnp.float32(1e9)).astype(i32)

        # ---- march machinery, parameterized by the leg's rays --------
        # (a second call builds the fused SHADOW leg's closures over the
        # same cache scratch — rays differ, the service cache carries)
        def leg_ctx(ox, oy, oz, dx, dy, dz):
            return _make_leg(ox, oy, oz, dx, dy, dz)

        def _make_leg(ox, oy, oz, dx, dy, dz):
            def inv(c):
                c2 = jnp.where(
                    c >= 0, jnp.maximum(c, 1e-7), jnp.minimum(c, -1e-7))
                return 1.0 / c2

            ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
            sx = (dx > 0.0).astype(f32)
            sy = (dy > 0.0).astype(f32)
            sz = (dz > 0.0).astype(f32)
        # per-ray DDA constants hoisted out of the step loop: the signed
        # form folds axis()'s floor/ceil select into one floor —
        # floor((-q)) + 1 == -(ceil(q) - 1) and (-a)*(-b) == a*b are
        # exact in IEEE, so dt is bit-identical to the selected form
            sgfx = sx + sx - 1.0                     # ±1 exactly
            sgfy = sy + sy - 1.0
            sgfz = sz + sz - 1.0
            ivsx, ivsy, ivsz = ivx * sgfx, ivy * sgfy, ivz * sgfz
            big_iv = 0.99 * _BIG_IV
            bigx = jnp.abs(ivx) >= big_iv            # axis-parallel guard,
            bigy = jnp.abs(ivy) >= big_iv            # constant per ray
            bigz = jnp.abs(ivz) >= big_iv

            def slab(oc, ivc):
                return jnp.maximum((0.0 - oc) * ivc, (v - oc) * ivc)

            t_cap = 4.0 * v + 16.0
            t_exit = jnp.minimum(
                jnp.minimum(slab(ox, ivx), jnp.minimum(slab(oy, ivy), slab(oz, ivz))),
                t_cap,
            )

            def classify(t, wid_all, sid_all, wm_row, need_sslot=True):
                px = ox + dx * t
                py = oy + dy * t
                pz = oz + dz * t
                vx = jnp.floor(px).astype(i32)
                vy = jnp.floor(py).astype(i32)
                vz = jnp.floor(pz).astype(i32)

                w = (vx >> 6) + (vy >> 6) * nw + (vz >> 6) * nw * nw
                if gs:
                    # >16-window worlds: global-plane bits are 2^gs-window
                    # super-cells (wavefront3._gs_for) on a 16³-capped grid
                    wg = (
                        (vx >> (6 + gs)) + (vy >> (6 + gs)) * nwg
                        + (vz >> (6 + gs)) * nwg * nwg
                    )
                else:
                    wg = w
                if gw_pair:
                    g_bits = pair_of(gj_row, wg >> 4, (wg & 15) * 2)
                    g_jump = (g_bits & 1) != 0
                    g_liq = (g_bits & 2) != 0
                else:
                    g_jump = bit_of(gj_row, wg >> 5, wg & 31) != 0
                    g_liq = bit_of(gl_row, wg >> 5, wg & 31) != 0

                s_loc = (
                    ((vx >> 4) & 3) + ((vy >> 4) & 3) * 4 + ((vz >> 4) & 3) * 16
                )
                if wm_full:
                    # the WHOLE window-meta table rides in VMEM (small
                    # worlds: nw³*8 words <= wm_full*128): no window
                    # cache, no window serving, no meta starvation on
                    # incoherent legs. Row (w>>4) holds window w's 8
                    # words at lanes (w&15)*8.. — select the row by an
                    # unrolled chain, then one lane gather.
                    wslot = jnp.zeros((blk, 128), i32)  # always "cached"
                    wrow = w >> 4
                    wm_b = jnp.broadcast_to(wmf_ref[0:1], (blk, 128))
                    for r in range(1, wm_full):
                        wm_b = jnp.where(
                            wrow == r,
                            jnp.broadcast_to(wmf_ref[r:r + 1], (blk, 128)),
                            wm_b,
                        )
                    mbase = (w & 15) * 8 + (s_loc >> 4)
                    sw_pair = pair_of(wm_b, mbase, (s_loc & 15) * 2,
                                      bounded=True)
                else:
                    wslot = jnp.full((blk, 128), -1, i32)
                    for k in range(N_WC):
                        wid_k = wid_all[k:k + 1, :]
                        wslot = jnp.where(
                            (w == wid_k) & (wid_k >= 0), i32(k), wslot)

                    # interleaved meta (see _interleave_meta): bit 2i
                    # jump, 2i+1 liq of subwindow i — one gather for
                    # both flags. mbase <= 7*8+3 < 128 structurally
                    # (wslot < N_WC, s_loc < 64), so the clip is skipped.
                    mbase = jnp.maximum(wslot, 0) * 8 + (s_loc >> 4)
                    wm_b = jnp.broadcast_to(wm_row, (blk, 128))
                    sw_pair = pair_of(wm_b, mbase, (s_loc & 15) * 2,
                                      bounded=True)
                sw_jump = (sw_pair & 1) != 0
                sw_liq = (sw_pair & 2) != 0

                s = (vx >> 4) + (vy >> 4) * ns + (vz >> 4) * ns * ns
                sslot = jnp.full((blk, 128), -1, i32)
                if need_sslot:
                    for k in range(n_sc):
                        sid_k = sid_all[k:k + 1, :]
                        sslot = jnp.where((s == sid_k) & (sid_k >= 0), i32(k), sslot)

                return (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
                        sw_jump, sw_liq, s, sslot, s_loc)

            def boundary(t, active_i, wid_all, sid_all, wm_row):
                """Pick each tile's subwindow (min cached id) and compose its rows
                from the VMEM cache planes."""
                active = active_i != 0
                (_, _, _, _, _, _, _, g_jump, _, wslot, sw_jump, _, s,
                 sslot, _) = classify(t, wid_all, sid_all, wm_row)
                need = active & ~g_jump & (wslot >= 0) & ~sw_jump
                skey = jnp.where(need & (sslot >= 0), s, bigi)
                smin = jnp.min(skey, axis=1, keepdims=True)      # [BLK,1]
                tsid = jnp.where(smin < bigi, smin, -1)
                tslot = jnp.zeros((blk, 1), i32)
                solid_row = jnp.zeros((blk, 128), u32)
                liq_row = jnp.zeros((blk, 128), u32)
                pid_rows = [jnp.zeros((blk, 128), u32) for _ in range(4)]
                for k in range(n_sc):
                    sid_k = sid_all[k:k + 1, :1]                 # [1,1]
                    eq = (tsid == sid_k) & (sid_k >= 0)          # [BLK,1]
                    tslot = jnp.where(eq, i32(k), tslot)
                    solid_row = jnp.where(
                        eq, jnp.broadcast_to(csol[k:k + 1, :], (blk, 128)), solid_row
                    )
                    liq_row = jnp.where(
                        eq, jnp.broadcast_to(cliq[k:k + 1, :], (blk, 128)), liq_row
                    )
                    for b in range(4):
                        pid_rows[b] = jnp.where(
                            eq,
                            jnp.broadcast_to(
                                cpid[k * 4 + b:k * 4 + b + 1, :], (blk, 128)
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

            def step(c, rows_c, cch):
                wid_all, sid_all, wm_row, sm_row = cch
                tsid, tslot, solid_row, liq_row, pid_rows = rows_c
                t, active_i, hit_i, axmask, vox, water, wenter, stp = c
                active = (active_i != 0) & (t < t_exit)
                hit = hit_i != 0

                (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
                 sw_jump, sw_liq, s, _, _) = classify(
                    t, wid_all, sid_all, wm_row, need_sslot=False)

                inw = (
                    (px >= 0.0) & (py >= 0.0) & (pz >= 0.0)
                    & (px < v) & (py < v) & (pz < v)
                )
                active = active & inw & (stp < step_cap)

                at_ts = s == tsid
                # bbase <= 15*8+3 < 128 and l >> 5 <= 4095 >> 5 = 127 structurally
                # (even for garbage lanes: every term is &-masked), so the gather
                # clips are skipped (bounded=True).
                b_loc = ((vx >> 2) & 3) + ((vy >> 2) & 3) * 4 + ((vz >> 2) & 3) * 16
                bbase = (tslot & 15) * 8 + (b_loc >> 4)
                sm_b = sm_sel(sm_row, tslot)
                br_pair = pair_of(sm_b, bbase, (b_loc & 15) * 2, bounded=True)
                br_jump = (br_pair & 1) != 0
                br_liq = (br_pair & 2) != 0

                l = (vx & 15) + (vy & 15) * 16 + (vz & 15) * 256
                vsolid = bit_of(solid_row, l >> 5, l & 31, bounded=True) != 0
                vliq = bit_of(liq_row, l >> 5, l & 31, bounded=True) != 0

                case1 = active & g_jump
                case2 = active & ~g_jump & (wslot >= 0) & sw_jump
                case3 = active & ~g_jump & (wslot >= 0) & ~sw_jump & at_ts
                in_br = case3 & br_jump
                in_vox = case3 & ~br_jump
                hit_now = in_vox & vsolid
                march = case1 | case2 | in_br | (in_vox & ~vsolid)

                liq_i = jnp.where(
                    case1, g_liq.astype(i32),
                    jnp.where(
                        case2, sw_liq.astype(i32),
                        jnp.where(in_br, br_liq.astype(i32), vliq.astype(i32)),
                    ),
                )
                liquid = liq_i != 0

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

                def axis(pc, sgf, ivs, bigm):
                    ps = pc * sgf
                    b = jnp.floor(ps * icell) + 1.0
                    return jnp.where(bigm, f32(_BIG), (b * cell - ps) * ivs)

                dtx = axis(px, sgfx, ivsx, bigx)
                dty = axis(py, sgfy, ivsy, bigy)
                dtz = axis(pz, sgfz, ivsz, bigz)
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

                progressed = jnp.any(march | hit_now).astype(i32)
                return (t, active.astype(i32), hit.astype(i32), axmask, vox, water,
                        wenter, stp), progressed

            def decode_hits(c, tslot, pid_rows, sm_row):
                t, active_i, hit_i, axmask, vox, water, wenter, stp = c
                undec = (hit_i != 0) & (vox == 0)
                vx = jnp.floor(ox + dx * t).astype(i32)
                vy = jnp.floor(oy + dy * t).astype(i32)
                vz = jnp.floor(oz + dz * t).astype(i32)
                l = (vx & 15) + (vy & 15) * 16 + (vz & 15) * 256
                li, lsh = l >> 5, l & 31  # l <= 4095 structurally -> bounded gathers
                pidx = bit_of(pid_rows[0], li, lsh, bounded=True)
                pidx = pidx | (bit_of(pid_rows[1], li, lsh, bounded=True) << 1)
                pidx = pidx | (bit_of(pid_rows[2], li, lsh, bounded=True) << 2)
                pidx = pidx | (bit_of(pid_rows[3], li, lsh, bounded=True) << 3)
                sm_b = sm_sel(sm_row, tslot)
                pal_w = jnp.take_along_axis(
                    sm_b, jnp.clip((tslot & 15) * 8 + 4 + (pidx >> 2), 0, 127),
                    axis=1,
                )
                pid = ((pal_w >> ((pidx & 3).astype(u32) * 8)) & 0xFF).astype(i32)
                vox = jnp.where(undec, pid, vox)
                return (t, active_i, hit_i, axmask, vox, water, wenter, stp)

            # ---- in-kernel service --------------------------------------------
            def serve(t, active_i, cch, wctr, sctr):
                """Fetch up to W_INS window metas + S_INS subwindow rows for the
                block's stalled rays, window metas FIRST: subwindow stalls are
                re-derived against the freshly merged window metas, so a ray cold
                on both levels is fully served in ONE round (the meta row is 512 B
                — its DMA wait costs ~nothing next to saving a whole round)."""
                wid_all, sid_all, wm_row, sm_row = cch
                alive = (active_i != 0) & (t < t_exit)
                wpicks = []
                if not wm_full:          # else: meta table lives in VMEM
                    (_, _, _, _, _, _, w, g_jump, _, wslot, _, _, _, _,
                     _) = classify(t, wid_all, sid_all, wm_row,
                                   need_sslot=False)
                    wstall = alive & ~g_jump & (wslot < 0)
                    wkey = jnp.where(wstall, w, bigi)

                # distinct-min picks (scalar chains) + batched DMA starts
                for j in range(w_ins if not wm_full else 0):
                    wj = jnp.min(wkey)
                    ok = wj < bigi
                    wpicks.append((wj, ok))
                    wkey = jnp.where(wkey == wj, bigi, wkey)

                    @pl.when(ok)
                    def _(wj=wj, j=j):
                        cp = pltpu.make_async_copy(
                            wmp_ref.at[wj], wstage.at[j], wsem.at[j]
                        )
                        cp.start()

                # wait + merge window metas (FIFO slot rotation; invalid picks
                # leave the slot's previous content in place)
                for j, (wj, ok) in enumerate(wpicks):
                    slot = (wctr + j) % N_WC

                    @pl.when(ok)
                    def _(wj=wj, j=j, slot=slot):
                        pltpu.make_async_copy(
                            wmp_ref.at[wj], wstage.at[j], wsem.at[j]
                        ).wait()

                    mrow = wstage[j]                             # [1,128] u32
                    slot8 = slot * 8
                    src = _gather8(mrow, jnp.clip(lane_row - slot8, 0, 127))
                    sel = (lane_row >= slot8) & (lane_row < slot8 + 8) & ok
                    wm_row = jnp.where(sel, src, wm_row)
                    wid_all = jnp.where(
                        (wrow_iota == slot) & ok, wj, wid_all
                    )
                    if sparse:
                        # keep the FULL window row (index lanes 64-127
                        # carry the subwindow content-row table)
                        @pl.when(ok)
                        def _(j=j, slot=slot):
                            widx[pl.ds(slot, 1)] = wstage[j]

                # re-classify against the merged window metas, then fetch
                # subwindow content for every remaining stall
                (_, _, _, _, _, _, _, g_jump, _, wslot, sw_jump, _, s,
                 sslot, s_loc) = classify(t, wid_all, sid_all, wm_row)
                sstall = (
                    alive & ~g_jump & (wslot >= 0) & ~sw_jump & (sslot < 0)
                )
                skey = jnp.where(sstall, s, bigi)
                if s_seg > 1:
                    # Segmented fetch: each DMA brings s_seg CONSECUTIVE rows
                    # starting at the picked stall id. Subwindow ids are x-major
                    # (s = X + Y*ns + Z*ns²), so stalled neighbors along +x are
                    # consecutive rows and one issue serves them all — the DMA
                    # ISSUE cost (~1 us each on this runtime, serialized on the
                    # scalar core) was the serve round's dominant term. Every id
                    # in a fetched segment clears from the stall pool; duplicate
                    # cache entries from overlapping segments are harmless (the
                    # cache is id-matched, copies carry identical content).
                    n3 = ns * ns * ns
                    spicks = []
                    for i in range(s_ins // s_seg):
                        sj = jnp.min(skey)
                        ok = sj < bigi
                        start = jnp.minimum(sj, i32(n3 - s_seg))
                        spicks.append((start, ok))
                        served = (skey >= start) & (skey < start + s_seg)
                        skey = jnp.where(served, bigi, skey)

                        @pl.when(ok)
                        def _(start=start, i=i):
                            pltpu.make_async_copy(
                                swc_ref.at[pl.ds(start, s_seg)],
                                stage.at[pl.ds(i * s_seg, s_seg)], ssem.at[i],
                            ).start()

                    for i, (start, ok) in enumerate(spicks):

                        @pl.when(ok)
                        def _(start=start, i=i):
                            pltpu.make_async_copy(
                                swc_ref.at[pl.ds(start, s_seg)],
                                stage.at[pl.ds(i * s_seg, s_seg)], ssem.at[i],
                            ).wait()

                        for r in range(s_seg):
                            j = i * s_seg + r
                            slot = (sctr + j) % n_sc

                            @pl.when(ok)
                            def _(j=j, slot=slot):
                                csol[pl.ds(slot, 1)] = stage[j, 0:1]
                                cliq[pl.ds(slot, 1)] = stage[j, 1:2]
                                cpid[pl.ds(slot * 4, 4)] = stage[j, 2:6]

                            mrow = stage[j, 6:7]
                            sm_row = sm_merge(sm_row, mrow, slot, ok)
                            sid_all = jnp.where(
                                (srow_iota == slot) & ok, start + r, sid_all
                            )

                    return (
                        (wid_all, sid_all, wm_row, sm_row),
                        wctr + w_ins, sctr + s_ins,
                    )
                spicks = []
                if grouped:
                    # grouped pick: one vectorized per-tile-group min instead of
                    # s_ins sequential whole-array reductions — spatially fair
                    # (adjacent tiles share a group) and ~s_ins× cheaper to pick;
                    # duplicate ids across groups waste the odd slot, which the
                    # next round's re-pick absorbs.
                    gmin = jnp.min(
                        skey.reshape(s_ins, (blk // s_ins) * 128), axis=1
                    )                                             # [s_ins]
                    for j in range(s_ins):
                        sj = gmin[j]
                        spicks.append((sj, sj < bigi))
                elif sparse:
                    # sparse tables: picked sids translate to content-
                    # row indices through the cached full window rows
                    # (lanes 64-127 of widx[wslot] = the window's 64
                    # subwindow row indices; sstall implies wslot >= 0
                    # and a non-jump subwindow, which by construction
                    # has a content row)
                    idx_lane = 64 + s_loc
                    ridx = jnp.full((blk, 128), -1, i32)
                    for k in range(N_WC):
                        row_k = jnp.broadcast_to(
                            widx[k:k + 1], (blk, 128))
                        cand = jnp.take_along_axis(
                            row_k, idx_lane, axis=1).astype(i32)
                        ridx = jnp.where(wslot == k, cand, ridx)
                    rkey = jnp.where(
                        sstall & (ridx >= 0), ridx, bigi)
                    for j in range(s_ins):
                        sj = jnp.min(skey)
                        rj = jnp.min(jnp.where(skey == sj, rkey, bigi))
                        spicks.append((sj, (sj < bigi) & (rj < bigi), rj))
                        skey = jnp.where(skey == sj, bigi, skey)
                else:
                    for j in range(s_ins):
                        sj = jnp.min(skey)
                        spicks.append((sj, sj < bigi))
                        skey = jnp.where(skey == sj, bigi, skey)
                if sparse and not grouped:
                    for j, (sj, ok, rj) in enumerate(spicks):

                        @pl.when(ok)
                        def _(rj=rj, j=j):
                            pltpu.make_async_copy(
                                swc_ref.at[rj], stage.at[j], ssem.at[j]
                            ).start()

                    for j, (sj, ok, rj) in enumerate(spicks):
                        slot = (sctr + j) % n_sc

                        @pl.when(ok)
                        def _(rj=rj, j=j):
                            pltpu.make_async_copy(
                                swc_ref.at[rj], stage.at[j], ssem.at[j]
                            ).wait()

                        @pl.when(ok)
                        def _(j=j, slot=slot):
                            csol[pl.ds(slot, 1)] = stage[j, 0:1]
                            cliq[pl.ds(slot, 1)] = stage[j, 1:2]
                            cpid[pl.ds(slot * 4, 4)] = stage[j, 2:6]

                        mrow = stage[j, 6:7]
                        sm_row = sm_merge(sm_row, mrow, slot, ok)
                        sid_all = jnp.where(
                            (srow_iota == slot) & ok, sj, sid_all)

                    return (
                        (wid_all, sid_all, wm_row, sm_row),
                        wctr + w_ins, sctr + s_ins,
                    )
                for j, (sj, ok) in enumerate(spicks):

                    @pl.when(ok)
                    def _(sj=sj, j=j):
                        cp = pltpu.make_async_copy(
                            swc_ref.at[sj], stage.at[j], ssem.at[j]
                        )
                        cp.start()

                for j, (sj, ok) in enumerate(spicks):
                    slot = (sctr + j) % n_sc

                    @pl.when(ok)
                    def _(sj=sj, j=j):
                        pltpu.make_async_copy(
                            swc_ref.at[sj], stage.at[j], ssem.at[j]
                        ).wait()

                    @pl.when(ok)
                    def _(j=j, slot=slot):
                        csol[pl.ds(slot, 1)] = stage[j, 0:1]
                        cliq[pl.ds(slot, 1)] = stage[j, 1:2]
                        cpid[pl.ds(slot * 4, 4)] = stage[j, 2:6]

                    mrow = stage[j, 6:7]                         # [1,128] u32
                    sm_row = sm_merge(sm_row, mrow, slot, ok)
                    sid_all = jnp.where((srow_iota == slot) & ok, sj, sid_all)

                return (
                    (wid_all, sid_all, wm_row, sm_row),
                    wctr + w_ins, sctr + s_ins,
                )

            return dict(
                classify=classify, boundary=boundary, step=step,
                decode_hits=decode_hits, serve=serve, t_exit=t_exit,
                sx=sx, sy=sy, sz=sz, dx=dx, dy=dy, dz=dz,
                ox=ox, oy=oy, oz=oz,
            )


        L = leg_ctx(ox, oy, oz, dx, dy, dz)
        t_exit = L["t_exit"]
        sx, sy, sz = L["sx"], L["sy"], L["sz"]

        # ---- state init (primary: synthesized in-kernel, as v3) -----------
        if not per_ray:
            sbi = tg // _BLK
            li = tg - sbi * _BLK
            from .wavefront3 import SB_H, SB_W
            txi = (sbi % nsx) * SB_W + li % SB_W
            tyi = (sbi // nsx) * SB_H + li // SB_W
            val_t = (
                (txi.astype(f32) < scal_ref[25])
                & (tyi.astype(f32) < scal_ref[26])
            )
            in_w0 = (
                (ox > 0.0) & (ox < v)
                & (oy > 0.0) & (oy < v)
                & (oz > 0.0) & (oz < v)
            )
            act0 = (val_t & in_w0).astype(i32)
            ts0 = jnp.full((blk, 128), EPS_T, f32)
            wa0 = jnp.zeros((blk, 128), f32)
            we0 = jnp.full((blk, 128), -1.0, f32)
            hit0 = jnp.zeros((blk, 128), i32)
            ax0 = jnp.zeros((blk, 128), i32)
            stp0 = jnp.zeros((blk, 128), i32)
            vox0 = jnp.zeros((blk, 128), i32)
        else:
            ts0, wa0, we0 = ts_ref[...], wa_ref[...], we_ref[...]
            act0 = (fl_in >> 0) & 1
            hit0 = (fl_in >> _FL_HIT) & 1
            ax0 = (fl_in >> _FL_AX) & 7
            stp0 = (fl_in >> _FL_STP) & 0xFFF
            vox0 = (fl_in >> _FL_VOX) & 0xFF
        act0 = jnp.where(stp0 < step_cap, act0, 0)
        px0 = ox + dx * ts0
        py0 = oy + dy * ts0
        pz0 = oz + dz * ts0
        inw0 = (
            (px0 >= 0.0) & (py0 >= 0.0) & (pz0 >= 0.0)
            & (px0 < v) & (py0 < v) & (pz0 < v)
        )
        act0 = jnp.where(inw0 & (ts0 < t_exit), act0, 0)
        any_active = jnp.any(act0 != 0)

        def encode_flags(c):
            sgn_bits = (
                sx.astype(i32)
                | (sy.astype(i32) << 1)
                | (sz.astype(i32) << 2)
            )
            return (
                c[1]
                | (c[2] << _FL_HIT)
                | (c[3] << _FL_AX)
                | (jnp.minimum(c[7], 0xFFF) << _FL_STP)
                | (c[4] << _FL_VOX)
                | (sgn_bits << _FL_SGN)
            )

        def shade_store(c, sh=None):
            """In-kernel shade epilogue (fused mode): same op order as the v3
            _shade_kernel (wavefront3.py:1849) so the packed RGBA8 is
            bit-exact vs the split march|shade dispatches. ``sh``: the
            fused shadow leg's hit plane (i32), shadowing hits by the
            ambient factor exactly as the split shade does."""
            t, _a, hit_i, axm, vox, wat, wen, stp = c
            hit = hit_i != 0
            t_stop = jnp.minimum(t, t_exit)
            water = wat + jnp.where(wen >= 0.0, t_stop - wen, 0.0)
            lo = vox & 127
            hi = vox >> 7

            def chan(r0, r1):
                a = jnp.take_along_axis(
                    jnp.broadcast_to(r0, (blk, 128)), lo, axis=1)
                b = jnp.take_along_axis(
                    jnp.broadcast_to(r1, (blk, 128)), lo, axis=1)
                return jnp.where(hi != 0, b, a)

            cr = chan(lut_ref[0:1], lut_ref[1:2])
            cg = chan(lut_ref[2:3], lut_ref[3:4])
            cb = chan(lut_ref[4:5], lut_ref[5:6])
            tint = jnp.where((axm & 1) != 0, f32(0.5), f32(1.0))
            tint = tint * jnp.where((axm & 4) != 0, f32(0.7), f32(1.0))
            bottom = ((axm & 2) != 0) & (dy > 0.0)
            tint = tint * jnp.where(bottom, f32(0.2), f32(1.0))
            cr = cr * tint
            cg = cg * tint
            cb = cb * tint
            if show_steps:
                max_steps = rounds_cap * sub_rounds * sub_steps
                fstep = jnp.clip(stp.astype(f32) / f32(max_steps), 0.0, 1.0)
                cr = fstep
                cg = fstep
                cb = fstep

            if sh is not None:
                # same position in the op order as _shade_kernel's
                # shadows block (after step-heatmap, before sky)
                amb = scal_ref[37]
                shm = jnp.where((sh != 0) & hit, amb, f32(1.0))
                cr = cr * shm
                cg = cg * shm
                cb = cb * shm

            def sstep(e0, e1, x):
                q = jnp.clip((x - e0) * (1.0 / (e1 - e0)), 0.0, 1.0)
                return q * q * (3.0 - 2.0 * q)

            gts = sstep(-0.01, 0.0, dy)
            grad_t = sstep(0.0, 0.4, dy) ** 0.35
            sun_dot = (dx * scal_ref[27] + dy * scal_ref[28]
                       + dz * scal_ref[29])
            sun = (
                ((sun_dot > (1.0 - 0.01)) & (gts >= 1.0)).astype(f32)
                * scal_ref[30]
            )

            def sky_chan(h, vd, sc):
                g = h + (sc - h) * grad_t
                return vd + (g - vd) * gts + sun

            sr = sky_chan(f32(1.0), f32(0.03), scal_ref[31])
            sg = sky_chan(f32(0.3), f32(0.03), scal_ref[32])
            sb = sky_chan(f32(0.0), f32(0.03), scal_ref[33])
            r = jnp.where(hit, cr, sr)
            g = jnp.where(hit, cg, sg)
            b = jnp.where(hit, cb, sb)
            factor = jnp.clip(water * (1.0 / 14.0), 0.8, 1.0)
            wet = water != 0.0
            r = jnp.where(wet, r * (1.0 - factor) + 0.2 * factor, r)
            g = jnp.where(wet, g * (1.0 - factor) + 0.5 * factor, g)
            b = jnp.where(wet, b * (1.0 - factor) + 1.0 * factor, b)

            def q8(cch):
                return (
                    jnp.clip(cch, 0.0, 1.0) * 255.0
                ).astype(i32).astype(u32)

            pk_o[s0:s0 + blk, :] = (
                q8(r) | (q8(g) << 8) | (q8(b) << 16) | u32(0xFF000000)
            )
            if fl_o is not None:
                fl_o[s0:s0 + blk, :] = encode_flags(c)

        @pl.when(jnp.logical_not(any_active))
        def _():
            if fused:
                shade_store((ts0, act0, hit0, ax0, vox0, wa0, we0, stp0))
            else:
                st_o[:, s0:s0 + blk] = st_ref[:, s0:s0 + blk]
            if warm:
                ids_o[sb] = warm_ref[sb]  # keep the caller's token

        @pl.when(any_active)
        def _():
            c0 = (ts0, act0, hit0, ax0, vox0, wa0, we0, stp0)

            # ---- warm start: prefetch last frame's cache IDS (contents are
            # always re-fetched, so world edits are safe — the token carries
            # no geometry). One batched DMA wave replaces ~most cold serve
            # rounds on temporally coherent frames.
            if warm and warm_pre:
                # contents pre-gathered by XLA and pipelined in as block
                # inputs: no DMA issue/wait at all — just merge
                wm_w, sm_w = wm0, sm0
                wid_w, sid_w = wid0, sid0
                for k in range(N_WC if not wm_full else 0):
                    widk = warm_ref[sb, 1, k]
                    okk = widk >= 0
                    mrow = wmpw_ref[sb, k]
                    slot8 = k * 8
                    src = _gather8(mrow, jnp.clip(lane_row - slot8, 0, 127))
                    sel = (lane_row >= slot8) & (lane_row < slot8 + 8) & okk
                    wm_w = jnp.where(sel, src, wm_w)
                    wid_w = jnp.where((wrow_iota == k) & okk, widk, wid_w)
                for k in range(n_sc):
                    sidk = warm_ref[sb, 0, k]
                    okk = sidk >= 0

                    @pl.when(okk)
                    def _(k=k):
                        csol[pl.ds(k, 1)] = swcw_ref[sb, k, 0:1]
                        cliq[pl.ds(k, 1)] = swcw_ref[sb, k, 1:2]
                        cpid[pl.ds(k * 4, 4)] = swcw_ref[sb, k, 2:6]

                    mrow = swcw_ref[sb, k, 6:7]
                    sm_w = sm_merge(sm_w, mrow, k, okk)
                    sid_w = jnp.where((srow_iota == k) & okk, sidk, sid_w)
                cch_init = (wid_w, sid_w, wm_w, sm_w)
            elif warm:
                wm_w, sm_w = wm0, sm0
                wid_w, sid_w = wid0, sid0
                wpk = []
                for k in range(N_WC if not wm_full else 0):
                    widk = warm_ref[sb, 1, k]
                    okk = widk >= 0
                    wpk.append((widk, okk))

                    @pl.when(okk)
                    def _(widk=widk, k=k):
                        pltpu.make_async_copy(
                            wmp_ref.at[widk], wstage.at[k], wsem.at[k]
                        ).start()
                spk = []
                segs = []
                if warm_seg > 1:
                    # Segmented restore: the token's ids are fetched as
                    # ``warm_seg``-consecutive-row DMAs via the same
                    # min-chain as serve's s_seg picks. Each DMA ISSUE is
                    # ~1 us of serialized scalar-core time, and the wave's
                    # n_sc issues were most of the warm frame's fixed
                    # ~23 us/program cost; segments cut issues n_sc ->
                    # n_sc/warm_seg. Restored ids may differ from the
                    # token's (each segment carries the picked id's +x
                    # neighbors; spread-out ids past the slot budget fall
                    # cold) — harmless: cache entries are id-matched and
                    # misses re-serve, so frames stay bit-exact (pinned
                    # by test_v4_warm_seg_matches).
                    srow = jnp.broadcast_to(warm_ref[sb, 0:1, :], (8, 128))
                    key = jnp.where(
                        (lane8 < n_sc) & (srow >= 0), srow, bigi
                    )
                    n3cap = i32(ns * ns * ns - warm_seg)
                    for i in range(n_sc // warm_seg):
                        m = jnp.min(key)
                        okk = m < bigi
                        start = jnp.minimum(m, n3cap)
                        segs.append((start, okk))
                        served = (key >= start) & (key < start + warm_seg)
                        key = jnp.where(served, bigi, key)

                        @pl.when(okk)
                        def _(start=start, i=i):
                            pltpu.make_async_copy(
                                swc_ref.at[pl.ds(start, warm_seg)],
                                stage.at[pl.ds(i * warm_seg, warm_seg)],
                                ssem.at[i],
                            ).start()
                elif sparse:
                    # token row 2 carries content-ROW indices; row 0 the
                    # sids. Rows are verified against the sid stamped in
                    # the fetched content (meta plane lane 8) so a stale
                    # token (sparse table re-laid-out under it) degrades
                    # to a cold slot instead of wrong geometry.
                    for k in range(n_sc):
                        sidk = warm_ref[sb, 0, k]
                        ridxk = warm_ref[sb, 2, k]
                        okk = (sidk >= 0) & (ridxk >= 0)
                        spk.append((sidk, okk, ridxk))

                        @pl.when(okk)
                        def _(ridxk=ridxk, k=k):
                            pltpu.make_async_copy(
                                swc_ref.at[ridxk], stage.at[k],
                                ssem.at[k],
                            ).start()
                else:
                    for k in range(n_sc):
                        sidk = warm_ref[sb, 0, k]
                        okk = sidk >= 0
                        spk.append((sidk, okk, None))

                        @pl.when(okk)
                        def _(sidk=sidk, k=k):
                            pltpu.make_async_copy(
                                swc_ref.at[sidk], stage.at[k], ssem.at[k]
                            ).start()
                for k, (widk, okk) in enumerate(wpk):
                    @pl.when(okk)
                    def _(widk=widk, k=k):
                        pltpu.make_async_copy(
                            wmp_ref.at[widk], wstage.at[k], wsem.at[k]
                        ).wait()

                    mrow = wstage[k]
                    slot8 = k * 8
                    src = _gather8(mrow, jnp.clip(lane_row - slot8, 0, 127))
                    sel = (lane_row >= slot8) & (lane_row < slot8 + 8) & okk
                    wm_w = jnp.where(sel, src, wm_w)
                    wid_w = jnp.where((wrow_iota == k) & okk, widk, wid_w)
                    if sparse:
                        @pl.when(okk)
                        def _(k=k):
                            widx[pl.ds(k, 1)] = wstage[k]
                for i, (start, okk) in enumerate(segs):
                    @pl.when(okk)
                    def _(start=start, i=i):
                        pltpu.make_async_copy(
                            swc_ref.at[pl.ds(start, warm_seg)],
                            stage.at[pl.ds(i * warm_seg, warm_seg)],
                            ssem.at[i],
                        ).wait()

                    for r in range(warm_seg):
                        k = i * warm_seg + r

                        @pl.when(okk)
                        def _(k=k):
                            csol[pl.ds(k, 1)] = stage[k, 0:1]
                            cliq[pl.ds(k, 1)] = stage[k, 1:2]
                            cpid[pl.ds(k * 4, 4)] = stage[k, 2:6]

                        mrow = stage[k, 6:7]
                        sm_w = sm_merge(sm_w, mrow, k, okk)
                        sid_w = jnp.where(
                            (srow_iota == k) & okk, start + r, sid_w
                        )
                for k, (sidk, okk, ridxk) in enumerate(spk):
                    @pl.when(okk)
                    def _(sidk=sidk, k=k, ridxk=ridxk):
                        pltpu.make_async_copy(
                            swc_ref.at[sidk if ridxk is None else ridxk],
                            stage.at[k], ssem.at[k],
                        ).wait()

                    if sparse:
                        # verify the fetched row still belongs to the
                        # token's sid (meta plane lane 8)
                        vrow = stage[k, 6:7].astype(i32)
                        okk = okk & jnp.any(
                            (lane_row == 8) & (vrow == sidk))

                    @pl.when(okk)
                    def _(k=k, okk=okk):
                        csol[pl.ds(k, 1)] = stage[k, 0:1]
                        cliq[pl.ds(k, 1)] = stage[k, 1:2]
                        cpid[pl.ds(k * 4, 4)] = stage[k, 2:6]

                    mrow = stage[k, 6:7]
                    sm_w = sm_merge(sm_w, mrow, k, okk)
                    sid_w = jnp.where((srow_iota == k) & okk, sidk, sid_w)
                cch_init = (wid_w, sid_w, wm_w, sm_w)
            else:
                cch_init = (wid0, sid0, wm0, sm0)

            def mk_round_fns(LG):
                def sub_round(state):
                    sr, _, c, rows_c, cch, limit = state

                    # fixed-point early exit: once no lane marches or
                    # hits, the remaining steps of this sub-round are
                    # no-ops — skip them
                    def sbody(st):
                        i, _, cc = st
                        cc, prog = LG["step"](cc, rows_c, cch)
                        return i + 1, prog, cc

                    def scond(st):
                        i, prog, _ = st
                        return (i < sub_steps) & (prog != 0)

                    _, _, c = jax.lax.while_loop(
                        scond, sbody, (jnp.int32(0), jnp.int32(1), c)
                    )
                    c = LG["decode_hits"](c, rows_c[1], rows_c[4], cch[3])
                    t, a, h, axm, vox, wat, wen, stp = c
                    t = jnp.minimum(t, LG["t_exit"])
                    c = (t, jnp.where(stp < step_cap, a, 0), h, axm, vox,
                         wat, wen, stp)
                    (tsid, tslot, solid_row, liq_row, pid_rows,
                     go) = LG["boundary"](
                        c[0], c[1], cch[0], cch[1], cch[2]
                    )
                    return sr + 1, go, c, (tsid, tslot, solid_row,
                                           liq_row, pid_rows), cch, limit

                def inner_cond(state):
                    sr, go = state[0], state[1]
                    return (sr < state[5]) & (go != 0)

                def round_body(carry):
                    r, c, cch, wctr, sctr = carry
                    # serve this round's stalls, then march until every
                    # lane stalls again (or the block converges).
                    # spin_ramp: early rounds are SERVE-bound (cold
                    # cache — short spins, frequent refills), late
                    # rounds are STEP-bound (long grazing rays on a
                    # warm cache — long spins); ramping the in-kernel
                    # spin budget serves both phases. Schedule-only:
                    # pixels are bit-exact (cache-content determinism).
                    if spin_ramp:
                        limit = jnp.minimum(
                            jnp.int32(sub_rounds),
                            (r + 1) * jnp.int32(spin_ramp),
                        )
                    else:
                        limit = jnp.int32(sub_rounds)
                    cch, wctr, sctr = LG["serve"](
                        c[0], c[1], cch, wctr, sctr)
                    rows_c = LG["boundary"](
                        c[0], c[1], cch[0], cch[1], cch[2])
                    _, _, c, _, _, _ = jax.lax.while_loop(
                        inner_cond, sub_round,
                        (jnp.int32(0), rows_c[5], c, rows_c[:5], cch,
                         limit),
                    )
                    return r + 1, c, cch, wctr, sctr

                def round_cond(carry):
                    r, c, _, _, _ = carry
                    return (r < rounds_cap) & jnp.any(c[1] != 0)

                return sub_round, inner_cond, round_body, round_cond

            sub_round, inner_cond, round_body, round_cond = \
                mk_round_fns(L)
            boundary = L["boundary"]

            # march BEFORE the first serve: blocks whose rays converge
            # against the warm cache (or pure sky blocks, which need no
            # cache at all) skip the round loop — and its classify-twice
            # + pick-chain serve pass — entirely. A cold block makes no
            # progress here (boundary yields go=0) and falls straight
            # into the original serve-then-march rounds, so cold frames
            # are unchanged; marching is cache-content-deterministic, so
            # pixels are bit-exact either way (test_v4_premarch pins it).
            rows_c0 = boundary(
                c0[0], c0[1], cch_init[0], cch_init[1], cch_init[2]
            )
            _, _, c0m, _, _, _ = jax.lax.while_loop(
                inner_cond, sub_round,
                (jnp.int32(0), rows_c0[5], c0, rows_c0[:5], cch_init,
                 jnp.int32(sub_rounds)),
            )
            _, c, cch_f, _, _ = jax.lax.while_loop(
                round_cond, round_body,
                (jnp.int32(0), c0m, cch_init, jnp.int32(0), jnp.int32(0)),
            )
            sh = None
            if fused_shadow:
                # ---- fused shadow leg: rebase converged HIT rays toward
                # the sun and re-run the round loop on the SAME warm
                # cache (shadow origins are the primary hit points, so
                # the primary leg's cache is the ideal round-0 cache).
                # Ray construction mirrors _shadow_prep4 op-for-op and
                # the per-ray leg's init mirrors _trace_frame4, so the
                # shadow-hit plane is bit-exact vs the split dispatches.
                tp, _ap, hitp, axp = c[0], c[1], c[2], c[3]
                hitm = hitp != 0
                nxs = -jnp.sign(dx) * ((axp >> 0) & 1).astype(f32)
                nys = -jnp.sign(dy) * ((axp >> 1) & 1).astype(f32)
                nzs = -jnp.sign(dz) * ((axp >> 2) & 1).astype(f32)
                hx = ox + dx * tp + nxs * 1e-3
                hy = oy + dy * tp + nys * 1e-3
                hz = oz + dz * tp + nzs * 1e-3
                svx = scal_ref[34] - hx
                svy = scal_ref[35] - hy
                svz = scal_ref[36] - hz
                sn = jnp.sqrt(svx * svx + svy * svy + svz * svz)
                S = leg_ctx(hx, hy, hz, svx / sn, svy / sn, svz / sn)
                ts0s = jnp.full((blk, 128), EPS_T, f32)
                ins0 = (
                    (hx > 0.0) & (hx < v)
                    & (hy > 0.0) & (hy < v)
                    & (hz > 0.0) & (hz < v)
                )
                acts = (hitm & ins0).astype(i32)
                pxs = hx + (svx / sn) * ts0s
                pys = hy + (svy / sn) * ts0s
                pzs = hz + (svz / sn) * ts0s
                inws = (
                    (pxs >= 0.0) & (pys >= 0.0) & (pzs >= 0.0)
                    & (pxs < v) & (pys < v) & (pzs < v)
                )
                acts = jnp.where(
                    inws & (ts0s < S["t_exit"]), acts, 0)
                cs0 = (
                    ts0s, acts, jnp.zeros((blk, 128), i32),
                    jnp.zeros((blk, 128), i32),
                    jnp.zeros((blk, 128), i32),
                    jnp.zeros((blk, 128), f32),
                    jnp.full((blk, 128), -1.0, f32),
                    jnp.zeros((blk, 128), i32),
                )
                s_sub, s_icond, s_rbody, s_rcond = mk_round_fns(S)
                rows_s0 = S["boundary"](
                    cs0[0], cs0[1], cch_f[0], cch_f[1], cch_f[2]
                )
                _, _, cs0m, _, _, _ = jax.lax.while_loop(
                    s_icond, s_sub,
                    (jnp.int32(0), rows_s0[5], cs0, rows_s0[:5], cch_f,
                     jnp.int32(sub_rounds)),
                )
                _, cs, cch_f, _, _ = jax.lax.while_loop(
                    s_rcond, s_rbody,
                    (jnp.int32(0), cs0m, cch_f, jnp.int32(0),
                     jnp.int32(0)),
                )
                sh = cs[2]
            if warm:
                # pack the final cache ids into the token plane: row 0 lane k
                # = sid slot k, row 1 lane k = wid slot k (k past the slot
                # count stays -1)
                wid_f, sid_f = cch_f[0], cch_f[1]
                sid_row = jnp.full((1, 128), -1, i32)
                for k in range(n_sc):
                    sid_row = jnp.where(lane_row == k, sid_f[k:k + 1, :], sid_row)
                wid_row = jnp.full((1, 128), -1, i32)
                for k in range(N_WC):
                    wid_row = jnp.where(lane_row == k, wid_f[k:k + 1, :], wid_row)
                ids_o[sb, 0, :] = sid_row[0]
                ids_o[sb, 1, :] = wid_row[0]
                if sparse:
                    # row 2: each cached sid's CONTENT-ROW index, read
                    # back through the cached window rows (verified on
                    # restore, so staleness is safe)
                    rid_row = jnp.full((1, 128), -1, i32)
                    for k in range(n_sc):
                        sidk = sid_f[k, 0]
                        sxs = sidk % ns
                        sys_ = (sidk // ns) % ns
                        szs = sidk // (ns * ns)
                        wk_of = (
                            (sxs >> 2) + (sys_ >> 2) * nw
                            + (szs >> 2) * nw * nw
                        )
                        lloc = (sxs & 3) + (sys_ & 3) * 4 + (szs & 3) * 16
                        idxv = jnp.broadcast_to(
                            jnp.clip(64 + lloc, 0, 127).reshape(1, 1),
                            (1, 128),
                        )
                        rk = jnp.full((1, 128), -1, i32)
                        for k2 in range(N_WC):
                            cand = _gather8(
                                widx[k2:k2 + 1], idxv).astype(i32)
                            rk = jnp.where(
                                (wid_f[k2, 0] == wk_of)
                                & (wid_f[k2, 0] >= 0) & (sidk >= 0),
                                cand, rk,
                            )
                        rid_row = jnp.where(lane_row == k, rk, rid_row)
                    ids_o[sb, 2, :] = rid_row[0]

            if fused:
                shade_store(c, sh)
            else:
                fl_out = encode_flags(c)
                st_o[0, s0:s0 + blk, :] = c[0]
                st_o[1, s0:s0 + blk, :] = jax.lax.bitcast_convert_type(
                    fl_out + _FL_BIAS, f32)
                st_o[2, s0:s0 + blk, :] = c[5]
                st_o[3, s0:s0 + blk, :] = c[6]

    for sb in range(vb):
        do_block(sb)



def _march4(
    scal, gw2, sw_cont, wmeta_pad, state,
    *, sub_rounds, sub_steps, rounds_cap, nw, ns, nsx, interpret, rays=None,
    s_ins=S_INS, w_ins=W_INS, grouped=False, warm_ids=None, blk=_BLK,
    n_sc=N_SC, gw_pair=False, lut=None, show_steps=False, T=None,
    warm_gather=False, s_seg=1, vb=1, warm_seg=1, fused_flags=True,
    fused_shadow=False, sparse=False, wm_full=0, spin_ramp=0,
):
    """state: f32[4, T, 128]; gw2: u32[2,128]; sw_cont: u32[Ns³,7,128];
    wmeta_pad: u32[Nw³,1,128]. Returns state', or (state', ids') when a
    ``warm_ids`` i32[T//blk, 2, 128] cache-id token plane is passed.
    ``blk``: tiles per block program (a multiple of the 64-tile superblock
    — bigger blocks amortize the ~24 us/program floor over more rays).
    ``n_sc``: subwindow cache slots per block (16..128, multiple of 16):
    oblique 1080p blocks touch ~40-80 subwindows, so a 16-slot cache
    costs ~4-6 full-replacement serve rounds per block.

    Fused mode (``lut`` passed, ``state`` None, ``T`` given): shade
    in-kernel; no state planes are streamed at all — returns
    (packed u32[T,128], flags i32[T,128]) (+ ids' when warm)."""
    fused = lut is not None
    if fused:
        assert state is None and rays is None and T is not None
    else:
        T = state.shape[1]
    blk = int(blk)
    n_sc = int(n_sc)
    assert blk % _BLK == 0 and T % blk == 0, (blk, T)
    assert n_sc % 16 == 0 and 16 <= n_sc <= 128, n_sc
    f32 = jnp.float32
    per_ray = rays is not None
    warm = warm_ids is not None
    assert 1 <= s_ins <= n_sc and 1 <= w_ins <= N_WC, (s_ins, w_ins)
    assert not grouped or blk % s_ins == 0, (
        f"grouped picks need s_ins ({s_ins}) to divide the block's "
        f"{blk} tiles")
    assert s_ins % s_seg == 0 and not (grouped and s_seg > 1), (s_ins, s_seg)
    assert n_sc % warm_seg == 0, (n_sc, warm_seg)
    vb = int(vb)
    assert T % (blk * vb) == 0, (T, blk, vb)
    if sparse:
        # sparse v1 constraints: row translation needs plain per-pick
        # fetches and in-kernel warm restore
        assert s_seg == 1 and not grouped, (s_seg, grouped)
        assert warm_seg == 1 and not warm_gather, (warm_seg, warm_gather)
        assert not wm_full, "sparse needs the window cache (widx rows)"
    ids_rows = 3 if sparse else 2

    def pspec(p):
        return pl.BlockSpec((p, blk * vb, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def vspec():
        return pl.BlockSpec((blk * vb, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    ispec = pl.BlockSpec((vb, ids_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # scal
        pl.BlockSpec((2, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # gw rows
        pl.BlockSpec(memory_space=pl.ANY),             # sw_cont (HBM)
        pl.BlockSpec(memory_space=pl.ANY),             # wmeta_pad (HBM)
    ]
    args = [scal, gw2, sw_cont, wmeta_pad]
    if wm_full:
        # whole window-meta table as a VMEM input: [wm_full,128] u32,
        # 16 windows' interleaved words per row
        nw3 = wmeta_pad.shape[0]
        wmf = jnp.pad(
            wmeta_pad[:, 0, :8], ((0, wm_full * 16 - nw3), (0, 0))
        ).reshape(wm_full, 128)
        in_specs.insert(2, pl.BlockSpec(
            (wm_full, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.insert(2, wmf)
    if fused:
        li = 3 if wm_full else 2
        in_specs.insert(li, pl.BlockSpec((6, 128), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        args.insert(li, lut)
    if per_ray:
        in_specs.append(pspec(6))
        args.append(rays)
    warm_pre = warm and warm_gather
    if warm:
        in_specs.append(ispec)
        args.append(warm_ids)
    if warm_pre:
        # Hoist the warm-start cache fetch out of the kernel: row-gather
        # last frame's cache contents with XLA and stream them in as
        # pipelined block inputs instead of the in-kernel prefetch DMA
        # wave. NEGATIVE RESULT on chip (experiments/v4_fused_probe.py
        # wp_time, 1080p fused+prepared): 16.93 ms/frame hoisted vs
        # 15.68 ms in-kernel — the XLA gather of [nB, n_sc, 7, 128] +
        # [nB, N_WC, 1, 128] costs more HBM traffic than the ~1 us-each
        # scattered DMAs it replaces, because every block re-reads 7 KiB
        # x n_sc whether or not the row is already cached. Kept as a
        # tested knob (default False); both paths pixel-identical
        # (tests/test_wavefront4.py::test_v4_warm_gather_matches_inkernel_dma,
        # wp_cmp on chip).
        nB = T // blk
        sids = jnp.maximum(warm_ids[:, 0, :n_sc], 0)        # [nB, n_sc]
        wids = jnp.maximum(warm_ids[:, 1, :N_WC], 0)        # [nB, N_WC]
        swc_warm = jnp.take(sw_cont, sids.reshape(-1), axis=0).reshape(
            nB, n_sc, 7, 128
        )
        wmp_warm = jnp.take(wmeta_pad, wids.reshape(-1), axis=0).reshape(
            nB, N_WC, 1, 128
        )
        in_specs.append(pl.BlockSpec(
            (vb, n_sc, 7, 128), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(swc_warm)
        in_specs.append(pl.BlockSpec(
            (vb, N_WC, 1, 128), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(wmp_warm)
    if not fused:
        in_specs.append(pspec(4))
        args.append(state)
    kern = partial(
        _march_kernel4, sub_rounds=sub_rounds, sub_steps=sub_steps,
        rounds_cap=rounds_cap, nw=nw, ns=ns, nsx=nsx, per_ray=per_ray,
        s_ins=s_ins, w_ins=w_ins, grouped=grouped, warm=warm, n_sc=n_sc,
        gw_pair=gw_pair, fused=fused, show_steps=show_steps,
        warm_pre=warm_pre, s_seg=s_seg, vb=vb, warm_seg=int(warm_seg),
        fused_flags=fused_flags, fused_shadow=fused_shadow, sparse=sparse,
        wm_full=int(wm_full), spin_ramp=int(spin_ramp),
    )
    u32 = jnp.uint32
    i32 = jnp.int32
    if fused:
        out_specs = (vspec(),)
        out_shape = (jax.ShapeDtypeStruct((T, 128), u32),)
        if fused_flags:
            out_specs = out_specs + (vspec(),)
            out_shape = out_shape + (jax.ShapeDtypeStruct((T, 128), i32),)
        if warm:
            out_specs = out_specs + (ispec,)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((T // blk, ids_rows, 128), i32),)
    else:
        out_specs = pspec(4)
        out_shape = jax.ShapeDtypeStruct((4, T, 128), f32)
        if warm:
            out_specs = (out_specs, ispec)
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((T // blk, ids_rows, 128),
                                              i32))
    # the in-kernel warm prefetch stages a full cache wave; with the
    # hoisted (warm_pre) path the staging only serves mid-frame rounds
    n_stage = max(s_ins, n_sc) if (warm and not warm_pre) else s_ins
    n_wstage = max(w_ins, N_WC) if (warm and not warm_pre) else w_ins
    return pl.pallas_call(
        kern,
        grid=(T // (blk * vb),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_stage, 7, 128), u32),           # stage
            pltpu.VMEM((n_wstage, 1, 128), u32),          # wstage
            pltpu.SemaphoreType.DMA((n_stage,)),
            pltpu.SemaphoreType.DMA((n_wstage,)),
            pltpu.VMEM((n_sc, 128), u32),                 # csol
            pltpu.VMEM((n_sc, 128), u32),                 # cliq
            pltpu.VMEM((4 * n_sc, 128), u32),             # cpid
            pltpu.VMEM((N_WC, 128), u32),                 # widx (sparse)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "per_ray", "raw_out", "full_height",
        "s_ins", "w_ins", "grouped", "warm", "prepacked", "blk", "n_sc",
        "warm_gather", "s_seg", "vb", "warm_seg", "sparse_ns",
        "spin_ramp", "use_wm_full", "trust_active",
    ),
)
def _trace_frame4(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    origin, inv_view, inv_proj, origins3, dirs3, active0,
    rounds=64, step_cap=None, warm_ids=None,
    sw_cont_pre=None, wmeta_pre=None,
    *, width, height, sub_rounds, sub_steps, v, interpret,
    per_ray=False, raw_out=False, full_height=None, y0=0.0,
    s_ins=S_INS, w_ins=W_INS, grouped=False, warm=False, prepacked=False,
    blk=_BLK, n_sc=N_SC, warm_gather=False, s_seg=1, vb=1, warm_seg=1,
    sparse_ns=0, spin_ramp=0, use_wm_full=True, trust_active=False,
):
    """One v4 frame: a single self-serving kernel launch, then the same
    finish as v3 (palette ids are decoded in-kernel).

    ``prepacked=True``: ``sw_cont_pre``/``wmeta_pre`` carry the packed
    HBM tables from :func:`prepare_grid4`; the raw plane args are unused
    and pruned from the executable. Re-packing them per frame costs
    ~6.7 ms at 1080p on the v5e — a quarter of the whole frame."""
    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)
    # pad the tile count to the block size; padded tiles map past the
    # last superblock row, init inactive in-kernel, and are sliced off
    T_pad = -(-T // (blk * vb)) * (blk * vb)
    if sparse_ns:
        ns = int(sparse_ns)   # sparse table: row count is NOT ns cubed
    else:
        n_sub = (sw_cont_pre if prepacked else sw_solid).shape[0]
        ns = int(round(n_sub ** (1 / 3)))
        while ns * ns * ns < n_sub:
            ns += 1
    nw = ns // 4

    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(
        origin, jnp.asarray(inv_view, f32), jnp.asarray(inv_proj, f32),
        v, width, full_height, y0,
    )
    cap = jnp.asarray(step_cap, f32)  # 0.0 = uncapped (wrappers map None)
    scal = (
        scal.at[22].set(jnp.float32(sub_rounds))
        .at[23].set(cap)
        .at[24].set(1.0)
        .at[25].set(jnp.float32(tx))
        .at[26].set(jnp.float32(ty))
    )

    nwg = (nw + (1 << _gs_for(nw)) - 1) >> _gs_for(nw)
    gw_pair = nwg ** 3 <= 2048   # pair plane indexes the SUPER-CELL grid
    if gw_pair:
        gw2 = _interleave_gw(gw_jump, gw_liq)              # [2,128] pairs
    else:
        gw2 = jnp.concatenate([gw_jump, gw_liq], axis=0)   # [2,128]

    if prepacked:
        sw_cont, wmeta_pad = sw_cont_pre, wmeta_pre
    else:
        sw_meta_i = _interleave_meta(sw_meta)
        sw_cont = jnp.concatenate(
            [
                sw_solid[:, None, :],
                sw_liq[:, None, :],
                sw_pid,
                jnp.pad(
                    sw_meta_i, ((0, 0), (0, 128 - sw_meta_i.shape[1]))
                )[:, None, :],
            ],
            axis=1,
        )
        wmeta_i = _interleave_meta(wmeta)
        wmeta_pad = jnp.pad(
            wmeta_i, ((0, 0), (0, 128 - wmeta_i.shape[1]))
        )[:, None, :]

    shape = (T_pad, 128)
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
        if T_pad != T:
            pad = ((0, T_pad - T), (0, 0), (0, 0))
            ot = jnp.pad(ot, pad)
            dt3 = jnp.pad(dt3, pad)
            act0 = jnp.pad(act0, pad[:2] if act0.ndim == 2 else pad)
        oxr, oyr, ozr = ot[..., 0], ot[..., 1], ot[..., 2]
        dx, dy, dz = dt3[..., 0], dt3[..., 1], dt3[..., 2]
        rays = jnp.stack([oxr, oyr, ozr, dx, dy, dz])
        if trust_active:
            # caller certifies active0 is authoritative (False on padded
            # tiles): rays may sit at ANY tile position — required by
            # the PT route's global re-binning, which permutes rays
            # across tiles (wavefront3._path_frame bounce_rebin)
            valid = jnp.ones(shape, bool)
        else:
            valid = _tile_valid(tx, ty, T_pad)
        inside = (
            (oxr > 0.0) & (oxr < v)
            & (oyr > 0.0) & (oyr < v)
            & (ozr > 0.0) & (ozr < v)
        )
        fl0 = (jnp.broadcast_to(inside & act0, shape) & valid).astype(i32)
        state0 = jnp.stack([
            jnp.full(shape, EPS_T, f32),
            jax.lax.bitcast_convert_type(fl0 + _FL_BIAS, f32),
            jnp.zeros(shape, f32),
            jnp.full(shape, -1.0, f32),
        ])
    else:
        rays = None
        state0 = jnp.zeros((4,) + shape, f32)

    if warm:
        wtok = (
            warm_ids if warm_ids is not None
            else jnp.full(
                (T_pad // blk, 3 if sparse_ns else 2, 128), -1, i32)
        )
    else:
        wtok = None
    st = _march4(
        scal, gw2, sw_cont, wmeta_pad, state0,
        sub_rounds=sub_rounds, sub_steps=sub_steps, rounds_cap=rounds,
        nw=nw, ns=ns, nsx=nsx, interpret=interpret, rays=rays,
        s_ins=s_ins, w_ins=w_ins, grouped=grouped, warm_ids=wtok, blk=blk,
        warm_gather=warm_gather, s_seg=s_seg, vb=vb, warm_seg=warm_seg,
        n_sc=n_sc, gw_pair=gw_pair, sparse=bool(sparse_ns),
        wm_full=_wm_full_rows(nw, sparse_ns) if use_wm_full else 0,
        spin_ramp=int(spin_ramp),
    )
    ids_out = None
    if warm:
        st, ids_out = st
    if T_pad != T:
        st = st[:, :T]

    carry_ts, carry_wa, carry_we = st[0], st[2], st[3]
    fl = jax.lax.bitcast_convert_type(st[1], i32) - _FL_BIAS
    if raw_out:
        if warm:
            return carry_ts, fl, carry_wa, carry_we, ids_out
        return carry_ts, fl, carry_wa, carry_we

    real_hit = ((fl >> _FL_HIT) & 1) != 0
    axmask = (fl >> _FL_AX) & 7
    steps = (fl >> _FL_STP) & 0xFFF
    voxk = (fl >> _FL_VOX) & 0xFF
    sgnb = (fl >> _FL_SGN) & 7

    t_stop = carry_ts
    water = carry_wa + jnp.where(carry_we >= 0.0, t_stop - carry_we, 0.0)
    voxel = jnp.where(real_hit, voxk, 0)

    nx = -jnp.where((sgnb & 1) != 0, 1.0, -1.0) * ((axmask >> 0) & 1)
    ny = -jnp.where((sgnb & 2) != 0, 1.0, -1.0) * ((axmask >> 1) & 1)
    nz = -jnp.where((sgnb & 4) != 0, 1.0, -1.0) * ((axmask >> 2) & 1)
    norm = jnp.stack([nx, ny, nz], axis=-1)

    def ut(x):
        return _untile_hw(x, tx, ty, width, height)

    res = WavefrontResult(
        hit=ut(real_hit),
        t=ut(t_stop),
        voxel=ut(voxel),
        norm=ut(norm),
        water_dist=ut(water),
        steps=ut(steps.astype(i32)),
    )
    return (res, ids_out) if warm else res


@partial(
    jax.jit,
    static_argnames=(
        "t_c", "rounds", "sub_rounds", "sub_steps", "v", "interpret",
        "s_ins", "w_ins", "n_sc", "s_seg", "lane_compact", "rounds1",
        "t_c2",
    ),
)
def _bounce_retry4(
    ts, fl, wa, we, ot, dt3, gw_jump, gw_liq, sw_cont, wmeta_pad,
    step_cap,
    *, t_c, rounds, sub_rounds, sub_steps, v, interpret,
    s_ins=32, w_ins=W_INS, n_sc=64, s_seg=1, lane_compact=False,
    rounds1=8, t_c2=0,
):
    """Compact-and-resume pass for rays left unconverged by a capped leg.

    The v4 per-block round loop runs until the block's LAST ray
    converges; on incoherent (bounce) legs a handful of deep-crevice
    stragglers pin whole 8K-ray blocks for dozens of serve rounds — the
    reason the in-kernel path tracer measured slower than the per-leg
    XLA route (ops/pathtrace4.py docstring). This pass is the global
    re-batching barrier done ON DEVICE at tile granularity:

      * tiles (128-ray rows) containing any still-active ray are row-
        gathered to the front (argsort of the per-tile any-active key —
        row gathers run at ~HBM speed on this runtime, unlike element
        gathers, docs/TPU_NOTES.md), up to a static ``t_c`` capacity;
      * the compacted tiles — now DENSE straggler work, every lane deep
        mid-flight — resume marching in a small per-ray launch
        (``t_c``/64 blocks instead of T/64) with a bigger subwindow
        cache (``n_sc``) and serve width (``s_ins``), sized for
        incoherent wants;
      * results row-scatter back over the full-frame planes.

    ``lane_compact``: when the straggler POPULATION is large (an early
    bounce-leg cap leaves ~15% of rays active, scattered so thinly that
    >50% of tiles hold at least one — tile compaction alone cannot
    compress that, experiments/RESULTS.md), first run a per-block
    active-first LANE sort ([T/64, 64*128] multi-operand lax.sort — no
    element gathers): active rays pack into each block's leading tiles,
    so the tile compaction above collapses 15%-of-rays from ~55% of
    tiles into ~16% of tiles. Results lane-unsort through the carried
    index after the row scatter-back. Bit-exact for the same reason the
    rebin/sort passes are: marching is lane-placement-independent given
    cache contents (pinned by tests/test_pathtrace4.py).

    Marching is cache-content-deterministic, so resume-after-cap equals
    one uncapped march bit-exactly (pinned by tests/test_pathtracer.py).
    Overflow beyond ``t_c`` keeps its capped state (rare; shades as the
    rounds-cap miss, same as before this pass existed).
    """
    f32, i32 = jnp.float32, jnp.int32
    lane_inv = None
    if lane_compact:
        T = ts.shape[0]
        # sort granularity = the kernel's 64-tile block when the frame
        # is block-shaped; small (test) frames sort as one span — any
        # placement is equally correct, only locality differs
        blt = 64 if T % 64 == 0 else T
        BL = blt * 128
        nB = T // blt

        def br(x):
            return x.reshape(nB, BL)

        if lane_compact >= 2:
            # spatial key: actives sort by (current subwindow, direction
            # octant) — same sort cost as the plain active key, but the
            # compacted resume tiles come out spatially coherent, so the
            # resume launch's per-tile serve want-sets shrink. (Dead
            # lanes still sink to the back: their key is BIG.)
            n_sub = sw_cont.shape[0]
            ns_k = int(round(n_sub ** (1 / 3)))
            while ns_k * ns_k * ns_k < n_sub:
                ns_k += 1
            px = ot[..., 0] + dt3[..., 0] * ts
            py = ot[..., 1] + dt3[..., 1] * ts
            pz = ot[..., 2] + dt3[..., 2] * ts
            sx = jnp.clip(jnp.floor(px).astype(i32) >> 4, 0, ns_k - 1)
            sy = jnp.clip(jnp.floor(py).astype(i32) >> 4, 0, ns_k - 1)
            sz = jnp.clip(jnp.floor(pz).astype(i32) >> 4, 0, ns_k - 1)
            sid = sx + sy * ns_k + sz * ns_k * ns_k
            okt = ((dt3[..., 0] > 0).astype(i32)
                   + ((dt3[..., 1] > 0).astype(i32) << 1)
                   + ((dt3[..., 2] > 0).astype(i32) << 2))
            lkey = jnp.where(
                (fl & 1) != 0, sid * 8 + okt, jnp.int32(_BIGI))
        else:
            lkey = jnp.where((fl & 1) != 0, 0, 1).astype(i32)
        lidx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(i32, (1, BL), 1), (nB, BL)
        )
        srt = jax.lax.sort(
            (br(lkey), lidx, br(ts), br(fl), br(wa), br(we),
             br(ot[..., 0]), br(ot[..., 1]), br(ot[..., 2]),
             br(dt3[..., 0]), br(dt3[..., 1]), br(dt3[..., 2])),
            dimension=-1, num_keys=1, is_stable=True,
        )
        lane_inv = srt[1]
        shp = (T, 128)
        ts = srt[2].reshape(shp)
        fl = srt[3].reshape(shp)
        wa = srt[4].reshape(shp)
        we = srt[5].reshape(shp)
        ot = jnp.stack([x.reshape(shp) for x in srt[6:9]], axis=-1)
        dt3 = jnp.stack([x.reshape(shp) for x in srt[9:12]], axis=-1)
    act = (fl & 1) != 0
    tile_bad = jnp.any(act, axis=1)
    order = jnp.argsort(
        jnp.where(tile_bad, 0, 1).astype(i32), stable=True
    )
    sel = order[:t_c]

    def g(x):
        return jnp.take(x, sel, axis=0)

    state0 = jnp.stack([
        g(ts),
        jax.lax.bitcast_convert_type(g(fl) + _FL_BIAS, f32),
        g(wa),
        g(we),
    ])
    ot_s, dt_s = g(ot), g(dt3)
    rays = jnp.stack([
        ot_s[..., 0], ot_s[..., 1], ot_s[..., 2],
        dt_s[..., 0], dt_s[..., 1], dt_s[..., 2],
    ])

    n_sub = sw_cont.shape[0]
    ns = int(round(n_sub ** (1 / 3)))
    while ns * ns * ns < n_sub:
        ns += 1
    nw = ns // 4
    nwg = (nw + (1 << _gs_for(nw)) - 1) >> _gs_for(nw)
    gw_pair = nwg ** 3 <= 2048
    if gw_pair:
        gw2 = _interleave_gw(gw_jump, gw_liq)
    else:
        gw2 = jnp.concatenate([gw_jump, gw_liq], axis=0)

    scal = jnp.zeros(27, f32).at[3].set(jnp.float32(v)).at[23].set(
        jnp.asarray(step_cap, f32)
    )
    st = _march4(
        scal, gw2, sw_cont, wmeta_pad, state0,
        sub_rounds=sub_rounds, sub_steps=sub_steps,
        rounds_cap=(rounds1 if t_c2 else rounds),
        nw=nw, ns=ns, nsx=1, interpret=interpret, rays=rays,
        s_ins=s_ins, w_ins=w_ins, n_sc=n_sc, gw_pair=gw_pair,
        s_seg=s_seg, wm_full=_wm_full_rows(nw),
    )
    if t_c2:
        # SECOND-LEVEL recursion, still in compacted space (sorts here
        # are t_c/T the cost of the frame-level ones): the resume
        # launch's own per-block round loop waits for ITS slowest ray,
        # so cap it at ``rounds1``, lane-compact the leftovers into
        # ``t_c2`` dense tiles, and run only those to the full budget.
        st1, st_rays = st, rays
        fl1 = jax.lax.bitcast_convert_type(st1[1], i32) - _FL_BIAS
        tce = int(st1[0].shape[0])      # = min(t_c, T) after the gather
        blt2 = 64 if tce % 64 == 0 else tce
        BL2 = blt2 * 128
        nB2 = tce // blt2

        def br2(x):
            return x.reshape(nB2, BL2)

        lkey2 = jnp.where((fl1 & 1) != 0, 0, 1).astype(i32)
        lidx2 = jnp.broadcast_to(
            jax.lax.broadcasted_iota(i32, (1, BL2), 1), (nB2, BL2)
        )
        srt2 = jax.lax.sort(
            (br2(lkey2), lidx2, br2(st1[0]), br2(fl1), br2(st1[2]),
             br2(st1[3]), br2(st_rays[0]), br2(st_rays[1]),
             br2(st_rays[2]), br2(st_rays[3]), br2(st_rays[4]),
             br2(st_rays[5])),
            dimension=-1, num_keys=1, is_stable=True,
        )
        shp2 = (tce, 128)
        lane_inv2 = srt2[1]
        ts1 = srt2[2].reshape(shp2)
        fl1s = srt2[3].reshape(shp2)
        wa1 = srt2[4].reshape(shp2)
        we1 = srt2[5].reshape(shp2)
        rays1 = [x.reshape(shp2) for x in srt2[6:12]]
        bad2 = jnp.any((fl1s & 1) != 0, axis=1)
        order2 = jnp.argsort(
            jnp.where(bad2, 0, 1).astype(i32), stable=True)
        sel2 = order2[:t_c2]

        def g2(x):
            return jnp.take(x, sel2, axis=0)

        state2 = jnp.stack([
            g2(ts1),
            jax.lax.bitcast_convert_type(g2(fl1s) + _FL_BIAS, f32),
            g2(wa1),
            g2(we1),
        ])
        rays2 = jnp.stack([g2(r) for r in rays1])
        st2 = _march4(
            scal, gw2, sw_cont, wmeta_pad, state2,
            sub_rounds=sub_rounds, sub_steps=sub_steps, rounds_cap=rounds,
            nw=nw, ns=ns, nsx=1, interpret=interpret, rays=rays2,
            s_ins=s_ins, w_ins=w_ins, n_sc=n_sc, gw_pair=gw_pair,
            s_seg=s_seg, wm_full=_wm_full_rows(nw),
        )
        ts1 = ts1.at[sel2].set(st2[0])
        fl1s = fl1s.at[sel2].set(
            jax.lax.bitcast_convert_type(st2[1], i32) - _FL_BIAS)
        wa1 = wa1.at[sel2].set(st2[2])
        we1 = we1.at[sel2].set(st2[3])
        uns2 = jax.lax.sort(
            (lane_inv2, br2(ts1), br2(fl1s), br2(wa1), br2(we1)),
            dimension=-1, num_keys=1, is_stable=True,
        )
        st = (
            uns2[1].reshape(shp2),
            jax.lax.bitcast_convert_type(
                uns2[2].reshape(shp2) + _FL_BIAS, f32),
            uns2[3].reshape(shp2),
            uns2[4].reshape(shp2),
        )
    fl2 = jax.lax.bitcast_convert_type(st[1], i32) - _FL_BIAS
    ts = ts.at[sel].set(st[0])
    fl = fl.at[sel].set(fl2)
    wa = wa.at[sel].set(st[2])
    we = we.at[sel].set(st[3])
    if lane_inv is not None:
        T = ts.shape[0]
        blt = 64 if T % 64 == 0 else T
        BL = blt * 128
        nB = T // blt
        uns = jax.lax.sort(
            (lane_inv, ts.reshape(nB, BL), fl.reshape(nB, BL),
             wa.reshape(nB, BL), we.reshape(nB, BL)),
            dimension=-1, num_keys=1, is_stable=True,
        )
        shp = (T, 128)
        ts = uns[1].reshape(shp)
        fl = uns[2].reshape(shp)
        wa = uns[3].reshape(shp)
        we = uns[4].reshape(shp)
    return (ts, fl, wa, we)


@partial(
    jax.jit,
    static_argnames=(
        "t_c", "rounds", "sub_rounds", "sub_steps", "v", "interpret",
        "width", "height", "s_ins", "w_ins", "n_sc", "lane_compact",
    ),
)
def _primary_retry4(
    ts, fl, wa, we, origin, inv_view, inv_proj, gw_jump, gw_liq,
    sw_cont, wmeta_pad, step_cap,
    *, t_c, rounds, sub_rounds, sub_steps, v, interpret, width, height,
    s_ins=32, w_ins=W_INS, n_sc=64, lane_compact=False,
):
    """Primary-leg flavor of :func:`_bounce_retry4`: the primary march
    synthesizes rays in-kernel, so the resume launch re-derives them
    from the camera at the XLA level first."""
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, _, T = _sb_dims(tx, ty)
    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, height, 0.0)
    shape = (T, 128)
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    lane_i = jax.lax.broadcasted_iota(i32, shape, 1)
    dx, dy, dz = _ray_dirs(
        [scal[i] for i in range(24)], tile_i, lane_i, nsx)
    ot = jnp.stack([
        jnp.broadcast_to(origin[0], shape),
        jnp.broadcast_to(origin[1], shape),
        jnp.broadcast_to(origin[2], shape),
    ], axis=-1)
    dt3 = jnp.stack([dx, dy, dz], axis=-1)
    return _bounce_retry4(
        ts, fl, wa, we, ot, dt3, gw_jump, gw_liq, sw_cont, wmeta_pad,
        step_cap, t_c=t_c, rounds=rounds, sub_rounds=sub_rounds,
        sub_steps=sub_steps, v=v, interpret=interpret, s_ins=s_ins,
        w_ins=w_ins, n_sc=n_sc, lane_compact=lane_compact,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "show_steps", "full_height", "warm", "with_flags",
        "s_ins", "w_ins", "grouped", "prepacked", "blk", "n_sc",
        "warm_gather", "s_seg", "vb", "warm_seg", "fused_shadow",
        "sparse_ns",
    ),
)
def _frame_fused4(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    origin, inv_view, inv_proj, lut,
    sky_color, sun_pos_local, sun_intensity,
    rounds=64, step_cap=None, warm_ids=None,
    sw_cont_pre=None, wmeta_pre=None,
    shadow_ambient=0.4,
    *, width, height, sub_rounds, sub_steps, v, interpret,
    show_steps=False, full_height=None, y0=0.0, warm=False,
    with_flags=False, s_ins=S_INS, w_ins=W_INS, grouped=False,
    prepacked=False, blk=_BLK, n_sc=N_SC, warm_gather=False, s_seg=1,
    vb=1, warm_seg=1, fused_shadow=False, sparse_ns=0,
):
    """One fused v4 frame: trace AND shade in a single kernel launch —
    the reference kernel's one-pass shape (ray_tracer.wgsl:173-316).
    Primary rays only, no shadows; returns packed u32[H,W] RGBA8
    (+ flags i32[H,W] when ``with_flags``, + the warm ids token).
    Bit-exact vs the split march|shade dispatches (same shade op order);
    skips the 33 MB/frame state-plane HBM round-trip and the shade
    dispatch entirely."""
    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)
    T_pad = -(-T // (blk * vb)) * (blk * vb)
    if sparse_ns:
        ns = int(sparse_ns)   # sparse table: row count is NOT ns cubed
    else:
        n_sub = (sw_cont_pre if prepacked else sw_solid).shape[0]
        ns = int(round(n_sub ** (1 / 3)))
        while ns * ns * ns < n_sub:
            ns += 1
    nw = ns // 4

    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(
        origin, jnp.asarray(inv_view, f32), jnp.asarray(inv_proj, f32),
        v, width, full_height, y0,
    )
    cap = jnp.asarray(step_cap, f32)
    scal = (
        scal.at[22].set(jnp.float32(sub_rounds))
        .at[23].set(cap)
        .at[24].set(1.0)
        .at[25].set(jnp.float32(tx))
        .at[26].set(jnp.float32(ty))
    )
    sv = sun_pos_local - origin
    sun_dir = sv / jnp.linalg.norm(sv)
    scal = jnp.concatenate([
        scal,
        sun_dir,
        jnp.asarray(sun_intensity, f32).reshape(1),
        jnp.asarray(sky_color, f32),
        # 34-36 sun POSITION (world-local) + 37 shadow ambient: the
        # fused shadow leg rebases hit rays toward the sun in-kernel
        jnp.asarray(sun_pos_local, f32).reshape(3),
        jnp.asarray(shadow_ambient, f32).reshape(1),
        jnp.zeros(5, f32),
    ])

    nwg = (nw + (1 << _gs_for(nw)) - 1) >> _gs_for(nw)
    gw_pair = nwg ** 3 <= 2048   # pair plane indexes the SUPER-CELL grid
    if gw_pair:
        gw2 = _interleave_gw(gw_jump, gw_liq)
    else:
        gw2 = jnp.concatenate([gw_jump, gw_liq], axis=0)
    if prepacked:
        sw_cont, wmeta_pad = sw_cont_pre, wmeta_pre
    else:
        sw_cont, wmeta_pad = _pack_tables4(
            wmeta, sw_meta, sw_solid, sw_liq, sw_pid
        )

    if warm:
        wtok = (
            warm_ids if warm_ids is not None
            else jnp.full(
                (T_pad // blk, 3 if sparse_ns else 2, 128), -1, i32)
        )
    else:
        wtok = None
    out = _march4(
        scal, gw2, sw_cont, wmeta_pad, None,
        sub_rounds=sub_rounds, sub_steps=sub_steps, rounds_cap=rounds,
        nw=nw, ns=ns, nsx=nsx, interpret=interpret,
        s_ins=s_ins, w_ins=w_ins, grouped=grouped, warm_ids=wtok, blk=blk,
        warm_gather=warm_gather, s_seg=s_seg, vb=vb, warm_seg=warm_seg,
        n_sc=n_sc, gw_pair=gw_pair, lut=lut, show_steps=show_steps,
        T=T_pad, fused_flags=with_flags, fused_shadow=fused_shadow,
        sparse=bool(sparse_ns),
        wm_full=_wm_full_rows(nw, sparse_ns),
    )
    out = list(out)
    pk = out.pop(0)
    fl = out.pop(0) if with_flags else None
    ids_out = out.pop(0) if warm else None
    if T_pad != T:
        pk = pk[:T]
        fl = fl[:T] if with_flags else None
    img = _untile_hw(pk, tx, ty, width, height)
    ret = (img,)
    if with_flags:
        ret = ret + (_untile_hw(fl, tx, ty, width, height),)
    if warm:
        ret = ret + (ids_out,)
    return ret if len(ret) > 1 else ret[0]


class PreparedGrid4(NamedTuple):
    """Packed HBM tables for the v4 kernel, computed once per world state
    by :func:`prepare_grid4` (re-packing them per frame costs ~6.7 ms at
    1080p — a quarter of the fused frame)."""

    sw_cont: jax.Array    # u32[Ns³,7,128] solid|liquid|pid×4|meta
    wmeta_pad: jax.Array  # u32[Nw³,1,128] interleaved window metas


class PreparedGrid4Sparse(NamedTuple):
    """SPARSE packed tables: content rows exist only for subwindows that
    actually need voxel bits (non-jump), with uniform-solid subwindows
    deduplicated to one canonical row per voxel id — the dense table at
    the reference's 80-chunk window would be ~15 GB (ui.rs:165), the
    sparse one is tens of MB on terrain worlds. The window-meta rows
    carry each window's 64 subwindow content-row indices in lanes
    64-127 (fetched and cached with the meta anyway), so the kernel's
    serve translates sid -> row through VMEM it already holds; content
    rows carry their sid at meta-plane lane 8 so warm tokens (which
    store row indices) verify on restore. Maintained incrementally by
    :meth:`~...world.render_grid.RenderGrid3Builder.prepared_sparse`."""

    sw_cont: jax.Array    # u32[R,7,128] sparse content rows
    wmeta_pad: jax.Array  # u32[Nw³,1,128] metas + index lanes 64-127
    ns: int               # subwindows per axis (can't be derived from R)


@jax.jit
def _pack_tables4(wmeta, sw_meta, sw_solid, sw_liq, sw_pid):
    sw_meta_i = _interleave_meta(sw_meta)
    sw_cont = jnp.concatenate(
        [
            sw_solid[:, None, :],
            sw_liq[:, None, :],
            sw_pid,
            jnp.pad(
                sw_meta_i, ((0, 0), (0, 128 - sw_meta_i.shape[1]))
            )[:, None, :],
        ],
        axis=1,
    )
    wmeta_i = _interleave_meta(wmeta)
    wmeta_pad = jnp.pad(
        wmeta_i, ((0, 0), (0, 128 - wmeta_i.shape[1]))
    )[:, None, :]
    return sw_cont, wmeta_pad


def prepare_grid4(rg: RenderGrid3) -> PreparedGrid4:
    """Pack a RenderGrid3's planes into the v4 kernel's HBM wire layout.

    Call once per world state and pass the result as ``prepared=`` to
    :func:`render_frame4` / :func:`trace_wavefront4`; frames then skip
    the per-frame table packing entirely. The token is a pure function
    of the grid — recompute it whenever the RenderGrid3 changes
    (:class:`~..models.raytracer.WavefrontRenderer` does this keyed on
    grid identity)."""
    return PreparedGrid4(*_pack_tables4(
        rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq, rg.sw_pid
    ))


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "shadows", "show_steps", "step_cap", "full_height",
        "warm", "s_ins", "w_ins", "grouped", "prepacked", "blk", "n_sc",
        "warm_gather", "s_seg", "vb",
    ),
)
def _render_frame4(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    origin, inv_view, inv_proj, lut,
    sky_color, sun_pos_local, sun_intensity, shadow_ambient,
    wc_p=None, wc_s=None, sw_cont_pre=None, wmeta_pre=None,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
    shadows, show_steps, step_cap=None, full_height=None, y0=0.0,
    warm=False, s_ins=S_INS, w_ins=W_INS, grouped=False, prepacked=False,
    blk=_BLK, n_sc=N_SC, warm_gather=False, s_seg=1, vb=1,
):
    """v4 frame: self-serving primary march (+ optional self-serving
    shadow march) + the v3 shade kernel. One Pallas launch per pass —
    no host round loop at all."""
    from .wavefront3 import _shade, _FL_HIT, _FL_AX

    full_height = height if full_height is None else full_height
    f32, i32 = jnp.float32, jnp.int32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)

    args = (gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid)
    z = jnp.zeros((), f32)
    cap = 0.0 if step_cap is None else float(step_cap)
    tr = _trace_frame4(
        *args, origin, inv_view, inv_proj, z, z, z,
        rounds, cap, wc_p, sw_cont_pre, wmeta_pre,
        width=width, height=height, sub_rounds=sub_rounds,
        sub_steps=sub_steps, v=v, interpret=interpret, raw_out=True,
        full_height=full_height, y0=y0, warm=warm,
        s_ins=s_ins, w_ins=w_ins, grouped=grouped, prepacked=prepacked,
        blk=blk, n_sc=n_sc, warm_gather=warm_gather, s_seg=s_seg, vb=vb,
    )
    if warm:
        ts, fl, wa, we, ids_p = tr
    else:
        ts, fl, wa, we = tr
        ids_p = None

    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)

    sh = jnp.zeros((T, 128), i32)
    if shadows:
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
        trs = _trace_frame4(
            *args, jnp.zeros(3, f32), inv_view, inv_proj, ot, dt3, hitm,
            rounds, cap, wc_s, sw_cont_pre, wmeta_pre,
            width=width, height=height, sub_rounds=sub_rounds,
            sub_steps=sub_steps, v=v, interpret=interpret,
            per_ray=True, raw_out=True, warm=warm,
            s_ins=s_ins, w_ins=w_ins, grouped=grouped, prepacked=prepacked,
            blk=blk, n_sc=n_sc, warm_gather=warm_gather, s_seg=s_seg, vb=vb,
        )
        if warm:
            _, fls, _, _, ids_s = trs
        else:
            _, fls, _, _ = trs
            ids_s = None
        sh = (fls >> _FL_HIT) & 1
    else:
        ids_s = wc_s  # no shadow pass: pass the caller's token through

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
    out = (
        _untile_hw(packed, tx, ty, width, height),
        _untile_hw(fl, tx, ty, width, height),
    )
    if warm:
        out = out + ((ids_p, ids_s),)
    return out


@partial(
    jax.jit,
    static_argnames=("width", "height", "full_height", "v", "nsx", "y0"),
)
def _shadow_prep4(ts, fl, origin, inv_view, inv_proj, sun_pos_local,
                  *, width, height, full_height, v, nsx, y0=0.0):
    """Per-ray shadow bundle from the primary march's raw products:
    hit point (normal-nudged) -> sun direction, active where hit."""
    f32, i32 = jnp.float32, jnp.int32
    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)
    shape = ts.shape
    tile_i = jax.lax.broadcasted_iota(i32, shape, 0)
    lane_i = jax.lax.broadcasted_iota(i32, shape, 1)
    dx, dy, dz = _ray_dirs([scal[i] for i in range(24)], tile_i, lane_i, nsx)
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
    return ot, dt3, hitm


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "full_height", "v", "nsx", "show_steps",
        "shadows", "max_steps", "with_flags", "interpret", "y0",
    ),
)
def _shade_fin4(origin, inv_view, inv_proj, lut, sky_color, sun_pos_local,
                sun_intensity, shadow_ambient, ts, fl, wa, we, sh_fl,
                *, width, height, full_height, v, nsx, show_steps,
                shadows, max_steps, with_flags, interpret, y0=0.0):
    """Shade + untile as a dispatch of its own. Keeping the march and the
    shade in SEPARATE executables measures 15.0 vs 18-20 ms/frame at 1080p
    on the v5e (sky scenes: 4.7 vs 7.7+) — the monolithic program carries
    multi-ms scheduling overhead on this runtime, the split pipelines."""
    from .wavefront3 import _shade

    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    scal = _cam_scal(origin, inv_view, inv_proj, v, width, full_height, y0)
    sv = sun_pos_local - origin
    sun_dir = sv / jnp.linalg.norm(sv)
    scal2 = jnp.concatenate([
        scal,
        sun_dir,
        jnp.asarray([sun_intensity], f32).reshape(1),
        jnp.asarray(sky_color, f32),
        jnp.asarray([shadow_ambient], f32).reshape(1),
        jnp.zeros(8, f32),
    ])
    sh = ((sh_fl >> _FL_HIT) & 1) if shadows else jnp.zeros_like(fl)
    packed = _shade(
        scal2, lut[None], ts, fl, wa, we, sh,
        nsx=nsx, show_steps=show_steps, shadows=shadows,
        max_steps=max_steps, interpret=interpret,
    )
    tx = width // TILE_W
    ty = height // TILE_H
    img = _untile_hw(packed, tx, ty, width, height)
    if with_flags:
        return img, _untile_hw(fl, tx, ty, width, height)
    return img


def render_frame4(
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
    rounds=64,
    steps_per_round=128,
    step_cap=None,
    interpret=None,
    with_flags=False,
    cache=None,
    return_cache=False,
    s_ins=S_INS,
    w_ins=W_INS,
    grouped=False,
    prepared=None,
    blk=_BLK,
    n_sc=N_SC,
    fused=False,
    warm_gather=False,
    s_seg=1,
    vb=1,
    warm_seg=1,
    shadow_rounds=None,
    compact_tiles=0,
    primary_rounds=None,
    compact_lanes=False,
):
    """One shaded frame through the v4 self-serving path -> u32[H,W] RGBA8.

    Same products and shading as :func:`~.wavefront3.render_frame3`;
    march service happens inside the kernel and ``rounds`` is only a
    safety bound. ``cache``/``return_cache``: warm-start token pair
    (primary, shadow) of per-block cache-ID planes — see
    :func:`trace_wavefront4`. ``prepared``: a :func:`prepare_grid4`
    token; skips the ~6.7 ms/frame table packing for static worlds.
    ``fused``: shade inside the march kernel itself — ONE launch for
    the whole frame, the reference kernel's shape
    (ray_tracer.wgsl:173-316); bit-exact vs the split dispatches. With
    ``shadows=True`` the shadow leg ALSO runs inside that launch: hit
    rays rebase toward the sun and re-march on the primary leg's warm
    cache (the reference shades shadows in the same pass too).

    ``shadow_rounds``/``compact_tiles``: straggler re-batching for the
    shadow leg — cap its in-kernel serve rounds, then resume the tiles
    still carrying active rays in one dense compacted launch
    (:func:`_bounce_retry4`). Bit-exact whenever stragglers fit the
    capacity; grazing-sun terrain rays otherwise pin whole blocks."""
    from .wavefront3 import color_lut_rows

    width, height = cam.proj_size
    if interpret is None:
        interpret = _interpret_default()
    wm = rg.world_min if world_min is None else world_min
    wm = jnp.asarray(wm, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm
    sun_local = jnp.asarray(sun_pos, jnp.float32) - wm
    lut = (jnp.asarray(materials_color)
           if getattr(materials_color, "shape", None) == (6, 128)
           else color_lut_rows(materials_color))
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    warm = bool(return_cache or cache is not None)
    wc_p, wc_s = cache if cache is not None else (None, None)

    # Split dispatches: primary march | (shadow march) | shade+untile.
    # Bit-exact vs the monolithic _render_frame4 (kept for the shard_map
    # path) and measurably faster — see _shade_fin4's docstring.
    f32 = jnp.float32
    iv = jnp.asarray(cam.inv_view, f32)
    ip = jnp.asarray(cam.inv_proj, f32)
    z = jnp.zeros((), f32)
    v = int(rg.size_voxels)
    capf = 0.0 if step_cap is None else float(step_cap)
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, _, _ = _sb_dims(tx, ty)
    spre = None if prepared is None else prepared.sw_cont
    wpre = None if prepared is None else prepared.wmeta_pad
    sparse_ns = (
        int(prepared.ns)
        if isinstance(prepared, PreparedGrid4Sparse) else 0
    )
    if sparse_ns:
        assert s_seg == 1 and warm_seg == 1 and not warm_gather \
            and not grouped and not compact_tiles, \
            "sparse tables: v1 supports plain serve + in-kernel warm"
    common = dict(
        width=width, height=height, sub_rounds=sub_rounds,
        sub_steps=sub_steps, v=v, interpret=bool(interpret), raw_out=True,
        warm=warm, s_ins=int(s_ins), w_ins=int(w_ins),
        grouped=bool(grouped), prepacked=prepared is not None,
        blk=int(blk), n_sc=int(n_sc), warm_gather=bool(warm_gather),
        s_seg=int(s_seg), vb=int(vb), warm_seg=int(warm_seg),
        sparse_ns=sparse_ns,
    )
    planes = (rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid,
              rg.sw_liq, rg.sw_pid)

    if fused:
        # shadows=True runs the fused SHADOW leg in the same launch:
        # after the primary march converges, hit rays rebase toward the
        # sun and re-run the round loop on the same warm cache; shading
        # applies the ambient factor in-kernel. ONE launch per frame,
        # bit-exact vs the split dispatches
        # (tests/test_wavefront4.py::test_v4_fused_shadow_matches_split).
        out = _frame_fused4(
            *planes, origin, iv, ip, lut,
            jnp.asarray(sky_color, f32), sun_local,
            jnp.float32(sun_intensity),
            rounds, capf, wc_p, spre, wpre,
            jnp.float32(shadow_ambient), fused_shadow=bool(shadows),
            sparse_ns=sparse_ns,
            width=width, height=height, sub_rounds=sub_rounds,
            sub_steps=sub_steps, v=v, interpret=bool(interpret),
            show_steps=bool(show_steps), warm=warm,
            with_flags=bool(with_flags), s_ins=int(s_ins),
            w_ins=int(w_ins), grouped=bool(grouped),
            prepacked=prepared is not None, blk=int(blk), n_sc=int(n_sc),
            warm_gather=bool(warm_gather), s_seg=int(s_seg), vb=int(vb),
            warm_seg=int(warm_seg),
        )
        if not isinstance(out, tuple):
            out = (out,)
        out = list(out)
        img = out.pop(0)
        fl_img = out.pop(0) if with_flags else None
        ids_p = out.pop(0) if warm else None
        ret = (img, fl_img) if with_flags else (img,)
        if return_cache:
            ret = ret + ((ids_p, wc_s),)
        return ret if len(ret) > 1 else ret[0]

    p_rounds = rounds if primary_rounds is None else int(primary_rounds)
    tr = _trace_frame4(
        *planes, origin, iv, ip, z, z, z, p_rounds, capf, wc_p, spre,
        wpre, **common,
    )
    if warm:
        ts, fl, wa, we, ids_p = tr
    else:
        ts, fl, wa, we = tr
        ids_p = None

    if primary_rounds is not None and compact_tiles and not sparse_ns:
        # cap + compact-resume for the PRIMARY leg (same straggler
        # re-batching as the bounce/shadow legs; rays re-derived from
        # the camera since the primary synthesizes them in-kernel)
        if prepared is not None:
            swc_r, wmp_r = spre, wpre
        else:
            swc_r, wmp_r = _pack_tables4(
                rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq, rg.sw_pid)
        ts, fl, wa, we = _primary_retry4(
            ts, fl, wa, we, origin, iv, ip, rg.gw_jump, rg.gw_liq,
            swc_r, wmp_r, capf,
            t_c=-(-int(compact_tiles) // 64) * 64, rounds=rounds,
            sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
            interpret=bool(interpret), width=width, height=height,
            lane_compact=int(compact_lanes),
        )

    sh_fl = fl  # unused when shadows=False (static in _shade_fin4)
    if shadows:
        ot, dt3, hitm = _shadow_prep4(
            ts, fl, origin, iv, ip, sun_local,
            width=width, height=height, full_height=height, v=v, nsx=nsx,
        )
        s_rounds = rounds if shadow_rounds is None else int(shadow_rounds)
        trs = _trace_frame4(
            *planes, jnp.zeros(3, f32), iv, ip, ot, dt3, hitm,
            s_rounds, capf, wc_s, spre, wpre, per_ray=True, **common,
        )
        if warm:
            ts_s, sh_fl, wa_s, we_s, ids_s = trs
        else:
            ts_s, sh_fl, wa_s, we_s = trs
            ids_s = None
        if compact_tiles:
            if prepared is not None:
                swc_r, wmp_r = spre, wpre
            else:
                swc_r, wmp_r = _pack_tables4(
                    rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
                    rg.sw_pid,
                )
            _, sh_fl, _, _ = _bounce_retry4(
                ts_s, sh_fl, wa_s, we_s, ot, dt3, rg.gw_jump, rg.gw_liq,
                swc_r, wmp_r, capf,
                t_c=-(-int(compact_tiles) // 64) * 64, rounds=rounds,
                sub_rounds=sub_rounds, sub_steps=sub_steps, v=v,
                interpret=bool(interpret),
                lane_compact=int(compact_lanes),
            )
    else:
        ids_s = wc_s  # no shadow pass: pass the caller's token through

    out = _shade_fin4(
        origin, iv, ip, lut,
        jnp.asarray(sky_color, f32), sun_local,
        jnp.float32(sun_intensity), jnp.float32(shadow_ambient),
        ts, fl, wa, we, sh_fl,
        width=width, height=height, full_height=height, v=v, nsx=nsx,
        show_steps=bool(show_steps), shadows=bool(shadows),
        max_steps=rounds * sub_rounds * sub_steps,
        with_flags=bool(with_flags), interpret=bool(interpret),
    )
    img, fl_img = out if with_flags else (out, None)
    tok = (ids_p, ids_s) if warm else None
    ret = (img, fl_img) if with_flags else (img,)
    if return_cache:
        ret = ret + (tok,)
    return ret if len(ret) > 1 else ret[0]


def path_trace4(rg: RenderGrid3, cam, materials, **kw):
    """Path-traced frame with every bounce marched by the self-serving v4
    kernel -> f32[H,W,3] radiance. Same semantics as
    :func:`~.wavefront3.path_trace3` (path_tracer.wgsl:149-194 completed)."""
    from .wavefront3 import path_trace3

    return path_trace3(rg, cam, materials, v4=True, **kw)


def trace_wavefront4(
    rg: RenderGrid3,
    origin,
    *,
    cam=None,
    width=None,
    height=None,
    rounds=64,
    steps_per_round=128,
    step_cap=None,
    interpret=None,
    s_ins=S_INS,
    w_ins=W_INS,
    grouped=False,
    cache=None,
    return_cache=False,
    prepared=None,
    blk=_BLK,
    n_sc=N_SC,
):
    """March one frame through the self-serving v4 kernel.

    Service happens inside the kernel (batched async DMA from the HBM
    content tables), so ``rounds`` is only a safety bound — every stall
    is served the round it occurs and converged blocks exit immediately.

    ``cache``/``return_cache``: the warm-start token — an i32[nB,2,128]
    plane of last frame's per-block cache IDS. Contents are always
    re-fetched (edit-safe); a warm frame skips most cold serve rounds on
    temporally coherent cameras. Pass ``return_cache=True`` to get
    ``(result, token)`` back; feed the token to the next frame.
    """
    assert cam is not None, "trace_wavefront4 needs cam=CamData"
    if width is None or height is None:
        width, height = cam.proj_size
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    z = jnp.zeros((), jnp.float32)
    out = _trace_frame4(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        z, z, z, rounds, 0.0 if step_cap is None else step_cap,
        cache,
        None if prepared is None else prepared.sw_cont,
        None if prepared is None else prepared.wmeta_pad,
        width=width, height=height,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), s_ins=int(s_ins), w_ins=int(w_ins),
        grouped=bool(grouped),
        warm=bool(return_cache or cache is not None),
        prepacked=prepared is not None, blk=int(blk), n_sc=int(n_sc),
        sparse_ns=(int(prepared.ns)
                   if isinstance(prepared, PreparedGrid4Sparse) else 0),
    )
    if return_cache:
        return out
    if cache is not None:
        return out[0]
    return out


def trace_wavefront4_rays(
    rg: RenderGrid3,
    origins,
    dirs,
    active,
    *,
    width,
    height,
    rounds=64,
    steps_per_round=128,
    step_cap=None,
    interpret=None,
    s_ins=S_INS,
    w_ins=W_INS,
):
    """Per-ray (origin, direction) bundles through the v4 kernel — the
    secondary-ray path (shadows, bounces)."""
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    if interpret is None:
        interpret = _interpret_default()
    sub_steps = 8
    sub_rounds = max(steps_per_round // sub_steps, 1)
    eye = jnp.eye(4, dtype=jnp.float32)
    return _trace_frame4(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid,
        jnp.zeros(3, jnp.float32), eye, eye,
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32),
        jnp.asarray(active, bool), rounds,
        0.0 if step_cap is None else step_cap,
        width=width, height=height,
        sub_rounds=sub_rounds, sub_steps=sub_steps, v=int(rg.size_voxels),
        interpret=bool(interpret), per_ray=True,
        s_ins=int(s_ins), w_ins=int(w_ins),
    )

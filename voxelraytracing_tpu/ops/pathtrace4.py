"""Fused in-kernel path tracer: trace + bounce + shade in ONE launch.

The XLA-route path tracer (wavefront3._path_frame) runs one v4 kernel
launch PER BOUNCE LEG plus XLA glue between legs (material gathers, RNG,
ray rebasing) — measured 118 ms/frame at 1080p 1-bounce on the preset
world, with ~85 ms in the incoherent bounce launch alone. This module is
the reference's path_tracer.wgsl shape instead (a dedicated one-pass
kernel, separate from the primary tracer, path_tracer.wgsl:149-226):
every ray traces, bounces, and shades INSIDE one self-serving kernel
program:

  * rays are CARRIED state (origin/direction live in the round-loop
    carry, not closures), so a ray rebases itself at a bounce and keeps
    marching in the same program — no per-leg launches, no state-plane
    HBM round-trips, and the block's subwindow cache stays live across
    the bounce (the secondary ray starts exactly where the primary
    stopped);
  * bounce transitions happen per-ray at sub-round boundaries (where hit
    voxels already decode): hit rays fetch material rows from the
    in-VMEM LUT, accumulate emission, sample a scatter direction with
    the on-core PRNG (pltpu.prng_random_bits -> Box-Muller), and
    reactivate; missed rays accumulate sky and finalize — blocks with
    mixed bounce depths keep marching together, pure wavefront style;
  * radiance accumulates in-register across ``samples`` (the primary
    trace is NOT shared across samples — each sample re-traces from the
    camera, but against a warm in-VMEM cache, which is far cheaper than
    the XLA route's per-sample bounce launches).

Shading semantics mirror wavefront3._path_frame exactly (same sky
gradient, Beer-Lambert water absorption, emission/albedo/scatter mix,
normal-from-axis + eps rebase), but the RNG differs (counter-hash keyed
on ray id + bounce index vs jax.random.normal), so images agree with
path_trace3 statistically and EXACTLY on RNG-free paths (bounces=0, or
scatter=0 materials where the bounce is deterministic specular — pinned
in tests/test_pathtrace4.py).

MEASURED RESULT (1080p 1-bounce, preset world, v5e, quality-gated at
<=0.33% of pixels >1/255 from a rounds=256 reference): 132 ms/frame vs
the XLA route's 118.6 at equal slop — the one-launch design LOSES ~11%.
Root cause: the per-leg launches of the XLA route act as a global
re-batching barrier — every block restarts with a dense set of same-leg
rays — while in-kernel bouncing leaves each block looping until its
LAST straggler finishes both legs (round_cond is per-block, and a
handful of deep-crevice rays pin 8K-ray blocks for dozens of rounds).
Segmented serve fetches look dramatically faster here (97 ms at s_seg=8,
76 at 16) but are truncation artifacts: one base id per DMA serves
scattered wants at 1/round and blocks exit on the rounds cap UNCONVERGED
(13-25% of pixels wrong) — always quality-gate PT timings against a
high-rounds reference. Kept as the tested one-pass alternative (it is
the reference's own kernel shape and the deterministic-RNG variant);
config3 ships on the XLA route.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import (
    BRICK,
    EPS_T,
    TILE_H,
    TILE_W,
    _BIG,
    _BIG_IV,
)
from .wavefront3 import (
    SB_H,
    SB_W,
    SW,
    WIN,
    _BIGI,
    _BLK,
    RenderGrid3,
    _cam_scal,
    _gs_for,
    _interpret_default,
    _ray_dirs,
    _sb_dims,
    _untile_hw,
    material_lut_rows,
)
from .wavefront4 import (
    N_SC,
    N_WC,
    S_INS,
    W_INS,
    _gather8,
    _interleave_gw,
    _pack_tables4,
)

_WATER_ABSORB = (0.35, 0.08, 0.04)  # per-voxel-length (_path_frame)
_EPS_N = 4.0 * 1e-3                 # bounce-origin normal nudge


def _pt_kernel4(
    scal_ref, gw_ref, mlut_ref, swc_ref, wmp_ref, lrgb_o,
    stage, wstage, ssem, wsem, csol, cliq, cpid,
    *, sub_rounds, sub_steps, rounds_cap, nw, ns, nsx,
    s_ins, w_ins, n_sc, gw_pair, bounces, samples, s_seg=1,
):
    """One path-tracing block program.

    scal_ref  SMEM f32[40]: 0-26 as the march kernel (origin, v, proj,
              cam affine, y0, srd | cap | init | tx | ty), then
              27-29 sun POSITION (world-local), 30 sun intensity,
              31-33 sky color, 34-37 PRNG seed quads (16-bit ints).
    gw_ref    VMEM u32[2,128] global planes (pair row when gw_pair)
    mlut_ref  VMEM f32[10,128]: e0 e1 s0 s1 r0 r1 g0 g1 b0 b1
              (material_lut_rows layout)
    swc/wmp   ANY: packed subwindow content / window metas (DMA sources)
    lrgb_o    VMEM f32[3,BLK,128]: accumulated linear radiance planes
    scratch:  as the march kernel.
    """
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    v = scal_ref[3]
    bigi = jnp.int32(_BIGI)
    blk = lrgb_o.shape[1]
    lanes = jax.lax.broadcasted_iota(i32, (blk, 128), 1)
    lane_row = jax.lax.broadcasted_iota(i32, (1, 128), 1)
    rows = jax.lax.broadcasted_iota(i32, (blk, 128), 0)
    tg = pl.program_id(0) * blk + rows

    gj_row = jnp.broadcast_to(gw_ref[0:1, :], (blk, 128))
    gl_row = jnp.broadcast_to(gw_ref[1:2, :], (blk, 128))

    def bit_of(row, word_i, sh, bounded=False):
        wi = word_i if bounded else jnp.clip(word_i, 0, 127)
        wd = jnp.take_along_axis(row, wi, axis=1)
        return ((wd >> sh.astype(u32)) & 1).astype(i32)

    def pair_of(row, word_i, sh, bounded=False):
        wi = word_i if bounded else jnp.clip(word_i, 0, 127)
        wd = jnp.take_along_axis(row, wi, axis=1)
        return ((wd >> sh.astype(u32)) & 3).astype(i32)

    # ---- cache state (identical layout to the march kernel) -----------
    wid0 = jnp.full((N_WC, 128), -1, i32)
    sid0 = jnp.full((n_sc, 128), -1, i32)
    wm0 = jnp.zeros((1, 128), u32)
    n_smr = max(n_sc // 16, 1)
    sm0 = jnp.zeros((8, 128), u32)
    wrow_iota = jax.lax.broadcasted_iota(i32, (N_WC, 128), 0)
    srow_iota = jax.lax.broadcasted_iota(i32, (n_sc, 128), 0)
    smrow_iota = jax.lax.broadcasted_iota(i32, (8, 128), 0)
    lane8 = jax.lax.broadcasted_iota(i32, (8, 128), 1)

    def sm_sel(sm_rows, tslot):
        sm_b = jnp.broadcast_to(sm_rows[0:1], (blk, 128))
        for r in range(1, n_smr):
            sm_b = jnp.where(
                (tslot >> 4) == r,
                jnp.broadcast_to(sm_rows[r:r + 1], (blk, 128)), sm_b,
            )
        return sm_b

    def sm_merge(sm_rows, mrow, slot, ok):
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

    gs = _gs_for(nw)
    nwg = (nw + (1 << gs) - 1) >> gs

    cap_f = scal_ref[23]
    step_cap = jnp.where(cap_f > 0.5, cap_f, jnp.float32(1e9)).astype(i32)

    # ---- ray-parametric geometry helpers -------------------------------
    def ray_inv(d):
        c2 = jnp.where(d >= 0, jnp.maximum(d, 1e-7), jnp.minimum(d, -1e-7))
        return 1.0 / c2

    def ray_t_exit(rays):
        ox, oy, oz, dx, dy, dz = rays

        def slab(oc, ivc):
            return jnp.maximum((0.0 - oc) * ivc, (v - oc) * ivc)

        ivx, ivy, ivz = ray_inv(dx), ray_inv(dy), ray_inv(dz)
        t_cap = 4.0 * v + 16.0
        return jnp.minimum(
            jnp.minimum(
                slab(ox, ivx), jnp.minimum(slab(oy, ivy), slab(oz, ivz))
            ),
            t_cap,
        )

    def classify(t, rays, wid_all, sid_all, wm_row, need_sslot=True):
        ox, oy, oz, dx, dy, dz = rays
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        vx = jnp.floor(px).astype(i32)
        vy = jnp.floor(py).astype(i32)
        vz = jnp.floor(pz).astype(i32)

        w = (vx >> 6) + (vy >> 6) * nw + (vz >> 6) * nw * nw
        if gs:
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

        wslot = jnp.full((blk, 128), -1, i32)
        for k in range(N_WC):
            wid_k = wid_all[k:k + 1, :]
            wslot = jnp.where((w == wid_k) & (wid_k >= 0), i32(k), wslot)

        s_loc = (
            ((vx >> 4) & 3) + ((vy >> 4) & 3) * 4 + ((vz >> 4) & 3) * 16
        )
        mbase = jnp.maximum(wslot, 0) * 8 + (s_loc >> 4)
        wm_b = jnp.broadcast_to(wm_row, (blk, 128))
        sw_pair = pair_of(wm_b, mbase, (s_loc & 15) * 2, bounded=True)
        sw_jump = (sw_pair & 1) != 0
        sw_liq = (sw_pair & 2) != 0

        s = (vx >> 4) + (vy >> 4) * ns + (vz >> 4) * ns * ns
        sslot = jnp.full((blk, 128), -1, i32)
        if need_sslot:
            for k in range(n_sc):
                sid_k = sid_all[k:k + 1, :]
                sslot = jnp.where((s == sid_k) & (sid_k >= 0), i32(k), sslot)

        return (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
                sw_jump, sw_liq, s, sslot)

    def boundary(t, active_i, rays, cch):
        active = active_i != 0
        (_, _, _, _, _, _, _, g_jump, _, wslot, sw_jump, _, s, sslot) = \
            classify(t, rays, cch[0], cch[1], cch[2])
        need = active & ~g_jump & (wslot >= 0) & ~sw_jump
        skey = jnp.where(need & (sslot >= 0), s, bigi)
        smin = jnp.min(skey, axis=1, keepdims=True)
        tsid = jnp.where(smin < bigi, smin, -1)
        tslot = jnp.zeros((blk, 1), i32)
        solid_row = jnp.zeros((blk, 128), u32)
        liq_row = jnp.zeros((blk, 128), u32)
        pid_rows = [jnp.zeros((blk, 128), u32) for _ in range(4)]
        for k in range(n_sc):
            sid_k = cch[1][k:k + 1, :1]
            eq = (tsid == sid_k) & (sid_k >= 0)
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

    def ray_geom(rays):
        """Direction-derived march constants; rays only change at round
        boundaries, so this is hoisted out of the per-step hot loop
        (recomputing it per step measured ~15% of the march)."""
        _, _, _, dx, dy, dz = rays
        ivx, ivy, ivz = ray_inv(dx), ray_inv(dy), ray_inv(dz)
        sx = (dx > 0.0).astype(f32)
        sy = (dy > 0.0).astype(f32)
        sz = (dz > 0.0).astype(f32)
        return (ivx, ivy, ivz, sx, sy, sz, ray_t_exit(rays))

    def step(c, rays, geom, rows_c, cch):
        wid_all, sid_all, wm_row, sm_row = cch
        tsid, tslot, solid_row, liq_row, pid_rows = rows_c
        t, active_i, hit_i, axmask, vox, water, wenter, stp = c
        ox, oy, oz, dx, dy, dz = rays
        ivx, ivy, ivz, sx, sy, sz, t_exit = geom
        active = (active_i != 0) & (t < t_exit)
        hit = hit_i != 0

        (px, py, pz, vx, vy, vz, w, g_jump, g_liq, wslot,
         sw_jump, sw_liq, s, _) = classify(
            t, rays, wid_all, sid_all, wm_row, need_sslot=False)

        inw = (
            (px >= 0.0) & (py >= 0.0) & (pz >= 0.0)
            & (px < v) & (py < v) & (pz < v)
        )
        active = active & inw & (stp < step_cap)

        at_ts = s == tsid
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

        def axis(pc, ivc, sgn):
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

        progressed = jnp.any(march | hit_now).astype(i32)
        return (t, active.astype(i32), hit.astype(i32), axmask, vox, water,
                wenter, stp), progressed

    def decode_hits(c, rays, tslot, pid_rows, sm_row):
        t, active_i, hit_i, axmask, vox, water, wenter, stp = c
        ox, oy, oz, dx, dy, dz = rays
        undec = (hit_i != 0) & (vox == 0)
        vx = jnp.floor(ox + dx * t).astype(i32)
        vy = jnp.floor(oy + dy * t).astype(i32)
        vz = jnp.floor(oz + dz * t).astype(i32)
        l = (vx & 15) + (vy & 15) * 16 + (vz & 15) * 256
        li, lsh = l >> 5, l & 31
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

    # ---- in-kernel service (identical to the march kernel) ------------
    def serve(t, active_i, rays, cch, wctr, sctr):
        wid_all, sid_all, wm_row, sm_row = cch
        (_, _, _, _, _, _, w, g_jump, _, wslot, _, _, _, _) = \
            classify(t, rays, wid_all, sid_all, wm_row, need_sslot=False)
        t_exit = ray_t_exit(rays)
        alive = (active_i != 0) & (t < t_exit)
        wstall = alive & ~g_jump & (wslot < 0)
        wkey = jnp.where(wstall, w, bigi)

        wpicks = []
        for j in range(w_ins):
            wj = jnp.min(wkey)
            ok = wj < bigi
            wpicks.append((wj, ok))
            wkey = jnp.where(wkey == wj, bigi, wkey)

            @pl.when(ok)
            def _(wj=wj, j=j):
                pltpu.make_async_copy(
                    wmp_ref.at[wj], wstage.at[j], wsem.at[j]
                ).start()

        for j, (wj, ok) in enumerate(wpicks):
            slot = (wctr + j) % N_WC

            @pl.when(ok)
            def _(wj=wj, j=j):
                pltpu.make_async_copy(
                    wmp_ref.at[wj], wstage.at[j], wsem.at[j]
                ).wait()

            mrow = wstage[j]
            slot8 = slot * 8
            src = _gather8(mrow, jnp.clip(lane_row - slot8, 0, 127))
            sel = (lane_row >= slot8) & (lane_row < slot8 + 8) & ok
            wm_row = jnp.where(sel, src, wm_row)
            wid_all = jnp.where((wrow_iota == slot) & ok, wj, wid_all)

        (_, _, _, _, _, _, _, g_jump, _, wslot, sw_jump, _, s, sslot) = \
            classify(t, rays, wid_all, sid_all, wm_row)
        sstall = (
            alive & ~g_jump & (wslot >= 0) & ~sw_jump & (sslot < 0)
        )
        skey = jnp.where(sstall, s, bigi)
        # segmented fetch (s_seg consecutive rows per DMA) — see the
        # march kernel's serve for rationale
        n3 = ns * ns * ns
        spicks = []
        for i in range(s_ins // s_seg):
            sj = jnp.min(skey)
            ok = sj < bigi
            start = jnp.minimum(sj, i32(n3 - s_seg)) if s_seg > 1 else sj
            spicks.append((start, ok))
            if s_seg > 1:
                served = (skey >= start) & (skey < start + s_seg)
                skey = jnp.where(served, bigi, skey)
            else:
                skey = jnp.where(skey == sj, bigi, skey)

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

    # ---- shading / bounce ----------------------------------------------
    sun_px, sun_py, sun_pz = scal_ref[27], scal_ref[28], scal_ref[29]
    sun_inten = scal_ref[30]
    sky_r, sky_g, sky_b = scal_ref[31], scal_ref[32], scal_ref[33]
    kx, ky, kz = _WATER_ABSORB

    def sstep(e0, e1, x):
        q = jnp.clip((x - e0) * (1.0 / (e1 - e0)), 0.0, 1.0)
        return q * q * (3.0 - 2.0 * q)

    def sky_rgb(rays):
        # mirrors wavefront3._path_frame.sky_rgb exactly
        ox, oy, oz, dX, dY, dZ = rays
        gts = sstep(-0.01, 0.0, dY)
        grad_t = sstep(0.0, 0.4, dY) ** 0.35
        svx = sun_px - ox
        svy = sun_py - oy
        svz = sun_pz - oz
        sn = jnp.sqrt(svx * svx + svy * svy + svz * svz)
        sdot = (dX * svx + dY * svy + dZ * svz) / sn
        sun = ((sdot > 0.99) & (gts >= 1.0)).astype(f32) * sun_inten

        def chanl(h, vd, sc):
            g = h + (sc - h) * grad_t
            return vd + (g - vd) * gts + sun

        return (chanl(f32(1.0), f32(0.03), sky_r),
                chanl(f32(0.3), f32(0.03), sky_g),
                chanl(f32(0.0), f32(0.03), sky_b))

    def mat_fetch(vox):
        lo = vox & 127
        hi = vox >> 7

        def chan(i):
            a = jnp.take_along_axis(
                jnp.broadcast_to(mlut_ref[i:i + 1], (blk, 128)), lo, axis=1
            )
            b = jnp.take_along_axis(
                jnp.broadcast_to(mlut_ref[i + 1:i + 2], (blk, 128)), lo,
                axis=1,
            )
            return jnp.where(hi != 0, b, a)

        return chan(0), chan(2), chan(4), chan(6), chan(8)

    # Counter-based per-ray RNG: murmur3 finalizer over
    # (ray id, BOUNCE index, seed). Platform-independent integer ops, so
    # the SAME image comes out of interpret mode and the chip (unlike
    # pltpu.prng_random_bits, which has no CPU lowering), and keying on
    # the ray's bounce index (not a round counter) makes frames
    # bit-stable across serve-pacing knobs (s_seg/s_ins/rounds) — WHEN a
    # ray transitions can't change WHAT it draws.
    ray_id = (tg * 128 + lanes).astype(u32)

    def rand_u01(ctr, j, sbase):
        h = ray_id ^ (ctr.astype(u32) * u32(0x9E3779B9)) ^ sbase
        h = h ^ u32((j * 0x632BE5AB) & 0xFFFFFFFF)
        h = h ^ (h >> 16)
        h = h * u32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * u32(0xC2B2AE35)
        h = h ^ (h >> 16)
        # 23 mantissa-exact bits in (0,1): never 0, so ln(u) is finite.
        # (cast via i32: Mosaic has no u32->f32 lowering; >>9 keeps the
        # value in 23 bits, sign-safe)
        return (h >> 9).astype(i32).astype(f32) * f32(1.0 / (1 << 23)) \
            + f32(1.0 / (1 << 24))

    def transition(c, rays, path, valid, sbase):
        """Per-ray shade/bounce at a sub-round boundary.

        Hit rays accumulate emission and (with bounces left) rebase onto
        a sampled scatter direction; dead unhit rays accumulate sky.
        Mirrors the leg-end math of wavefront3._path_frame."""
        t, act, hit, axm, vox, wa, we, stp = c
        ox, oy, oz, dX, dY, dZ = rays
        cr, cg, cb, lr, lg, lb, bl, fin = path
        live = fin == 0
        hitb = (hit != 0) & live & valid
        missb = (act == 0) & (hit == 0) & live & valid
        trans = hitb | missb

        t_exit = ray_t_exit(rays)
        t_stop = jnp.minimum(t, t_exit)
        water = wa + jnp.where(we >= 0.0, t_stop - we, 0.0)
        cr2 = jnp.where(trans, cr * jnp.exp(-water * kx), cr)
        cg2 = jnp.where(trans, cg * jnp.exp(-water * ky), cg)
        cb2 = jnp.where(trans, cb * jnp.exp(-water * kz), cb)

        skr, skg, skb = sky_rgb(rays)
        lr = lr + jnp.where(missb, cr2 * skr, 0.0)
        lg = lg + jnp.where(missb, cg2 * skg, 0.0)
        lb = lb + jnp.where(missb, cb2 * skb, 0.0)

        emis, scat, mr, mg, mb = mat_fetch(vox)
        lr = lr + jnp.where(hitb, cr2 * emis * mr, 0.0)
        lg = lg + jnp.where(hitb, cg2 * emis * mg, 0.0)
        lb = lb + jnp.where(hitb, cb2 * emis * mb, 0.0)
        cr = jnp.where(hitb, cr2 * mr, cr2)
        cg = jnp.where(hitb, cg2 * mg, cg2)
        cb = jnp.where(hitb, cb2 * mb, cb2)

        bounce = hitb & (bl > 0)

        # face normal from the crossing axis + direction signs
        nx = -jnp.sign(dX) * ((axm >> 0) & 1).astype(f32)
        ny = -jnp.sign(dY) * ((axm >> 1) & 1).astype(f32)
        nz = -jnp.sign(dZ) * ((axm >> 2) & 1).astype(f32)
        degen = (nx == 0.0) & (ny == 0.0) & (nz == 0.0)
        nx = jnp.where(degen, -dX, nx)
        ny = jnp.where(degen, -dY, ny)
        nz = jnp.where(degen, -dZ, nz)

        # scatter direction: Box-Muller normals -> unit sphere -> diffuse
        # about the normal; mixed with the specular reflection by the
        # material's scatter coefficient (same mix as _path_frame)
        u1, u2 = rand_u01(bl, 0, sbase), rand_u01(bl, 1, sbase)
        u3, u4 = rand_u01(bl, 2, sbase), rand_u01(bl, 3, sbase)
        r1 = jnp.sqrt(-2.0 * jnp.log(u1))
        a1 = f32(2.0 * np.pi) * u2
        r2 = jnp.sqrt(-2.0 * jnp.log(u3))
        a2 = f32(2.0 * np.pi) * u4
        vx_ = r1 * jnp.cos(a1)
        vy_ = r1 * jnp.sin(a1)
        vz_ = r2 * jnp.cos(a2)
        rn = jnp.maximum(jnp.sqrt(vx_ * vx_ + vy_ * vy_ + vz_ * vz_), 1e-6)
        vx_, vy_, vz_ = vx_ / rn, vy_ / rn, vz_ / rn
        dfx = nx + vx_
        dfy = ny + vy_
        dfz = nz + vz_
        dn = jnp.sqrt(dfx * dfx + dfy * dfy + dfz * dfz)
        okd = dn > 1e-6
        dnm = jnp.maximum(dn, 1e-6)
        dfx = jnp.where(okd, dfx / dnm, nx)
        dfy = jnp.where(okd, dfy / dnm, ny)
        dfz = jnp.where(okd, dfz / dnm, nz)
        dot = dX * nx + dY * ny + dZ * nz
        spx = dX - 2.0 * dot * nx
        spy = dY - 2.0 * dot * ny
        spz = dZ - 2.0 * dot * nz
        ndx = dfx * scat + spx * (1.0 - scat)
        ndy = dfy * scat + spy * (1.0 - scat)
        ndz = dfz * scat + spz * (1.0 - scat)
        nn = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
        okn = nn > 1e-6
        nnm = jnp.maximum(nn, 1e-6)
        ndx = jnp.where(okn, ndx / nnm, nx)
        ndy = jnp.where(okn, ndy / nnm, ny)
        ndz = jnp.where(okn, ndz / nnm, nz)

        # rebase: new origin at the hit point, nudged along the normal.
        # The crossing-axis coordinate is snapped to its integer face
        # first (floor(x+0.5), bit-identical to wavefront3._path_frame's
        # rebase): the hit point lies ON that face by construction, so
        # an unsnapped floor() downstream is knife-edge under 1-ulp
        # cross-platform t differences — the PT chaos documented in
        # tools/tpu_correctness.py.
        pxh = ox + dX * t
        pyh = oy + dY * t
        pzh = oz + dZ * t
        pxh = jnp.where(
            ((axm >> 0) & 1) != 0, jnp.floor(pxh + 0.5), pxh)
        pyh = jnp.where(
            ((axm >> 1) & 1) != 0, jnp.floor(pyh + 0.5), pyh)
        pzh = jnp.where(
            ((axm >> 2) & 1) != 0, jnp.floor(pzh + 0.5), pzh)
        pxh = pxh + nx * _EPS_N
        pyh = pyh + ny * _EPS_N
        pzh = pzh + nz * _EPS_N
        ox = jnp.where(bounce, pxh, ox)
        oy = jnp.where(bounce, pyh, oy)
        oz = jnp.where(bounce, pzh, oz)
        dX = jnp.where(bounce, ndx, dX)
        dY = jnp.where(bounce, ndy, dY)
        dZ = jnp.where(bounce, ndz, dZ)

        t = jnp.where(bounce, f32(EPS_T), t)
        act = jnp.where(bounce, 1, jnp.where(trans, 0, act))
        hit = jnp.where(bounce, 0, hit)
        axm = jnp.where(bounce, 0, axm)
        vox = jnp.where(bounce, 0, vox)
        wa = jnp.where(bounce, 0.0, wa)
        we = jnp.where(bounce, -1.0, we)
        stp = jnp.where(bounce, 0, stp)
        bl = jnp.where(bounce, bl - 1, bl)
        fin = jnp.where(trans & ~bounce, 1, fin)

        return ((t, act, hit, axm, vox, wa, we, stp),
                (ox, oy, oz, dX, dY, dZ),
                (cr, cg, cb, lr, lg, lb, bl, fin))

    # ---- primary-ray init ----------------------------------------------
    ox0 = scal_ref[0]
    oy0 = scal_ref[1]
    oz0 = scal_ref[2]
    scal_v = [scal_ref[i] for i in range(24)]
    dx0, dy0, dz0 = _ray_dirs(scal_v, tg, lanes, nsx)
    sbi = tg // _BLK
    li = tg - sbi * _BLK
    txi = (sbi % nsx) * SB_W + li % SB_W
    tyi = (sbi // nsx) * SB_H + li // SB_W
    val_t = (
        (txi.astype(f32) < scal_ref[25])
        & (tyi.astype(f32) < scal_ref[26])
    )
    in_w0 = (
        (ox0 > 0.0) & (ox0 < v)
        & (oy0 > 0.0) & (oy0 < v)
        & (oz0 > 0.0) & (oz0 < v)
    )

    s0 = scal_ref[34].astype(i32)
    s1 = scal_ref[35].astype(i32)
    s2 = scal_ref[36].astype(i32)
    s3 = scal_ref[37].astype(i32)

    acc_r = jnp.zeros((blk, 128), f32)
    acc_g = jnp.zeros((blk, 128), f32)
    acc_b = jnp.zeros((blk, 128), f32)

    for samp in range(samples):
        sbase = (
            (s0 + (s1 << 16)).astype(u32)
            ^ ((s2 + (s3 << 16)).astype(u32) * u32(0x9E3779B9))
            ^ u32((samp * 0x7FEB352D) & 0xFFFFFFFF)
        )

        c0 = (
            jnp.full((blk, 128), EPS_T, f32),
            (val_t & in_w0).astype(i32),
            jnp.zeros((blk, 128), i32),
            jnp.zeros((blk, 128), i32),
            jnp.zeros((blk, 128), i32),
            jnp.zeros((blk, 128), f32),
            jnp.full((blk, 128), -1.0, f32),
            jnp.zeros((blk, 128), i32),
        )
        rays0 = (
            jnp.broadcast_to(ox0, (blk, 128)),
            jnp.broadcast_to(oy0, (blk, 128)),
            jnp.broadcast_to(oz0, (blk, 128)),
            dx0, dy0, dz0,
        )
        path0 = (
            jnp.ones((blk, 128), f32), jnp.ones((blk, 128), f32),
            jnp.ones((blk, 128), f32),
            jnp.zeros((blk, 128), f32), jnp.zeros((blk, 128), f32),
            jnp.zeros((blk, 128), f32),
            jnp.full((blk, 128), bounces, i32),
            jnp.zeros((blk, 128), i32),
        )
        cch0 = (wid0, sid0, wm0, sm0)

        def sub_round(state):
            sr, _, c, rays, geom, rows_c, cch = state

            def sbody(st):
                i, _, cc = st
                cc, prog = step(cc, rays, geom, rows_c, cch)
                return i + 1, prog, cc

            def scond(st):
                i, prog, _ = st
                return (i < sub_steps) & (prog != 0)

            _, _, c = jax.lax.while_loop(
                scond, sbody, (jnp.int32(0), jnp.int32(1), c)
            )
            c = decode_hits(c, rays, rows_c[1], rows_c[4], cch[3])
            t, a, h, axm, vox, wat, wen, stp = c
            t = jnp.minimum(t, geom[6])
            c = (t, jnp.where(stp < step_cap, a, 0), h, axm, vox, wat,
                 wen, stp)
            tsid, tslot, solid_row, liq_row, pid_rows, go = boundary(
                c[0], c[1], rays, cch
            )
            return (sr + 1, go, c, rays, geom,
                    (tsid, tslot, solid_row, liq_row, pid_rows), cch)

        def inner_cond(state):
            sr, go = state[0], state[1]
            return (sr < sub_rounds) & (go != 0)

        def round_body(carry):
            r, c, rays, path, cch, wctr, sctr = carry
            cch, wctr, sctr = serve(c[0], c[1], rays, cch, wctr, sctr)
            rows_c = boundary(c[0], c[1], rays, cch)
            geom = ray_geom(rays)
            _, _, c, rays, _, _, _ = jax.lax.while_loop(
                inner_cond, sub_round,
                (jnp.int32(0), rows_c[5], c, rays, geom, rows_c[:5], cch),
            )
            # per-ray shade / bounce / finalize at the ROUND boundary,
            # and only when some ray actually transitions: the shading
            # math is ~10 transcendentals over every lane, which at
            # sub-round granularity measured 168 ms/frame vs the XLA
            # route's 118 — pure-march rounds must not pay it.
            fin_ = path[7]
            hitb = (c[2] != 0) & (fin_ == 0) & val_t
            missb = (c[1] == 0) & (c[2] == 0) & (fin_ == 0) & val_t
            c, rays, path = jax.lax.cond(
                jnp.any(hitb | missb),
                lambda c, rays, path: transition(c, rays, path, val_t,
                                                 sbase),
                lambda c, rays, path: (c, rays, path),
                c, rays, path,
            )
            return r + 1, c, rays, path, cch, wctr, sctr

        def round_cond(carry):
            r, c = carry[0], carry[1]
            return (r < rounds_cap) & jnp.any(c[1] != 0)

        _, c, rays, path, _, _, _ = jax.lax.while_loop(
            round_cond, round_body,
            (jnp.int32(0), c0, rays0, path0, cch0,
             jnp.int32(0), jnp.int32(0)),
        )
        # finalize stragglers (rounds exhausted mid-flight, or rays that
        # never entered the world): kill and shade as the XLA route does
        # (unconverged rays render as sky, _path_frame's miss branch)
        t, a, h, axm, vox, wat, wen, stp = c
        c = (t, jnp.zeros((blk, 128), i32), h, axm, vox, wat, wen, stp)
        _, _, path = transition(c, rays, path, val_t, sbase)

        acc_r = acc_r + path[3]
        acc_g = acc_g + path[4]
        acc_b = acc_b + path[5]

    inv_s = f32(1.0 / samples)
    lrgb_o[0, :, :] = acc_r * inv_s
    lrgb_o[1, :, :] = acc_g * inv_s
    lrgb_o[2, :, :] = acc_b * inv_s


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rounds", "sub_rounds", "sub_steps", "v",
        "interpret", "bounces", "samples", "step_cap", "prepacked",
        "blk", "n_sc", "s_ins", "w_ins", "full_height", "s_seg",
    ),
)
def _pt_frame4(
    gw_jump, gw_liq, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
    origin, inv_view, inv_proj, mlut,
    sky_color, sun_pos_local, sun_intensity, seeds,
    sw_cont_pre=None, wmeta_pre=None,
    *, width, height, rounds, sub_rounds, sub_steps, v, interpret,
    bounces, samples, step_cap=None, prepacked=False,
    blk=_BLK, n_sc=N_SC, s_ins=S_INS, w_ins=W_INS,
    full_height=None, y0=0.0, s_seg=1,
):
    """One fused path-traced frame -> f32[H,W,3] linear radiance."""
    full_height = height if full_height is None else full_height
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    tx = width // TILE_W
    ty = height // TILE_H
    nsx, nsy, T = _sb_dims(tx, ty)
    T_pad = ((T + blk - 1) // blk) * blk
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
    cap = jnp.asarray(0.0 if step_cap is None else float(step_cap), f32)
    scal = (
        scal.at[22].set(jnp.float32(sub_rounds))
        .at[23].set(cap)
        .at[24].set(1.0)
        .at[25].set(jnp.float32(tx))
        .at[26].set(jnp.float32(ty))
    )
    extra = jnp.concatenate([
        jnp.asarray(sun_pos_local, f32),
        jnp.asarray(sun_intensity, f32).reshape(1),
        jnp.asarray(sky_color, f32),
        jnp.asarray(seeds, f32),                       # 4 exact 16-bit ints
        jnp.zeros(2, f32),
    ])
    scal = jnp.concatenate([scal, extra])              # f32[40]

    nwg = (nw + (1 << _gs_for(nw)) - 1) >> _gs_for(nw)
    gw_pair = nwg ** 3 <= 2048
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

    kern = partial(
        _pt_kernel4, sub_rounds=sub_rounds, sub_steps=sub_steps,
        rounds_cap=rounds, nw=nw, ns=ns, nsx=nsx,
        s_ins=s_ins, w_ins=w_ins, n_sc=n_sc, gw_pair=gw_pair,
        bounces=bounces, samples=samples, s_seg=s_seg,
    )
    lrgb = pl.pallas_call(
        kern,
        grid=(T_pad // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # scal
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # gw rows
            pl.BlockSpec((10, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # mlut
            pl.BlockSpec(memory_space=pl.ANY),              # sw_cont
            pl.BlockSpec(memory_space=pl.ANY),              # wmeta_pad
        ],
        out_specs=pl.BlockSpec((3, blk, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, T_pad, 128), f32),
        scratch_shapes=[
            pltpu.VMEM((s_ins, 7, 128), u32),               # stage
            pltpu.VMEM((w_ins, 1, 128), u32),               # wstage
            pltpu.SemaphoreType.DMA((s_ins,)),
            pltpu.SemaphoreType.DMA((w_ins,)),
            pltpu.VMEM((n_sc, 128), u32),                   # csol
            pltpu.VMEM((n_sc, 128), u32),                   # cliq
            pltpu.VMEM((4 * n_sc, 128), u32),               # cpid
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scal, gw2, mlut, sw_cont, wmeta_pad)
    lrgb = lrgb[:, :T]

    def untile(x):
        return _untile_hw(x, tx, ty, width, height)

    return jnp.stack(
        [untile(lrgb[0]), untile(lrgb[1]), untile(lrgb[2])], axis=-1
    )


def path_trace_fused4(
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
    rounds=24,
    steps_per_round=48,
    step_cap=None,
    interpret=None,
    prepared=None,
    blk=_BLK,
    n_sc=N_SC,
    s_ins=S_INS,
    w_ins=W_INS,
    s_seg=1,
):
    """Path-traced frame in ONE kernel launch -> f32[H,W,3] radiance.

    The in-kernel analog of :func:`~.wavefront3.path_trace3` — same
    shading semantics, a different (on-core) RNG. Deterministic given
    (world, camera, key); agrees with path_trace3 exactly on RNG-free
    paths (bounces=0, scatter=0 materials) and statistically otherwise.
    ``rounds`` bounds in-kernel service rounds ACROSS all bounce legs
    (a bounce continues in the same program; rays left unconverged at
    the cap shade as sky, like the XLA route's leg cap).
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
    kd = key
    if jnp.issubdtype(jnp.asarray(kd).dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(kd)
    kd = jnp.asarray(kd, jnp.uint32).reshape(-1)
    seeds = jnp.stack([
        (kd[0] & 0xFFFF).astype(jnp.float32),
        (kd[0] >> 16).astype(jnp.float32),
        (kd[-1] & 0xFFFF).astype(jnp.float32),
        (kd[-1] >> 16).astype(jnp.float32),
    ])
    sub_steps = 8
    sub_rounds = max(int(steps_per_round) // sub_steps, 1)
    return _pt_frame4(
        rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid,
        rg.sw_liq, rg.sw_pid,
        origin,
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        mlut,
        jnp.asarray(sky_color, jnp.float32), sun_local,
        jnp.float32(sun_intensity), seeds,
        sw_cont_pre=None if prepared is None else prepared.sw_cont,
        wmeta_pre=None if prepared is None else prepared.wmeta_pad,
        width=width, height=height, rounds=int(rounds),
        sub_rounds=sub_rounds, sub_steps=sub_steps,
        v=int(rg.size_voxels), interpret=bool(interpret),
        bounces=int(bounces), samples=int(samples),
        step_cap=None if step_cap is None else int(step_cap),
        prepacked=prepared is not None, blk=int(blk), n_sc=int(n_sc),
        s_ins=int(s_ins), w_ins=int(w_ins), s_seg=int(s_seg),
    )

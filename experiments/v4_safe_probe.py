"""Staged on-chip validation of the v4 self-serving kernel.

The in-kernel-DMA pattern once wedged the device tunnel for hours
(docs/TPU_NOTES.md), so v4 is brought up in stages, each a separate
process run under a timeout:

  python experiments/v4_safe_probe.py compile   # lower+compile only
  python experiments/v4_safe_probe.py tiny      # 64x32 frame + readback
  python experiments/v4_safe_probe.py time      # 1080p steady-state, no D2H

Run with: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python ...
and NEVER concurrently with another TPU process.
"""

import sys
import time

import numpy as np


def build(w=8):
    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.wavefront3 import (
        build_render_grid3_host,
        color_lut_rows,
    )
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )

    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w, w * 32 * 0.45, int(w * 32 * 0.28)
    )
    mats = demo_materials()
    rgrid = build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), w, mats
    )
    return rgrid, mats, color_lut_rows(mats.color)


def cam_for(rgrid, width, height):
    from voxelraytracing_tpu.ops.camera import CamData

    v = float(rgrid.size_voxels)
    return CamData.create(
        (35.0, 45.0, 0.0), (v * 0.5, v * 0.75, v * 0.5), 70.0,
        (width, height),
    )


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "compile"
    import jax

    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    print(f"# stage={stage} devices={jax.devices()}", flush=True)

    if stage == "compile":
        # trace+lower+compile the tiny frame; never executes the kernel.
        # Arrays go in as ARGUMENTS (closed-over device constants are a
        # poison pattern on this runtime, ops/wavefront.py).
        import jax.numpy as jnp

        from voxelraytracing_tpu.ops.wavefront4 import _render_frame4

        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        t0 = time.time()
        wm = jnp.asarray(rgrid.world_min, jnp.float32)
        _render_frame4.lower(
            rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
            rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid,
            jnp.asarray(cam.pos, jnp.float32) - wm,
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32),
            lut,
            jnp.asarray((0.81, 0.93, 1.0), jnp.float32),
            jnp.asarray((0.0, 10_000.0, 0.0), jnp.float32) - wm,
            jnp.float32(4.0), jnp.float32(0.4),
            width=64, height=32, rounds=64, sub_rounds=6, sub_steps=8,
            v=int(rgrid.size_voxels), interpret=False, shadows=False,
            show_steps=False, step_cap=500,
        ).compile()
        print(f"# compiled ok in {time.time() - t0:.1f}s", flush=True)
        return 0

    if stage == "tiny":
        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        t0 = time.time()
        img = render_frame4(
            rgrid, cam, lut, rounds=64, step_cap=500, interpret=False
        )
        img = np.asarray(img)  # one D2H at exit; poison dies with us
        print(f"# tiny frame ok in {time.time() - t0:.1f}s", flush=True)
        # compare against the CPU oracle rendered in-process on cpu jax?
        # No second backend in one process; just report content stats.
        nz = (img != img[0, 0]).mean()
        print(f"# distinct-from-corner frac: {nz:.3f}", flush=True)
        return 0

    if stage == "sweep":
        # knob sweep at 1080p: service width x sub-round budget x pick
        # strategy. One process; ~6 compiles (budget the timeout).
        from voxelraytracing_tpu.ops.camera import generate_rays
        from voxelraytracing_tpu.ops.wavefront4 import trace_wavefront4

        rgrid, mats, lut = build(8)
        cam = cam_for(rgrid, 1920, 1080)
        origin, _ = generate_rays(cam, np.zeros(3, np.int32))
        for (si, spr, grp) in [
            (16, 128, False), (16, 128, True),
            (8, 128, False), (16, 48, False),
            (16, 256, False), (8, 256, True),
        ]:
            def frame():
                return trace_wavefront4(
                    rgrid, origin, cam=cam, rounds=96, step_cap=500,
                    steps_per_round=spr, s_ins=si, grouped=grp,
                    interpret=False,
                )
            r = frame()
            jax.block_until_ready(r.t)
            t0 = time.time()
            n = 0
            while time.time() - t0 < 4.0:
                r = frame()
                jax.block_until_ready(r.t)
                n += 1
            dt = (time.time() - t0) / n
            print(f"# s_ins={si} spr={spr} grouped={grp}: "
                  f"{1920*1080/dt/1e6:.1f} Mrays/s ({dt*1e3:.1f} ms)",
                  flush=True)
        return 0

    if stage == "time":
        rgrid, mats, lut = build(8)
        cam = cam_for(rgrid, 1920, 1080)
        t0 = time.time()
        r, tok = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                               interpret=False, return_cache=True)
        jax.block_until_ready(r)
        print(f"# first frame (incl compile): {time.time() - t0:.1f}s",
              flush=True)
        # cold steady state (fresh token each frame would still be warm;
        # measure both: token-carried warm loop, then cold loop).
        # IMPORTANT: warm each jit variant BEFORE the timed loop — the
        # (cache=None, return_cache=True), (cache=tok, ...) and
        # (no-cache) calls are three different jit signatures, and an
        # in-loop compile (~7 s) swamps the measurement.
        r2, tok = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                                interpret=False, cache=tok,
                                return_cache=True)
        r3 = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                           interpret=False)
        jax.block_until_ready((r2, r3))
        for label, use_tok in (("warm", True), ("cold", False)):
            depth = 4
            toks = [tok] * depth
            frames = 0
            t0 = time.time()
            while True:
                rs = []
                for i in range(depth):
                    if use_tok:
                        r, toks[i] = render_frame4(
                            rgrid, cam, lut, rounds=64, step_cap=500,
                            interpret=False, cache=toks[i],
                            return_cache=True,
                        )
                    else:
                        r = render_frame4(
                            rgrid, cam, lut, rounds=64, step_cap=500,
                            interpret=False,
                        )
                    rs.append(r)
                jax.block_until_ready(rs[-1])
                frames += depth
                el = time.time() - t0
                if frames >= 8 and (el > 5.0 or frames >= 96):
                    break
                if el > 30.0:
                    break
            mrays = 1920 * 1080 * frames / el / 1e6
            print(f"# v4 1080p {label}: {mrays:.1f} Mrays/s ({frames} "
                  f"frames in {el:.2f}s)", flush=True)
        return 0

    print(f"unknown stage {stage}")
    return 2


if __name__ == "__main__":
    sys.exit(main())

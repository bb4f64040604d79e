"""Staged on-chip validation + timing of the fused (in-kernel shade) v4
frame — ONE kernel launch for trace AND shade, the reference kernel's
one-pass shape (ray_tracer.wgsl:173-316).

Stages (each a separate process under timeout, per docs/TPU_NOTES.md):

  python experiments/v4_fused_probe.py compile  # lower+compile only
  python experiments/v4_fused_probe.py tiny     # 64x32 frame + readback
  python experiments/v4_fused_probe.py time     # 1080p fused vs split

Run with: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python ...
and NEVER concurrently with another TPU process.
"""

import sys
import time

import numpy as np

from experiments.v4_safe_probe import build, cam_for

PX = 1920 * 1080


def sustained(label, mk_frame, batch=96, min_s=4.0, stride=4):
    import jax

    toks = [None] * stride
    r, t = mk_frame(None)
    r, t = mk_frame(t)
    jax.block_until_ready(r)
    toks = [t] * stride
    frames = 0
    t0 = time.perf_counter()
    while True:
        last = None
        for i in range(batch):
            last, toks[i % stride] = mk_frame(toks[i % stride])
        jax.block_until_ready(last)
        frames += batch
        el = time.perf_counter() - t0
        if el > min_s:
            break
    ms = el / frames * 1e3
    print(f"# {label}: {ms:.2f} ms/frame  ({PX * frames / el / 1e6:.1f} "
          f"Mrays/s)", flush=True)
    return ms


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "compile"
    import jax

    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    print(f"# stage={stage} devices={jax.devices()}", flush=True)

    if stage == "compile":
        import jax.numpy as jnp

        from voxelraytracing_tpu.ops.wavefront4 import _frame_fused4

        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        t0 = time.time()
        wm = jnp.asarray(rgrid.world_min, jnp.float32)
        _frame_fused4.lower(
            rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
            rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid,
            jnp.asarray(cam.pos, jnp.float32) - wm,
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32),
            lut,
            jnp.asarray((0.81, 0.93, 1.0), jnp.float32),
            jnp.asarray((0.0, 10_000.0, 0.0), jnp.float32) - wm,
            jnp.float32(4.0),
            64, 500.0,
            width=64, height=32, sub_rounds=6, sub_steps=8,
            v=int(rgrid.size_voxels), interpret=False,
        ).compile()
        print(f"# compiled ok in {time.time() - t0:.1f}s", flush=True)
        return 0

    if stage == "tiny":
        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        t0 = time.time()
        img = render_frame4(
            rgrid, cam, lut, rounds=64, step_cap=500, interpret=False,
            fused=True,
        )
        img = np.asarray(img)  # one D2H at exit; poison dies with us
        print(f"# tiny fused frame ok in {time.time() - t0:.1f}s",
              flush=True)
        nz = (img != img[0, 0]).mean()
        print(f"# distinct-from-corner frac: {nz:.3f}", flush=True)
        return 0

    if stage == "tinycmp":
        # fused vs split pixel comparison ON CHIP (both rendered this
        # process, two D2H at exit)
        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        a = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                          interpret=False)
        b = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                          interpret=False, fused=True)
        a, b = np.asarray(a), np.asarray(b)
        print(f"# identical: {(a == b).all()}  "
              f"mismatch frac: {(a != b).mean():.5f}", flush=True)
        return 0

    if stage == "wp_compile":
        # lower+compile the warm_pre (hoisted warm-cache gather) variant:
        # warm tokens become XLA row-gathers feeding pipelined block
        # inputs instead of an in-kernel DMA wave
        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        t0 = time.time()
        img, tok = render_frame4(
            rgrid, cam, lut, rounds=64, step_cap=500, interpret=False,
            fused=True, return_cache=True, warm_gather=True,
        )
        jax.block_until_ready(img)
        # second frame exercises the warm_pre branch (cache provided)
        img2, _ = render_frame4(
            rgrid, cam, lut, rounds=64, step_cap=500, interpret=False,
            fused=True, cache=tok, return_cache=True, warm_gather=True,
        )
        jax.block_until_ready(img2)
        print(f"# warm_pre compiled+ran tiny in {time.time() - t0:.1f}s",
              flush=True)
        return 0

    if stage == "wp_cmp":
        # warm frame with hoisted gather vs in-kernel DMA wave must be
        # pixel-identical given the same cache token (two D2H at exit)
        rgrid, mats, lut = build(2)
        cam = cam_for(rgrid, 64, 32)
        _, tok = render_frame4(
            rgrid, cam, lut, rounds=64, step_cap=500, fused=True,
            return_cache=True,
        )
        a, _ = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                             fused=True, cache=tok, return_cache=True,
                             warm_gather=False)
        b, _ = render_frame4(rgrid, cam, lut, rounds=64, step_cap=500,
                             fused=True, cache=tok, return_cache=True,
                             warm_gather=True)
        a, b = np.asarray(a), np.asarray(b)
        print(f"# identical: {(a == b).all()}  "
              f"mismatch frac: {(a != b).mean():.5f}", flush=True)
        return 0

    if stage == "wp_time":
        from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

        rgrid, mats, lut = build(8)
        cam = cam_for(rgrid, 1920, 1080)
        prep = prepare_grid4(rgrid)
        jax.block_until_ready(prep)
        kw = dict(rounds=64, step_cap=500, steps_per_round=256,
                  prepared=prep, return_cache=True, fused=True)

        def dma(tok):
            return render_frame4(rgrid, cam, lut, cache=tok,
                                 warm_gather=False, **kw)

        def pre(tok):
            return render_frame4(rgrid, cam, lut, cache=tok,
                                 warm_gather=True, **kw)

        ms_d = sustained("fused warm via in-kernel DMA", dma)
        ms_p = sustained("fused warm via hoisted gather", pre)
        print(f"# pre/dma: {ms_p / ms_d:.3f}", flush=True)
        return 0

    if stage == "time":
        from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

        rgrid, mats, lut = build(8)
        cam = cam_for(rgrid, 1920, 1080)
        prep = prepare_grid4(rgrid)
        jax.block_until_ready(prep)
        kw = dict(rounds=64, step_cap=500, steps_per_round=256,
                  prepared=prep, return_cache=True)

        def split(tok):
            return render_frame4(rgrid, cam, lut, cache=tok, **kw)

        def fused(tok):
            return render_frame4(rgrid, cam, lut, cache=tok, fused=True,
                                 **kw)

        ms_s = sustained("split frame (prepared+warm)", split)
        ms_f = sustained("fused frame (prepared+warm)", fused)
        print(f"# fused/split: {ms_f / ms_s:.3f}", flush=True)
        return 0

    print(f"unknown stage {stage}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())

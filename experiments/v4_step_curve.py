"""March-time vs step-cap curve at 1080p (warm, prepacked, batch cadence).

step_cap is a *dynamic* SMEM scalar, so the whole sweep reuses one
compiled march. The curve decomposes the frame: the plateau is full
convergence; extrapolating the slope to cap=0 isolates the per-step
march cost from the fixed (launch + serve + classify-at-boundary) cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_step_curve.py
"""

import time

import numpy as np

PX = 1920 * 1080


def sustained(mk_frame, batch=96, min_s=3.0):
    import jax

    stride = 4
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
    return el / frames * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront4 import _trace_frame4

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)

    f32 = jnp.float32
    wm = jnp.asarray(rgrid.world_min, f32)
    origin = jnp.asarray(cam.pos, f32) - wm
    iv = jnp.asarray(cam.inv_view, f32)
    ip = jnp.asarray(cam.inv_proj, f32)
    z = jnp.zeros((), f32)
    common = dict(
        width=1920, height=1080, sub_rounds=32, sub_steps=8,
        v=int(rgrid.size_voxels), interpret=False, raw_out=True,
        warm=True, prepacked=True,
    )
    planes = (rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
              rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid)

    def march_at(cap):
        def mk(tok):
            ts, fl, wa, we, ids = _trace_frame4(
                *planes, origin, iv, ip, z, z, z, 64, float(cap), tok,
                prep.sw_cont, prep.wmeta_pad, **common,
            )
            return (ts, fl, wa, we), ids

        return mk

    for cap in (1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 256, 500):
        ms = sustained(march_at(cap))
        print(f"# cap={cap:4d}: {ms:6.2f} ms/frame "
              f"({PX / ms / 1e3:.1f} Mrays/s)", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

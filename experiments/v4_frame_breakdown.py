"""On-chip breakdown of the v4 fused frame: where do ~850 ms/frame go?

The sweep stage shows the bare march at ~45 ms/1080p, but
render_frame4 (march + shade, no shadows) lands at ~900 ms. Time each
layer in one process, no D2H until exit.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 \
    python experiments/v4_frame_breakdown.py
"""

import time

import numpy as np

from experiments.v4_safe_probe import build, cam_for


def bench(label, fn, reps=6):
    import jax

    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"# {label}: {dt * 1e3:.1f} ms  ({2.0736 / dt:.1f} Mrays/s)",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from voxelraytracing_tpu.ops.camera import generate_rays
    from voxelraytracing_tpu.ops.wavefront3 import render_frame3
    from voxelraytracing_tpu.ops.wavefront4 import (
        _trace_frame4,
        render_frame4,
        trace_wavefront4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))

    bench("march only (trace_wavefront4, WavefrontResult out)",
          lambda: trace_wavefront4(
              rgrid, origin, cam=cam, rounds=64, step_cap=500,
              interpret=False).t)

    z = jnp.zeros((), jnp.float32)

    def raw():
        return _trace_frame4(
            rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
            rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid,
            jnp.asarray(origin, jnp.float32),
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32),
            z, z, z, 64, 500.0, None,
            width=1920, height=1080, sub_rounds=16, sub_steps=8,
            v=int(rgrid.size_voxels), interpret=False, raw_out=True,
        )[0]

    bench("march only (raw_out, as render_frame4 calls it)", raw)

    bench("render_frame4 (march+shade, cold, no token)",
          lambda: render_frame4(
              rgrid, cam, lut, rounds=64, step_cap=500, interpret=False))

    bench("render_frame4 warm-token",
          lambda: render_frame4(
              rgrid, cam, lut, rounds=64, step_cap=500, interpret=False,
              return_cache=True)[0])

    bench("render_frame3 (reference fused frame)",
          lambda: render_frame3(
              rgrid, cam, lut, rounds=14, step_cap=500, interpret=False))

    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

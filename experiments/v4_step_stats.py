"""One-shot per-ray step statistics for the 1080p bench march.

Reads back the fl plane ONCE and exits (D2H poison dies with the
process — docs/TPU_NOTES.md), then reports the per-ray step
distribution and the per-block max/mean ratio = the SIMD lane-waste
factor: block programs run until their slowest ray converges, so
march time ~ sum(block max), useful work ~ sum(ray steps).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
    python experiments/v4_step_stats.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront3 import _BLK, _FL_STP
    from voxelraytracing_tpu.ops.wavefront4 import (
        _trace_frame4,
        prepare_grid4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)
    prep = prepare_grid4(rgrid)

    f32 = jnp.float32
    wm = jnp.asarray(rgrid.world_min, f32)
    origin = jnp.asarray(cam.pos, f32) - wm
    iv = jnp.asarray(cam.inv_view, f32)
    ip = jnp.asarray(cam.inv_proj, f32)
    z = jnp.zeros((), f32)
    ts, fl, wa, we, _ = _trace_frame4(
        rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
        rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid,
        origin, iv, ip, z, z, z, 64, 0.0, None,
        prep.sw_cont, prep.wmeta_pad,
        width=1920, height=1080, sub_rounds=32, sub_steps=8,
        v=int(rgrid.size_voxels), interpret=False, raw_out=True,
        warm=True, prepacked=True,
    )
    fl_h = np.asarray(fl)          # single D2H, then exit
    steps = (fl_h >> _FL_STP) & 0xFFF
    s = steps.ravel().astype(np.int64)
    print(f"# rays={s.size}  steps: mean={s.mean():.1f} "
          f"p50={np.percentile(s, 50):.0f} p90={np.percentile(s, 90):.0f} "
          f"p99={np.percentile(s, 99):.0f} max={s.max()}")
    T = fl_h.shape[0]
    for blk in (64, 128, 256):
        nb = T // blk
        b = steps[: nb * blk].reshape(nb, blk * 128)
        bmax = b.max(axis=1)
        # block cost is quantized to 8-step sub-rounds
        bq = ((bmax + 7) // 8) * 8
        print(f"# blk={blk:4d}: mean(block max)={bmax.mean():.1f} "
              f"quantized={bq.mean():.1f} waste=x{bq.mean() / s.mean():.2f}")
    # step-count histogram (coarse)
    for lo, hi in ((0, 8), (8, 16), (16, 32), (32, 64), (64, 128),
                   (128, 512)):
        f = ((s >= lo) & (s < hi)).mean()
        print(f"#   steps in [{lo},{hi}): {f * 100:.1f}%")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Staged on-chip bring-up for the SPARSE v4 tables (docs/TPU_NOTES.md
protocol: compile first, then a tiny run under timeout, then compare).

Stages:
  1. 64x32 frame on a 4-chunk world, sparse vs dense — pixel equality
     readback at process end (single D2H wave).
  2. 1080p sustained timing on the W=34 preset strip world, sparse vs
     dense (same world, both table modes) — no D2H.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python experiments/sparse_probe.py [time]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    timing = len(sys.argv) > 1 and sys.argv[1] == "time"

    import jax
    import numpy as np

    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import color_lut_rows
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )
    from voxelraytracing_tpu.world.render_grid import RenderGrid3Builder

    print(f"# devices={jax.devices()}", flush=True)
    mats = demo_materials()
    lut = color_lut_rows(mats.color)

    if not timing:
        w = 4
        perm = noise.make_permutation(7)
        grids, cells = demo_chunk_grids_host(
            perm, np.zeros(3, np.int64), w, w * 32 * 0.45,
            int(w * 32 * 0.28),
        )
        cxyz = [(int(c % w), int((c // w) % w), int(c // (w * w)))
                for c in cells]
        outs = {}
        for mode in (False, True):
            b = RenderGrid3Builder(w, mats, sparse=mode)
            b.set_chunks(cxyz, grids)
            cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0),
                                 70.0, (64, 32))
            outs[mode] = render_frame4(
                b.grid(), cam, lut, sun_pos=(1000.0, 2500.0, 500.0),
                rounds=64, step_cap=500, prepared=b.prepared(),
            )
            print(f"# sparse={mode} rendered", flush=True)
        jax.block_until_ready(list(outs.values()))
        a, bb = np.asarray(outs[False]), np.asarray(outs[True])
        print(f"# tiny frame equal: {bool((a == bb).all())} "
              f"(diff px {(a != bb).sum()})", flush=True)
        return

    # stage 2: 1080p sustained, W=34 world strip (dense still fits)
    w = 34
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), 8, 8 * 32 * 0.45, int(8 * 32 * 0.28)
    )
    cxyz = [(int(c % 8), int((c // 8) % 8), int(c // 64))
            for c in cells]
    cam = CamData.create((30.0, 45.0, 0.0), (128.0, 180.0, 128.0), 70.0,
                         (1920, 1080))

    for mode in (False, True):
        b = RenderGrid3Builder(w, mats, sparse=mode)
        b.set_chunks(cxyz, grids)
        prep = b.prepared()
        rg = b.grid()
        tok = {"t": None}

        def one():
            img, t2 = render_frame4(
                rg, cam, lut, rounds=64, step_cap=500,
                steps_per_round=256, prepared=prep, cache=tok["t"],
                return_cache=True, fused=True,
            )
            tok["t"] = t2
            return img

        r = one()
        r = one()
        jax.block_until_ready(r)
        frames = 0
        t0 = time.perf_counter()
        while True:
            for _ in range(16):
                r = one()
            frames += 16
            jax.block_until_ready(r)
            el = time.perf_counter() - t0
            if el > 2.5 and frames >= 32:
                break
        print(f"# sparse={mode} W=34 1080p: {el / frames * 1e3:.2f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()

"""Primary 1080p frame decomposition: where is the last 1.28x?

Sustained warm-token timings for the shipped fused frame vs knob
variants: vb (program virtualization), blk (tiles/program), flags
output elided, bigger caches, and a pure-sky camera (the per-frame
floor). No device readback anywhere.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python experiments/primary_floor_probe.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import numpy as np

    from benchmarks.run import _preset_world3
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import color_lut_rows
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rg3, mats, eye = _preset_world3(8)
    lut = color_lut_rows(mats.color)
    cam = CamData.create((30.0, 45.0, 0.0), eye, 70.0, (1920, 1080))
    sky_cam = CamData.create((-65.0, 45.0, 0.0), eye, 70.0, (1920, 1080))
    prep = prepare_grid4(rg3)
    base = dict(rounds=64, step_cap=500, steps_per_round=256,
                prepared=prep, return_cache=True, fused=True, s_seg=4)

    def sustained(label, kw, use_cam):
        tok = {"t": None}

        def one():
            img, t2 = render_frame4(rg3, use_cam, lut, cache=tok["t"],
                                    **kw)
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
        ms = el / frames * 1e3
        print(f"# {label}: {ms:.2f} ms/frame "
              f"({1920 * 1080 / (el / frames) / 1e6:.1f} Mrays/s)",
              flush=True)

    split = dict(rounds=64, step_cap=500, steps_per_round=256,
                 prepared=prep, return_cache=True, s_seg=4)
    for label, kw, c in [
        ("ship (s_seg4)", dict(base), cam),
        ("vb2", dict(base, vb=2), cam),
        ("vb4", dict(base, vb=4), cam),
        ("blk128", dict(base, blk=128), cam),
        ("blk128+vb2", dict(base, blk=128, vb=2), cam),
        ("n_sc32", dict(base, n_sc=32, s_ins=32), cam),
        ("warm_seg4", dict(base, warm_seg=4), cam),
        ("split", dict(split), cam),
        ("split cap2+c512", dict(split, primary_rounds=2,
                                 compact_tiles=512), cam),
        ("split cap1+c1024", dict(split, primary_rounds=1,
                                  compact_tiles=1024), cam),
        ("sky ship", dict(base), sky_cam),
        ("sky vb4", dict(base, vb=4), sky_cam),
        ("sky blk256", dict(base, blk=256), sky_cam),
    ]:
        try:
            sustained(label, kw, c)
        except Exception as e:  # noqa: BLE001 — probe battery
            print(f"# {label}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Config2 (720p primary + hard shadows) decomposition.

Sustained warm-token timings: shipped split frame, shadow-leg caps with
compacted resume (shadow_rounds/compact_tiles), serve-width variants,
and primary-only / shade-only to isolate the shadow leg's cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python experiments/shadow_probe.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    from benchmarks.run import _preset_world3
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rg3, mats, eye = _preset_world3(8)
    cam = CamData.create((30.0, 45.0, 0.0), eye, 70.0, (1280, 720))
    sun = (eye[0] + 900, 2500.0, eye[2] + 300)
    prep = prepare_grid4(rg3)
    base = dict(sun_pos=sun, rounds=64, step_cap=500, steps_per_round=256,
                prepared=prep, return_cache=True)

    def sustained(label, kw):
        tok = {"t": None}

        def one():
            img, t2 = render_frame4(rg3, cam, mats.color, cache=tok["t"],
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
              f"({2 * 1280 * 720 / (el / frames) / 1e6:.1f} Mrays/s "
              f"2 rays/px)", flush=True)

    for label, kw in [
        ("ship shadows", dict(base, shadows=True)),
        ("FUSED shadows", dict(base, shadows=True, fused=True)),
        ("sh cap8+c1024", dict(base, shadows=True, shadow_rounds=8,
                               compact_tiles=1024)),
        ("sh cap16+c1024", dict(base, shadows=True, shadow_rounds=16,
                                compact_tiles=1024)),
        ("sh seg4", dict(base, shadows=True, s_seg=4)),
        # round 5: lane-compacted shadow retry (active lanes packed to
        # the block front before tile compaction — big straggler
        # populations compress; see _bounce_retry4 lane_compact)
        ("sh cap2+lc1536 seg4", dict(base, shadows=True, shadow_rounds=2,
                                     compact_tiles=1536,
                                     compact_lanes=True, s_seg=4)),
        ("sh cap4+lc1024 seg4", dict(base, shadows=True, shadow_rounds=4,
                                     compact_tiles=1024,
                                     compact_lanes=True, s_seg=4)),
        ("sh cap8+lc768 seg4", dict(base, shadows=True, shadow_rounds=8,
                                    compact_tiles=768,
                                    compact_lanes=True, s_seg=4)),
        ("primary only (fused)", dict(base, fused=True, s_seg=4)),
        ("primary only (split)", dict(base)),
    ]:
        try:
            sustained(label, kw)
        except Exception as e:  # noqa: BLE001 — probe battery
            print(f"# {label}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

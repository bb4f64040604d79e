"""v4 march cost structure: resolution and camera-regime scaling.

If ms/frame scales linearly with ray count, the kernel is per-ray bound;
a large fixed intercept means program/launch overheads dominate. The
camera sweep separates step-count effects (sky rays exit in whole-window
jumps; straight-down rays hit in a few steps; the oblique terrain view
is the expensive regime).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_scaling_probe.py
"""

import time


def main():
    import jax

    from experiments.v4_safe_probe import build
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)
    v = float(rgrid.size_voxels)

    cams = {
        "oblique": ((35.0, 45.0, 0.0), (v * 0.5, v * 0.75, v * 0.5)),
        "sky": ((-40.0, 45.0, 0.0), (v * 0.5, v * 0.75, v * 0.5)),
        "down": ((89.0, 0.0, 0.0), (v * 0.5, v * 0.9, v * 0.5)),
        "horizon": ((2.0, 45.0, 0.0), (v * 0.5, v * 0.52, v * 0.5)),
    }
    sizes = [(960, 544), (1280, 720), (1920, 1080), (3840, 2160)]

    for cname, (rot, eye) in cams.items():
        for (w, h) in sizes:
            if cname != "oblique" and (w, h) != (1920, 1080):
                continue
            cam = CamData.create(rot, eye, 70.0, (w, h))

            def frame(tok):
                return render_frame4(
                    rgrid, cam, lut, rounds=64, step_cap=500,
                    steps_per_round=256, prepared=prep,
                    cache=tok, return_cache=True,
                )

            r, tok0 = frame(None)
            r, tok0 = frame(tok0)
            jax.block_until_ready(tok0)
            depth = 4
            toks = [tok0] * depth
            frames = 0
            t0 = time.perf_counter()
            while True:
                rs = []
                for i in range(depth):
                    r, toks[i] = frame(toks[i])
                    rs.append(r)
                jax.block_until_ready(rs[-1])
                frames += depth
                el = time.perf_counter() - t0
                if frames >= 8 and (el > 2.5 or frames >= 96):
                    break
            ms = el / frames * 1e3
            print(f"# {cname} {w}x{h}: {ms:.2f} ms/frame "
                  f"({w * h * frames / el / 1e6:.1f} Mrays/s)", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

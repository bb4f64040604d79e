"""Sustained-throughput knob sweep for the fused v4 frame (1080p).

Measures the way bench.py does: warm-start token carried frame-to-frame,
4 frames in flight, sync once per batch. Each combo's jit variants are
warmed before timing (an in-loop compile once skewed this by 20x).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_sustained_sweep.py
"""

import time


def main():
    import jax

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)

    combos = [
        # (s_ins, w_ins, steps_per_round, grouped)
        (16, 2, 128, False),   # current default
        (8, 2, 128, False),
        (8, 2, 256, False),
        (16, 2, 256, False),
        (16, 1, 128, False),
        (16, 2, 128, True),
        (16, 2, 64, False),
    ]
    for s_ins, w_ins, spr, grp in combos:
        def frame(tok):
            return render_frame4(
                rgrid, cam, lut, rounds=64, step_cap=500,
                steps_per_round=spr, s_ins=s_ins, w_ins=w_ins,
                grouped=grp, cache=tok, return_cache=True,
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
        mrays = 1920 * 1080 * frames / el / 1e6
        print(f"# s_ins={s_ins} w_ins={w_ins} spr={spr} grouped={grp}: "
              f"{mrays:.1f} Mrays/s ({frames} frames / {el:.2f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

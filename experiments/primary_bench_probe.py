"""Bench-methodology primary sweep: stride-4 token pipeline, 96-frame
batches, 3 windows, median — exactly bench.py's discipline — comparing
the fused ship against split-path cap+compact-resume variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python experiments/primary_bench_probe.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

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
    prep = prepare_grid4(rg3)
    base = dict(rounds=64, step_cap=500, steps_per_round=256,
                prepared=prep, return_cache=True)

    def bench_like(label, kw):
        def frame(tok):
            return render_frame4(rg3, cam, lut, cache=tok, **kw)

        r, tok0 = frame(None)
        r, tok0 = frame(tok0)
        jax.block_until_ready(tok0)
        stride, batch = 4, 96
        rates = []
        tokens = [tok0] * stride
        for _ in range(3):
            frames = 0
            t0 = time.perf_counter()
            while True:
                last = None
                for i in range(batch):
                    last, tokens[i % stride] = frame(tokens[i % stride])
                jax.block_until_ready(last)
                frames += batch
                el = time.perf_counter() - t0
                if el > 2.0 or frames >= 2 * batch:
                    break
            rates.append(1920 * 1080 * frames / el / 1e6)
        rates.sort()
        print(f"# {label}: {rates[1]:.1f} Mrays/s "
              f"(spread {rates[0]:.1f}..{rates[2]:.1f})", flush=True)

    for label, kw in [
        ("fused ship s_seg4", dict(base, fused=True, s_seg=4)),
        ("split s_seg4", dict(base, s_seg=4)),
        ("split cap2+c512 seg4", dict(base, s_seg=4, primary_rounds=2,
                                      compact_tiles=512)),
        # round 5: lane-compacted primary retry (config3's winning
        # architecture applied to the render path)
        ("split cap1+lc1024 seg4", dict(base, s_seg=4, primary_rounds=1,
                                        compact_tiles=1024,
                                        compact_lanes=True)),
        ("split cap2+lc512 seg4", dict(base, s_seg=4, primary_rounds=2,
                                       compact_tiles=512,
                                       compact_lanes=True)),
        ("split cap2+lc768 seg4", dict(base, s_seg=4, primary_rounds=2,
                                       compact_tiles=768,
                                       compact_lanes=True)),
    ]:
        try:
            bench_like(label, kw)
        except Exception as e:  # noqa: BLE001 — probe battery
            print(f"# {label}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

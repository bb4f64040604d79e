"""Frame-time vs step-cap curve for the FUSED v4 frame at the bench config.

Decomposes the 14.5 ms/1080p headline frame: step_cap is a dynamic SMEM
scalar, so one compiled program sweeps the whole curve. The cap=1 point
is everything-but-marching (launch + warm wave + 1 step + serve rounds
+ in-kernel shade + output); the slope above it is the per-step march
cost; the plateau is full convergence (block-max mean is 20 quantized,
experiments/v4_step_stats.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_fused_cap_curve.py
"""

import time

PX = 1920 * 1080


def sustained(mk_frame, tok0, batch=96, min_s=2.5):
    import jax

    stride = 4
    toks = [tok0] * stride
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

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4, render_frame4

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)
    cam = cam_for(rgrid, 1920, 1080)

    def frame_at(cap):
        def mk(tok):
            return render_frame4(
                rgrid, cam, lut, rounds=64, step_cap=cap,
                steps_per_round=256, prepared=prep, cache=tok,
                return_cache=True, fused=True, s_seg=4,
            )
        return mk

    # compile once (cap is dynamic)
    mk = frame_at(500)
    r, tok = mk(None)
    r, tok = mk(tok)
    jax.block_until_ready(r)

    prev = None
    for cap in (1, 2, 4, 8, 12, 16, 24, 32, 48, 64, 500):
        ms = sustained(frame_at(cap), tok)
        d = "" if prev is None else f"  (+{ms - prev:.2f})"
        print(f"# cap={cap:4d}: {ms:.2f} ms/f  {PX / ms / 1e3:.1f} Mrays/s{d}",
              flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

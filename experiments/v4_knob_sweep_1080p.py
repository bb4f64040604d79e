"""On-chip knob sweep of the fused v4 frame at the exact bench config.

Round-3 state: 14.5 ms/frame (142.7 Mrays/s) at blk=64, steps_per_round
=256, s_ins=16, s_seg=4. Sweeps the compile-time knobs that change the
program count (blk), the in-kernel spin budget (steps_per_round) and the
service width (s_ins) around that point. Warm tokens pipelined depth 4,
exactly like bench.py; no D2H anywhere.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_knob_sweep_1080p.py [extra]
"""

import sys
import time


def sustained(frame, tok0):
    import jax

    depth = 4
    toks = [tok0] * depth
    frames = 0
    t0 = time.perf_counter()
    while True:
        last = None
        for i in range(depth):
            last, toks[i] = frame(toks[i])
        jax.block_until_ready(last)
        frames += depth
        el = time.perf_counter() - t0
        if frames >= 24 and (el > 2.0 or frames >= 192):
            break
    return el / frames * 1e3, 1920 * 1080 * frames / el / 1e6


def main():
    import jax

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4, render_frame4

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)
    cam = cam_for(rgrid, 1920, 1080)

    base = dict(rounds=64, step_cap=500, steps_per_round=256,
                prepared=prep, return_cache=True, fused=True, s_seg=4)

    configs = [
        ("base blk64 spr256 sins16", {}),
        ("blk128", {"blk": 128}),
        ("blk256", {"blk": 256}),
        ("blk32", {"blk": 32}),
        ("spr512", {"steps_per_round": 512}),
        ("spr128", {"steps_per_round": 128}),
        ("sins32", {"s_ins": 32}),
        ("sins8", {"s_ins": 8}),
    ]
    if "extra" in sys.argv[1:]:
        configs += [
            ("blk128 spr512", {"blk": 128, "steps_per_round": 512}),
            ("blk128 sins32", {"blk": 128, "s_ins": 32}),
            ("grouped", {"grouped": True}),
            ("s_seg8", {"s_seg": 8}),
            ("s_seg2", {"s_seg": 2}),
        ]

    for label, over in configs:
        kw = dict(base)
        kw.update(over)

        def frame(tok, kw=kw):
            return render_frame4(rgrid, cam, lut, cache=tok, **kw)

        try:
            t0 = time.perf_counter()
            r, tok = frame(None)
            r, tok = frame(tok)
            jax.block_until_ready(tok)
            comp_s = time.perf_counter() - t0
            ms, mrays = sustained(frame, tok)
            print(f"# {label}: {ms:.2f} ms/f  {mrays:.1f} Mrays/s  "
                  f"(compile {comp_s:.0f}s)", flush=True)
        except Exception as e:  # compile failures (e.g. VMEM) are findings
            print(f"# {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

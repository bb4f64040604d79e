"""On-chip warm-vs-cold correctness check for PT knob configs.

The sustained timings chain warm tokens; the quality gates so far only
rendered COLD frames. A config whose WARM program is miscompiled would
time absurdly fast and gate clean — this probe closes that hole:
renders cold + two warm-chained frames per config on the chip, one D2H
wave at the end, reports max|warm - cold| stats.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python experiments/pt_warm_check.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CONFIGS = [
    ("ship r16", dict()),
    ("ramp2 r16", dict(prim_steps_per_round=256, prim_s_seg=4,
                       bounce_steps_per_round=256, bounce_spin_ramp=2)),
    ("ramp1+sort r16", dict(prim_steps_per_round=256, prim_s_seg=4,
                            bounce_steps_per_round=256,
                            bounce_spin_ramp=1, bounce_sort=True)),
]


def main():
    import jax
    import numpy as np

    from benchmarks.run import _preset_world3
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import path_trace3
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

    print(f"# devices={jax.devices()}", flush=True)
    rg3, mats, eye = _preset_world3(8)
    cam = CamData.create((30.0, 45.0, 0.0), eye, 70.0, (1920, 1080))
    sun = (eye[0] + 900, 2500.0, eye[2] + 300)
    key = jax.random.PRNGKey(0)
    prep = prepare_grid4(rg3)
    base = dict(sun_pos=sun, bounces=1, samples=1, key=key, step_cap=500,
                v4=True, prepared=prep, rounds=16)

    outs = []
    for label, kw in CONFIGS:
        cold = path_trace3(rg3, cam, mats, **{**base, **kw})
        _w1, tok = path_trace3(rg3, cam, mats, cache=None,
                               return_cache=True, **{**base, **kw})
        w2, tok2 = path_trace3(rg3, cam, mats, cache=tok,
                               return_cache=True, **{**base, **kw})
        w3, _ = path_trace3(rg3, cam, mats, cache=tok2,
                            return_cache=True, **{**base, **kw})
        jax.block_until_ready(w3)
        # honest warm-frame latency: small batch, per-batch sync
        t0 = time.perf_counter()
        wt = tok2
        last = w3
        for _ in range(8):
            last, wt = path_trace3(rg3, cam, mats, cache=wt,
                                   return_cache=True, **{**base, **kw})
        jax.block_until_ready(last)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"# {label}: warm {ms:.2f} ms/frame (8-deep, 1 sync)",
              flush=True)
        outs.append((label, cold, w2, w3))

    for label, cold, w2, w3 in outs:
        c = np.asarray(cold)
        for tag, w in (("warm2", w2), ("warm3", w3)):
            d = np.abs(np.asarray(w) - c).max(axis=-1)
            print(f"# {label} {tag}: frac>1/255 vs cold = "
                  f"{float((d > 1.0 / 255.0).mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()

"""Config3 (1080p 1-bounce PT) straggler re-batching probe.

Times the shipped XLA route against capped-bounce + tile-compacted
resume variants (wavefront3 bounce_rounds/compact_tiles), and quality-
gates each variant against a rounds=64 uncompacted reference.

  time mode (default): sustained ms/frame per variant, NO device
      readback at any point (docs/TPU_NOTES.md D2H poison).
  gate mode (`gate` arg): renders one frame per variant plus the
      reference, does a single end-of-process D2H wave, and reports the
      fraction of pixels off by >1/255 — a truncation artifact detector
      (segmented-serve fetches once faked 97->76 ms at 13-25% wrong).

Run: PYTHONPATH=/root/repo timeout 1800 python experiments/pt_compact_probe.py [gate]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PRIM = dict(prim_steps_per_round=256, prim_s_seg=4)
VARIANTS = [
    # bounce legs back on the dynamic window cache (use_wm_full=False)
    ("ship r16", dict(PRIM)),
    ("ship r20", dict(PRIM, rounds=20)),
]


def main():
    gate = len(sys.argv) > 1 and sys.argv[1] == "gate"

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
                v4=True, prepared=prep)

    if gate:
        imgs = {}
        ref = path_trace3(rg3, cam, mats, rounds=64, **base)
        for label, kw in VARIANTS:
            imgs[label] = path_trace3(
                rg3, cam, mats, **{**base, "rounds": 16, **kw})
        jax.block_until_ready(list(imgs.values()) + [ref])
        # single end-of-process D2H wave
        refn = np.asarray(ref)
        for label, _ in VARIANTS:
            d = np.abs(np.asarray(imgs[label]) - refn).max(axis=-1)
            frac_bad = float((d > 1.0 / 255.0).mean())
            print(f"# gate {label}: frac>1/255 = {frac_bad:.5f}",
                  flush=True)
        return

    def sustained(label, mk):
        tok = {"t": None}

        def one():
            img, t2 = mk(tok["t"])
            tok["t"] = t2
            return img

        r = one()
        r = one()
        jax.block_until_ready(r)
        frames = 0
        t0 = time.perf_counter()
        while True:
            for _ in range(8):
                r = one()
            frames += 8
            jax.block_until_ready(r)
            el = time.perf_counter() - t0
            if el > 3.0 and frames >= 16:
                break
        ms = el / frames * 1e3
        mr = 2 * 1920 * 1080 / (el / frames) / 1e6
        print(f"# {label}: {ms:.2f} ms/frame  ({mr:.1f} Mrays/s)",
              flush=True)

    for label, kw in VARIANTS:
        sustained(label, lambda tok, kw=kw: path_trace3(
            rg3, cam, mats, cache=tok, return_cache=True,
            **{**base, "rounds": 16, **kw}))

    # quality gate in the SAME process: timing is done, so the single
    # end-of-process D2H wave can no longer contaminate anything
    imgs = {}
    ref = path_trace3(rg3, cam, mats, rounds=64, **base)
    for label, kw in VARIANTS:
        imgs[label] = path_trace3(
            rg3, cam, mats, **{**base, "rounds": 16, **kw})
    jax.block_until_ready(list(imgs.values()) + [ref])
    import numpy as np
    refn = np.asarray(ref)
    for label, _ in VARIANTS:
        d = np.abs(np.asarray(imgs[label]) - refn).max(axis=-1)
        print(f"# gate {label}: frac>1/255 = "
              f"{float((d > 1.0 / 255.0).mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()

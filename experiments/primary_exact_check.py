"""Exactness check for the cap1+compact primary on the BENCH world.

The primary compact-resume is bit-exact iff the straggler tiles fit the
capacity; this renders the bench demo world at 1080p over the static cam
+ 8 orbit positions and counts differing pixels vs the uncapped frame
(one end-of-process D2H wave). Zero everywhere = safe to ship in
bench.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python experiments/primary_exact_check.py [cap] [tiles]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import numpy as np

    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import (
        build_render_grid3_host,
        color_lut_rows,
    )
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )

    print(f"# devices={jax.devices()} cap={cap} tiles={tiles}",
          flush=True)
    w = 8
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w, w * 32 * 0.45, int(w * 32 * 0.28)
    )
    mats = demo_materials()
    rg = build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), w, mats
    )
    lut = color_lut_rows(mats.color)
    prep = prepare_grid4(rg)
    v = w * 32
    cams = [CamData.create((35.0, 45.0, 0.0),
                           (v * 0.5, v * 0.75, v * 0.5), 70.0,
                           (1920, 1080))]
    for i in range(8):
        a = 360.0 * i / 8
        cams.append(CamData.create(
            (30.0, (a + 180.0) % 360.0, 0.0),
            (v * 0.5 + v * 0.35 * np.cos(np.deg2rad(a)), v * 0.72,
             v * 0.5 + v * 0.35 * np.sin(np.deg2rad(a))),
            70.0, (1920, 1080),
        ))

    base = dict(rounds=64, step_cap=500, steps_per_round=256,
                prepared=prep, s_seg=4)
    pairs = []
    for cam in cams:
        ref = render_frame4(rg, cam, lut, **base)
        got = render_frame4(rg, cam, lut, primary_rounds=cap,
                            compact_tiles=tiles, **base)
        pairs.append((ref, got))
    jax.block_until_ready([p[1] for p in pairs])
    bad = 0
    for i, (ref, got) in enumerate(pairs):
        n = int((np.asarray(ref) != np.asarray(got)).sum())
        bad += n
        print(f"# cam{i}: differing pixels = {n}", flush=True)
    print(f"# TOTAL differing: {bad}", flush=True)


if __name__ == "__main__":
    main()

"""Sweep tail-compaction cascade levels on the fused 1080p frame.

Measures the full render_frame3 pipeline (trace + shade, warm lag-chained
service tokens like bench.py) across cascade configurations: no
compaction, the one-level quarter grid, and multi-level cascades that
also shrink the bulk phase. Each extra level costs one more Pallas kernel
variant at compile time; run serially, one process (axon discipline).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

W, H = 1920, 1080
wc = 8
perm = noise.make_permutation(7)
grids, cells = demo_chunk_grids_host(
    perm, np.zeros(3, np.int64), wc, wc * 32 * 0.45, int(wc * 32 * 0.28))
mats = demo_materials()
rg = w3.build_render_grid3_host(grids, cells, np.zeros(3, np.int32), wc, mats)
cam = CamData.create((35.0, 45.0, 0.0),
                     (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5),
                     70.0, (W, H))
lut = w3.color_lut_rows(mats.color)

CONFIGS = [
    ("none", False),
    ("quarter", True),
    ("2-8", (2, 8)),
    ("2-4-16", (2, 4, 16)),
]
if len(sys.argv) > 1:
    pick = set(sys.argv[1].split(","))
    CONFIGS = [c for c in CONFIGS if c[0] in pick]


def run(name, compact):
    def frame(tok):
        return w3.render_frame3(
            rg, cam, lut, rounds=14, step_cap=500, cache=tok,
            return_cache=True, compact=compact,
        )

    t0 = time.perf_counter()
    r, tok0 = frame(None)
    r, tok0 = frame(tok0)
    jax.block_until_ready(tok0)
    print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    depth = 4
    tokens = [tok0] * depth
    frames = 0
    t0 = time.perf_counter()
    while True:
        rs = []
        for i in range(depth):
            r, tokens[i] = frame(tokens[i])
            rs.append(r)
        jax.block_until_ready(rs[-1])
        frames += depth
        el = time.perf_counter() - t0
        if frames >= 8 and el > 5.0:
            break
    print(f"{name}: {el/frames*1e3:7.2f} ms/f "
          f"({W*H*frames/el/1e6:6.1f} Mrays/s, {frames} frames)", flush=True)


for name, compact in CONFIGS:
    run(name, compact)

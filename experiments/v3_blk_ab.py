"""A/B: _BLK=128 (8x16-tile superblock, half the grid programs) vs 64.

Run:  python experiments/v3_blk_ab.py [blk [n_sc s_ins]]
Patches module constants BEFORE any tracing; one config per process
(jit caches and Mosaic programs are shaped by the constants).
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

blk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
if len(sys.argv) > 3:
    w3.N_SC = int(sys.argv[2])
    w3._S_INS = int(sys.argv[3])
w3._BLK = blk
w3.SB_H = blk // w3.SB_W

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
origin = jnp.asarray(cam.pos, jnp.float32)


def timeit(name, f, n=8):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms ({W*H/dt/1e6:6.1f} Mrays/s)", flush=True)
    return dt


print(f"# blk={w3._BLK} sb={w3.SB_W}x{w3.SB_H} n_sc={w3.N_SC} "
      f"s_ins={w3._S_INS}", flush=True)
for R in (8, 14):
    f = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=R,
                resolve_ids="none", step_cap=500)
    timeit(f"terr R={R:2d}", f)

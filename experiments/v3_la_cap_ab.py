"""A/B lookahead x step_cap at 1080p/R=14 on TPU (timing only)."""
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

for la in (1, 2, 4):
    f = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=14,
                resolve_ids="none", lookahead=la, step_cap=500)
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"la={la} cap=500: {dt*1e3:7.2f} ms ({W*H/dt/1e6:6.1f} Mrays/s)",
          flush=True)

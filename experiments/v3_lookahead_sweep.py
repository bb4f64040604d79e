"""A/B the lookahead prefetch at 1080p on TPU: time rounds sweep, then
read convergence (hit fraction) AFTER all timing (D2H poisons dispatch).

Usage: v3_lookahead_sweep.py <lookahead>
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

LA = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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

ROUNDS = (4, 6, 8, 12, 16)
times = {}
for R in ROUNDS:
    f = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=R,
                resolve_ids="none", lookahead=LA)
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    times[R] = dt
    print(f"la={LA} R={R:2d}: {dt*1e3:7.2f} ms ({W*H/dt/1e6:6.1f} Mrays/s)",
          flush=True)

# convergence read-back AFTER timing (process is now poisoned; fine)
for R in ROUNDS:
    r = w3.trace_wavefront3(rg, origin, cam=cam, rounds=R,
                            resolve_ids="none", lookahead=LA)
    print(f"la={LA} R={R:2d}: hit={float(np.asarray(r.hit).mean()):.4f}",
          flush=True)

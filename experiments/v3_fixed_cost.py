"""Isolate the v3 frame's fixed cost (prep + finish + first rounds).

- sky camera: all rays exit the world in ~1 round -> floor of the frame
- terrain camera at rounds=1,2,4 -> early-round marginal cost
"""
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
eye = (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5)


def timeit(name, f, n=6):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms", flush=True)
    return dt


sky = CamData.create((-60.0, 45.0, 0.0), eye, 70.0, (W, H))
ter = CamData.create((35.0, 45.0, 0.0), eye, 70.0, (W, H))

for name, cam, R in (("sky  R=1", sky, 1), ("sky  R=14", sky, 14),
                     ("terr R=1", ter, 1), ("terr R=2", ter, 2),
                     ("terr R=4", ter, 4), ("terr R=6", ter, 6),
                     ("terr R=8", ter, 8)):
    origin = jnp.asarray(cam.pos, jnp.float32)
    f = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=R,
                resolve_ids="none")
    timeit(name, f)

"""Sustained 1080p throughput: cold service vs fixed warm token vs lag-chained.

A real frame loop carries the previous frame's service-cache token; a
fixed token (or one lagging a few frames) keeps the pipeline full while
still replaying the schedule.
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
cam = CamData.create((35.0, 45.0, 0.0),
                     (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5),
                     70.0, (W, H))
origin = jnp.asarray(cam.pos, jnp.float32)


def sustain(name, f, depth=4, min_s=4.0):
    r = f()
    jax.block_until_ready(r)
    frames = 0
    t0 = time.perf_counter()
    while True:
        rs = [f() for _ in range(depth)]
        jax.block_until_ready(rs[-1])
        frames += depth
        el = time.perf_counter() - t0
        if frames >= 8 and el > min_s:
            break
    print(f"{name}: {el/frames*1e3:7.2f} ms/f ({W*H*frames/el/1e6:6.1f} "
          f"Mrays/s, {frames} frames)", flush=True)


cold = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=14,
               resolve_ids="none", step_cap=500)
sustain("cold  trace", cold)

r, tok = w3.trace_wavefront3(rg, origin, cam=cam, rounds=14,
                             resolve_ids="none", step_cap=500,
                             return_cache=True)
jax.block_until_ready(tok)
warm = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=14,
               resolve_ids="none", step_cap=500, cache=tok)
sustain("fixed warm ", warm)

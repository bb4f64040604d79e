"""Measure the persistent service cache: orbiting camera at 1080p,
frame N warm-started from frame N-1's cache ids vs every frame cold.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

W, H = 1920, 1080
wc = 8
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 14
STEP_DEG = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25

perm = noise.make_permutation(7)
grids, cells = demo_chunk_grids_host(
    perm, np.zeros(3, np.int64), wc, wc * 32 * 0.45, int(wc * 32 * 0.28))
mats = demo_materials()
rg = w3.build_render_grid3_host(grids, cells, np.zeros(3, np.int32), wc, mats)
eye = (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5)


def cam_at(i):
    return CamData.create((35.0, 45.0 + STEP_DEG * i, 0.0), eye, 70.0, (W, H))


origin = jnp.asarray(cam_at(0).pos, jnp.float32)

# one compiled program: frame 0 gets the empty token
cache = w3.empty_frame_cache(W, H)
r, cache = w3.trace_wavefront3(
    rg, origin, cam=cam_at(0), rounds=ROUNDS, cache=cache, return_cache=True)
jax.block_until_ready(r.t)
print("# compiled", flush=True)
hits = float(np.asarray(r.hit).mean())
print(f"# hit={hits:.4f}", flush=True)

# warm chained orbit
N = 24
t0 = time.perf_counter()
for i in range(1, N + 1):
    r, cache = w3.trace_wavefront3(
        rg, origin, cam=cam_at(i), rounds=ROUNDS, cache=cache,
        return_cache=True)
jax.block_until_ready(r.t)
dt = (time.perf_counter() - t0) / N
print(f"warm orbit: {dt*1e3:.1f} ms = {W*H/dt/1e6:.1f} Mrays/s", flush=True)

# cold chained orbit (empty token every frame, same compiled program)
empty = w3.empty_frame_cache(W, H)
t0 = time.perf_counter()
for i in range(1, N + 1):
    r, _ = w3.trace_wavefront3(
        rg, origin, cam=cam_at(i), rounds=ROUNDS, cache=empty,
        return_cache=True)
jax.block_until_ready(r.t)
dt = (time.perf_counter() - t0) / N
print(f"cold orbit: {dt*1e3:.1f} ms = {W*H/dt/1e6:.1f} Mrays/s", flush=True)

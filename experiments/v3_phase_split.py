"""Phase split at 1080p: prep+finish (R=0) vs marginal rounds; raw vs full."""
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
args = (rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack)
z = jnp.zeros((), jnp.float32)
zi = jnp.zeros((), jnp.int32)
iv = jnp.asarray(cam.inv_view, jnp.float32)
ip = jnp.asarray(cam.inv_proj, jnp.float32)


def timeit(name, f, n=8):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms", flush=True)
    return dt


for R in (0, 1, 2, 4, 8):
    raw = partial(
        w3._trace_frame, *args, origin, iv, ip, z, z, z, zi, zi, zi, R, 500,
        width=W, height=H, sub_rounds=6, sub_steps=8,
        v=int(rg.size_voxels), interpret=False, per_ray=False, raw_out=True)
    timeit(f"raw R={R}", raw)

full = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=8,
               resolve_ids="palette", step_cap=500)
timeit("full R=8 +ids", full)

"""Sweep tail_start / tail_sub_rounds / lookahead at 1080p (warm token).

Each config is one _trace_frame recompile (~2-4 min); keep the list short.
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
args = (rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack)
z = jnp.zeros((), jnp.float32)
zi = jnp.zeros((), jnp.int32)
iv = jnp.asarray(cam.inv_view, jnp.float32)
ip = jnp.asarray(cam.inv_proj, jnp.float32)


def run(ts_, tsr, la, n=8):
    f = partial(
        w3._trace_frame, *args, origin, iv, ip, z, z, z, zi, zi, zi,
        14, 500,
        width=W, height=H, sub_rounds=6, sub_steps=8,
        v=int(rg.size_voxels), interpret=False, per_ray=False,
        raw_out=True, lookahead=la, tail_start=ts_, tail_sub_rounds=tsr)
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"ts={ts_} tsr={tsr:3d} la={la}: {dt*1e3:7.2f} ms "
          f"({W*H/dt/1e6:6.1f} Mrays/s)", flush=True)


run(5, 30, 1)   # current default
run(3, 30, 1)
run(2, 60, 1)
run(3, 30, 2)

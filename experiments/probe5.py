import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.wavefront import build_render_grid, trace_wavefront
from voxelraytracing_tpu.ops.camera import CamData, generate_rays

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

W = 8
perm = jnp.asarray(noise.make_permutation(7))
grids, cells = demo_chunk_grids(perm, jnp.zeros(3, jnp.int32), W, jnp.float32(W*32*0.45), jnp.int32(int(W*32*0.28)))
mats = demo_materials()
rgrid = build_render_grid(grids, cells, np.zeros(3, np.int32), W, mats)
jax.block_until_ready(rgrid.bricks)
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(dirs)

for name, mr, ins in [("refetch_only_8r", 8, 0), ("steps_only_1rx24", 1, 24), ("mixed_4rx12", 4, 12)]:
    t0 = time.perf_counter()
    r = trace_wavefront(rgrid, origin, dirs, width=1920, height=1080, max_rounds=mr, inner_steps=ins)
    jax.block_until_ready(r)
    tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(3):
        r = trace_wavefront(rgrid, origin, dirs, width=1920, height=1080, max_rounds=mr, inner_steps=ins)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/3
    log(f"{name}: {dt*1e3:.1f} ms (compile {tc:.1f}s)")

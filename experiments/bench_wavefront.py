import sys; sys.path.insert(0, "/root/repo")
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.wavefront import build_render_grid, trace_wavefront
from voxelraytracing_tpu.ops.camera import CamData, generate_rays

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

from voxelraytracing_tpu.ops import wavefront as WF
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
log("rgrid loaded from cache")

cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(dirs)
mr = int(sys.argv[1]) if len(sys.argv) > 1 else 48
t0 = time.perf_counter()
r = trace_wavefront(rgrid, origin, dirs, width=1920, height=1080, max_rounds=mr)
jax.block_until_ready(r)
log(f"compile+first run rounds={mr}:", round(time.perf_counter()-t0, 1), "s")
t0 = time.perf_counter()
n = 5
for _ in range(n):
    r = trace_wavefront(rgrid, origin, dirs, width=1920, height=1080, max_rounds=mr)
jax.block_until_ready(r)
dt = (time.perf_counter()-t0)/n
log(f"1080p rounds={mr}: {dt*1e3:.2f} ms -> {1920*1080/dt/1e6:.1f} Mrays/s; hitfrac {float(np.asarray(r.hit).mean()):.3f} maxsteps {int(np.asarray(r.steps).max())}")

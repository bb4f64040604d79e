import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
origin = jnp.asarray(np.asarray(origin), jnp.float32)
dirs = jax.device_put(dirs)
rays, c0 = WF._prep(origin, dirs, tx=120, ty=135, v=rgrid.size_voxels)
jax.block_until_ready(c0)
T = c0.t.shape[0]
rng = np.random.default_rng(0)
bw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
lw_row = jnp.zeros((T,128), jnp.uint32)
bw_jump = jnp.zeros((T,), bool)
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)

step_jit = jax.jit(partial(WF._step, nb=None), static_argnames=()) if False else None
stepf = jax.jit(lambda rg, rays, c, o, a, b, j, s: WF._step(rg, rays, c, o, 4, 64, a, b, j, s))
c = stepf(rgrid, rays, c0, origin, bw_row, lw_row, bw_jump, slot_row)
jax.block_until_ready(c)
t0 = time.perf_counter()
for _ in range(8):
    c = stepf(rgrid, rays, c, origin, bw_row, lw_row, bw_jump, slot_row)
jax.block_until_ready(c)
print(f"real _step all-args single jit: {(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)

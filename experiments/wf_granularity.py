import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(dirs); jax.block_until_ready(dirs)

origin = jnp.asarray(np.asarray(origin), jnp.float32)
for ins in (1, 2, 4, 12):
    rays, c = WF._prep(origin, dirs, tx=120, ty=135, v=rgrid.size_voxels)
    c = WF._round(rgrid, rays, origin, c, nb=4, inner_steps=ins)  # compile
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(8):
        c = WF._round(rgrid, rays, origin, c, nb=4, inner_steps=ins)
    jax.block_until_ready(c)
    dt = (time.perf_counter()-t0)/8
    print(f"inner_steps={ins}: {dt*1e3:.2f} ms/round -> {dt/ins*1e3:.2f} ms/step", flush=True)

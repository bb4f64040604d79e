import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
T = 16200
rng = np.random.default_rng(0)
i32 = jnp.int32

def bench(name, fn, *args, iters=10):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)
    return r

# 1. WARM _gather3 with fresh default-layout arrays
bw0 = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
widx0 = jnp.asarray(rng.integers(0, 128, (T,128)), i32)
bench("warm_gather3_fresh", WF._gather3, bw0, bw0, bw0, widx0, widx0)

# 2. now feed it producer-layout arrays
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
origin = jnp.asarray(np.asarray(origin), jnp.float32)
rays, c0 = WF._prep(origin, jax.device_put(dirs), tx=120, ty=135, v=rgrid.size_voxels)
c1 = WF._refetch(rgrid.brick_dir, rays, c0, origin, nb=4)
bw_row, lw_row, bw_jump = WF._rows_win(rgrid.bwin, rgrid.lwin, c1.bw_id)
slot_row = WF._rows_slots(rgrid.bricks, c1.slot_content)
widx, vidx = WF._pre(rays, c1, origin, nb=4, bg_side=64)
jax.block_until_ready((bw_row, slot_row, widx))
bench("gather3_producer_inputs_after_warm", WF._gather3, bw_row, lw_row, slot_row, widx, vidx)

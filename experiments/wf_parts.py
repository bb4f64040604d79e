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
dirs = jax.device_put(dirs)
origin = jnp.asarray(np.asarray(origin), jnp.float32)
rays, c0 = WF._prep(origin, dirs, tx=120, ty=135, v=rgrid.size_voxels)
jax.block_until_ready(c0)
T = c0.t.shape[0]
rng = np.random.default_rng(0)

def bench(name, f, *args, iters=8):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)

# 1. single step with rows passed in (top-level jit)
bw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), jnp.uint32)
lw_row = jnp.zeros((T,128), jnp.uint32)
bw_jump = jnp.zeros((T,), bool)
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), jnp.uint32)

step2 = jax.jit(lambda c, a, b, j, s: WF._step(rgrid, rays, c, origin, 4, 64, a, b, j, s))
bench("step_only(rows as args)", step2, c0, bw_row, lw_row, bw_jump, slot_row)

# 2. refetch-ish: slot selection + dir gather + bricks gather
@jax.jit
def fetches(c):
    dir_idx = jnp.clip(c.slot_bricks, 0, rgrid.brick_dir.shape[0]-1)
    content = rgrid.brick_dir[dir_idx]
    rows = rgrid.bricks[jnp.clip(content, 0, rgrid.bricks.shape[0]-1)]
    return rows.reshape(T, 128)
bench("dir+bricks_fetch[T,8]", fetches, c0)

@jax.jit
def winfetch(c):
    row_idx = jnp.clip(c.bw_id, 0, rgrid.bwin.shape[0]-1)
    return rgrid.bwin[row_idx], rgrid.lwin[row_idx]
bench("winfetch[T]", winfetch, c0)

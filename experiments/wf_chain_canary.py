"""Canary-walk the real dispatch chain; report where fast mode is lost."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
T = 16200
rng = np.random.default_rng(0)
rows_rand = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
idx_rand = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)
def canary(tag, iters=10):
    r = WF._gather3(rows_rand, rows_rand, rows_rand, idx_rand, idx_rand)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = WF._gather3(rows_rand, rows_rand, rows_rand, idx_rand, idx_rand)
    jax.block_until_ready(r)
    ms = (time.perf_counter()-t0)/iters*1e3
    print(f"canary[{tag}]: {ms:.3f} ms {'<<< POISONED' if ms > 5 else ''}", flush=True)

canary("start")
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(dirs)
origin = jnp.asarray(origin, jnp.float32)
canary("inputs ready")
rays, c = WF._prep(origin, dirs, tx=120, ty=135, v=256)
jax.block_until_ready(c); canary("_prep")
c = WF._refetch(rgrid.brick_dir, rays, c, origin, jnp.int32(0), nb=4)
jax.block_until_ready(c); canary("_refetch")
bw_row, lw_row, bw_jump = WF._rows_win(rgrid.bwin, rgrid.lwin, c.bw_id)
jax.block_until_ready(bw_row); canary("_rows_win")
slot_row = WF._rows_slots(rgrid.bricks, c.slot_content)
jax.block_until_ready(slot_row); canary("_rows_slots")
widx, vidx = WF._pre(rays, c, origin, nb=4, bg_side=64)
jax.block_until_ready(widx); canary("_pre")
w_, l_, v_ = WF._gather3(bw_row, lw_row, slot_row, widx, vidx)
jax.block_until_ready(w_); canary("_gather3(real)")
c = WF._post_brick(rays, c, origin, bw_jump, w_, l_, nb=4, bg_side=64)
jax.block_until_ready(c); canary("_post_brick")
c = WF._post_voxel(rays, c, origin, rgrid.n_liquid, v_)
jax.block_until_ready(c); canary("_post_voxel")
# a few full rounds end-to-end, timed
t0 = time.perf_counter()
for r_i in range(4):
    c = WF._refetch(rgrid.brick_dir, rays, c, origin, jnp.int32(0), nb=4)
    bw_row, lw_row, bw_jump = WF._rows_win(rgrid.bwin, rgrid.lwin, c.bw_id)
    slot_row = WF._rows_slots(rgrid.bricks, c.slot_content)
    for _ in range(12):
        widx, vidx = WF._pre(rays, c, origin, nb=4, bg_side=64)
        w_, l_, v_ = WF._gather3(bw_row, lw_row, slot_row, widx, vidx)
        c = WF._post_brick(rays, c, origin, bw_jump, w_, l_, nb=4, bg_side=64)
        c = WF._post_voxel(rays, c, origin, rgrid.n_liquid, v_)
jax.block_until_ready(c)
print("4 warm rounds:", round((time.perf_counter()-t0)*1e3, 1), "ms", flush=True)
canary("end")

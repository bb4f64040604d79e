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
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
origin = jnp.asarray(np.asarray(origin), jnp.float32)
dirs = jax.device_put(dirs)
rays, c0 = WF._prep(origin, dirs, tx=120, ty=135, v=rgrid.size_voxels)
jax.block_until_ready(c0)

def bench(name, f, *args, iters=8, donate_c=False):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)
    return r

c1 = bench("_refetch", lambda: WF._refetch(rgrid.brick_dir, rays, c0, origin, nb=4))
rw = bench("_rows_win", lambda: WF._rows_win(rgrid.bwin, rgrid.lwin, c1.bw_id))
sr = bench("_rows_slots", lambda: WF._rows_slots(rgrid.bricks, c1.slot_content))
pre = bench("_pre", lambda: WF._pre(rays, c1, origin, nb=4, bg_side=64))
g3 = bench("_gather3", lambda: WF._gather3(rw[0], rw[1], sr, pre[0], pre[1]))
# _post donates carry; pass fresh copies
import copy
def post_once():
    c = jax.tree.map(lambda x: x + 0 if x.dtype != bool else x | False, c1)
    return WF._post(rays, c, origin, rgrid.n_liquid, rw[2], g3[0], g3[1], g3[2], nb=4, bg_side=64)
bench("_post(+copy)", post_once)

# layout theory: same VALUES, default layouts via host round-trip
bw_row_h = jnp.asarray(np.asarray(rw[0]))
lw_row_h = jnp.asarray(np.asarray(rw[1]))
sr_h = jnp.asarray(np.asarray(sr))
widx_h = jnp.asarray(np.asarray(pre[0]))
vidx_h = jnp.asarray(np.asarray(pre[1]))
bench("_gather3(host-roundtrip inputs)", lambda: WF._gather3(bw_row_h, lw_row_h, sr_h, widx_h, vidx_h))

# and which input is the culprit?
bench("_gather3(only rows roundtrip)", lambda: WF._gather3(bw_row_h, lw_row_h, sr_h, pre[0], pre[1]))
bench("_gather3(only idx roundtrip)", lambda: WF._gather3(rw[0], rw[1], sr, widx_h, vidx_h))

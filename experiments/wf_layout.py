import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental.layout import Format, Layout, with_layout_constraint
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
T = 16200
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
origin = jnp.asarray(np.asarray(origin), jnp.float32)
rays, c0 = WF._prep(origin, jax.device_put(dirs), tx=120, ty=135, v=rgrid.size_voxels)
c1 = WF._refetch(rgrid.brick_dir, rays, c0, origin, nb=4)
bw_row, lw_row, bw_jump = WF._rows_win(rgrid.bwin, rgrid.lwin, c1.bw_id)
slot_row = WF._rows_slots(rgrid.bricks, c1.slot_content)
widx, vidx = WF._pre(rays, c1, origin, nb=4, bg_side=64)
jax.block_until_ready((bw_row, slot_row, widx))

# inspect layouts
for name, arr in [("bw_row", bw_row), ("slot_row", slot_row), ("widx", widx),
                  ("vidx", vidx), ("rays.dx", rays.dx), ("c1.t", c1.t),
                  ("fresh", jnp.zeros((T,128), jnp.int32))]:
    print(name, arr.format if hasattr(arr, "format") else "?", flush=True)

# relayout helper: constrain to row-major default
rm = Format(Layout((0, 1)))
relay = jax.jit(lambda x: with_layout_constraint(x, rm))
bwr = relay(bw_row); lwr = relay(lw_row); srr = relay(slot_row)
wi = relay(widx); vi = relay(vidx)
jax.block_until_ready((bwr, srr, wi))
def bench(name, fn, *args, iters=10):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)
bench("gather3_relayout_inputs", WF._gather3, bwr, lwr, srr, wi, vi)

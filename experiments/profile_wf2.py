import sys; sys.path.insert(0, "/root/repo")
import time, glob
import numpy as np, jax, jax.numpy as jnp
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

f = lambda: WF.trace_wavefront(rgrid, origin, dirs, width=1920, height=1080, max_rounds=1, inner_steps=2)
r = f(); jax.block_until_ready(r)
print("compiled", flush=True)
t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
print("1rx2s:", round((time.perf_counter()-t0)*1e3,1), "ms", flush=True)

jax.profiler.start_trace("/tmp/wf_trace2")
r = f(); jax.block_until_ready(r)
jax.profiler.stop_trace()
print("files:", glob.glob("/tmp/wf_trace2/**/*.xplane.pb", recursive=True), flush=True)

import time, sys
import jax, jax.numpy as jnp
import numpy as np
z = jnp.zeros((8, 128)); _ = float(z[0, 0])
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
from voxelraytracing_tpu.ops.wavefront3 import build_render_grid3_host, trace_wavefront3
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

W, H = 1920, 1080
wc = 8
perm = noise.make_permutation(7)
grids, cells = demo_chunk_grids_host(perm, np.zeros(3, np.int64), wc, wc*32*0.45, int(wc*32*0.28))
mats = demo_materials()
rg3 = build_render_grid3_host(grids, cells, np.zeros(3, np.int32), wc, mats)
cam = CamData.create((35.0, 45.0, 0.0), (wc*32*0.5, wc*32*0.75, wc*32*0.5), 70.0, (W, H))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(jnp.asarray(dirs))

for rounds in (4, 6, 8, 12, 16):
    r = trace_wavefront3(rg3, origin, cam=cam, rounds=rounds)
    hits = np.asarray(r.hit)
    ssum = int(np.asarray(r.steps).sum())
    N = 5
    t0 = time.perf_counter()
    for _ in range(N):
        r = trace_wavefront3(rg3, origin, cam=cam, rounds=rounds)
    _ = np.asarray(r.t[:1, :1])
    dt = (time.perf_counter() - t0) / N
    mrs = W*H/dt/1e6
    print(f"R={rounds}: {dt*1e3:.1f} ms = {mrs:.1f} Mrays/s, hit={hits.mean():.4f}, steps={ssum/1e6:.1f}M", flush=True)

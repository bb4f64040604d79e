import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops import wavefront as WF
from voxelraytracing_tpu.ops.camera import CamData, generate_rays

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

W = 8
perm = jnp.asarray(noise.make_permutation(7))
grids, cells = demo_chunk_grids(perm, jnp.zeros(3, jnp.int32), W, jnp.float32(W*32*0.45), jnp.int32(int(W*32*0.28)))
mats = demo_materials()
z = np.load("/tmp/rgrid_w8.npz")
rgrid = WF.RenderGrid(bwin=jnp.asarray(z["bwin"]), lwin=jnp.asarray(z["lwin"]),
    brick_dir=jnp.asarray(z["brick_dir"]), bricks=jnp.asarray(z["bricks"]),
    world_min=jnp.asarray(z["world_min"]), to_pack=jnp.asarray(z["to_pack"]),
    n_liquid=jnp.asarray(z["n_liquid"]), size_voxels=int(z["size_voxels"]))
log("loaded")
cam = CamData.create((35., 45., 0.), (128., 190., 128.), 70., (1920, 1080))
origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
dirs = jax.device_put(dirs); jax.block_until_ready(dirs)

# Minimal loop reproducing the tracer's structure: carries like Carry,
# while_loop(cond: rounds) { refetch-ish; fori(12){ step-ish } }
i32, f32 = jnp.int32, jnp.float32
T = (1080//8)*(1920//16)
d = dirs.reshape(1080//8, 8, 1920//16, 16, 3).transpose(0,2,1,3,4).reshape(T, 128, 3)
o = jnp.asarray([128., 190., 128.], f32)
inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0/d, 3e38)
pos_d = (d > 0.0).astype(f32)
nb = 4

mode = sys.argv[1]

def run(n_rounds=8, inner=12):
    def refetch(c):
        t, active, bw_id, sb = c
        if mode in ("full", "refetch"):
            tb = jnp.where(active > 0, t, 3e38)
            bi = jnp.argmin(tb, axis=1)
            lanes = jax.lax.broadcasted_iota(i32, (T,128), 1)
            px = jnp.sum(jnp.where(lanes == bi[:,None], t, 0.), axis=1)
            bw_id = jnp.clip(px.astype(i32) % 64, 0, 63)
            # slot selection
            avail = active > 0
            cb = (t * 7).astype(i32) % 262144
            slots = []
            for _ in range(8):
                ts = jnp.where(avail, t, 3e38)
                si = jnp.argmin(ts, axis=1)
                bid = jnp.sum(jnp.where(lanes == si[:,None], cb, 0), axis=1)
                slots.append(bid)
                avail = avail & (cb != bid[:,None])
            sb = jnp.stack(slots, 1)
        return t, active, bw_id, sb
    def rows_of(c):
        t, active, bw_id, sb = c
        bw_row = rgrid.bwin[jnp.clip(bw_id,0,rgrid.bwin.shape[0]-1)]
        lw_row = rgrid.lwin[jnp.clip(bw_id,0,rgrid.bwin.shape[0]-1)]
        slot_row = rgrid.bricks[jnp.clip(rgrid.brick_dir[jnp.clip(sb,0,rgrid.brick_dir.shape[0]-1)],0,rgrid.bricks.shape[0]-1)].reshape(T,128)
        return bw_row, lw_row, slot_row
    def step(c, bw_row, lw_row, slot_row):
        t, active, bw_id, sb = c
        p = o + d * t[..., None]
        if mode in ("full", "taa", "steponly"):
            b = jnp.floor(p * 0.25).astype(i32)
            lin = (b[...,0]&15) + (b[...,1]&15)*16 + (b[...,2]&15)*256
            word = jnp.take_along_axis(bw_row, (lin>>5).astype(i32), axis=1)
            bit = ((word >> (lin&31).astype(jnp.uint32)) & 1).astype(i32)
        else:
            bit = jnp.zeros((T,128), i32)
        if mode in ("full", "dda", "steponly"):
            cidx = jnp.floor(p / 4.0)
            nxt = (cidx + pos_d) * 4.0
            dt_ax = (nxt - p) * inv_d
            dt = jnp.min(dt_ax, axis=-1)
        else:
            dt = jnp.ones((T,128), f32)
        t = t + dt + bit.astype(f32)*0 + 1e-3
        active = active & (t < 500.0)
        return t, active, bw_id, sb
    def round_body(c):
        c4 = refetch(c[1])
        rows = rows_of(c4)
        c4 = jax.lax.fori_loop(0, inner, lambda i, cc: step(cc, *rows), c4)
        return c[0]+1, c4
    def cond(c):
        return (c[0] < n_rounds) & jnp.any(c[1][1])
    init = (i32(0), (jnp.full((T,128), 1e-3, f32), jnp.ones((T,128), bool),
                     jnp.zeros((T,), i32), jnp.zeros((T,8), i32)))
    return jax.lax.while_loop(cond, round_body, init)

f = jax.jit(run, static_argnames=())
t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
log(f"{mode}: compile+run {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for _ in range(3): r = f()
jax.block_until_ready(r)
log(f"{mode}: {((time.perf_counter()-t0)/3)*1e3:.1f} ms for 8 rounds x 12 steps")

import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
T = 16200
i32 = jnp.int32

# realistic arrays
def fa(lo=0., hi=1.): return jnp.asarray(rng.uniform(lo, hi, (T,128)).astype(np.float32))
t = fa(1, 300); dx, dy, dz = fa(-1,1), fa(-1,1), fa(-1,1)
bw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
lw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
cur_brick = jnp.asarray(rng.integers(0, 262144, (T,128)), i32)
sb8 = jnp.asarray(rng.integers(0, 262144, (T,8)), i32)

@jax.jit
def compute_idx(t, dx, dy, dz, cur_brick, sb8):
    px = 128.0 + dx*t; py = 190.0 + dy*t; pz = 128.0 + dz*t
    bx = jnp.floor(px*0.25).astype(i32); by = jnp.floor(py*0.25).astype(i32); bz = jnp.floor(pz*0.25).astype(i32)
    lin = (bx&15) + (by&15)*16 + (bz&15)*256
    widx = lin >> 5
    shift = (lin & 31).astype(jnp.uint32)
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot |= m
    vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
    vlin = (vx&3) + (vy&3)*4 + (vz&3)*16
    vidx = sidx*16 + (vlin>>2)
    return widx, shift, vidx, vlin, in_slot

@jax.jit
def taa3(bw_row, lw_row, slot_row, widx, vidx):
    w = jnp.take_along_axis(bw_row, widx, axis=1)
    l = jnp.take_along_axis(lw_row, widx, axis=1)
    v = jnp.take_along_axis(slot_row, vidx, axis=1)
    return w, l, v

taa1 = jax.jit(lambda r, i: jnp.take_along_axis(r, i, axis=1))

@jax.jit
def consume(t, w, l, v, shift, vlin):
    descend = ((w >> shift) & 1) != 0
    bliq = ((l >> shift) & 1) != 0
    rid = ((v >> ((vlin & 3).astype(jnp.uint32)*8)) & 0xFF).astype(i32)
    return t + jnp.where(descend | bliq, 0.4, 0.6) + rid.astype(jnp.float32)*0

def one_step_fused_taa3(t):
    widx, shift, vidx, vlin, _ = compute_idx(t, dx, dy, dz, cur_brick, sb8)
    w, l, v = taa3(bw_row, lw_row, slot_row, widx, vidx)
    return consume(t, w, l, v, shift, vlin)

def one_step_taa1(t):
    widx, shift, vidx, vlin, _ = compute_idx(t, dx, dy, dz, cur_brick, sb8)
    w = taa1(bw_row, widx); l = taa1(lw_row, widx); v = taa1(slot_row, vidx)
    return consume(t, w, l, v, shift, vlin)

for name, fn in [("split_taa3", one_step_fused_taa3), ("split_taa1x3", one_step_taa1)]:
    tt = fn(t); jax.block_until_ready(tt)
    t0 = time.perf_counter()
    tt = t
    for _ in range(24):
        tt = fn(tt)
    jax.block_until_ready(tt)
    print(f"{name}: {(time.perf_counter()-t0)/24*1e3:.3f} ms/step", flush=True)

from voxelraytracing_tpu.ops import wavefront as WFX
widx0 = jnp.asarray(rng.integers(0, 128, (T,128)), i32)
vidx0 = jnp.asarray(rng.integers(0, 128, (T,128)), i32)
def bench2(name, fn, *args, iters=16):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)
bench2("local_taa3", taa3, bw_row, lw_row, slot_row, widx0, vidx0)
bench2("module_gather3", WFX._gather3, bw_row, lw_row, slot_row, widx0, vidx0)

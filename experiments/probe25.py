import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
T = 16200
f32, i32 = jnp.float32, jnp.int32

t = jnp.asarray(rng.uniform(1, 300, (T,128)).astype(np.float32))
cur_brick = jnp.asarray(rng.integers(-1, 262144, (T,128)), i32)
sb8 = jnp.asarray(rng.integers(0, 262144, (T,8)), i32)
sb_cols = tuple(jnp.asarray(np.asarray(sb8[:, i]), i32) for i in range(8))
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
px = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))
py = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))
pz = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

case = sys.argv[1]
if case == "mat8":
    @jax.jit
    def f(cur_brick, sb8, slot_row, px, py, pz):
        in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
        for s_i in range(8):
            m = cur_brick == sb8[:, s_i][:, None]
            sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
        vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
        vlin = (vx&3) + (vy&3)*4 + (vz&3)*16
        vword = taa(slot_row, sidx*16 + (vlin>>2))
        return vword, in_slot
    args = (cur_brick, sb8, slot_row, px, py, pz)
elif case == "cols":
    @jax.jit
    def f(cur_brick, slot_row, px, py, pz, *cols):
        in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
        for s_i in range(8):
            m = cur_brick == cols[s_i][:, None]
            sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
        vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
        vlin = (vx&3) + (vy&3)*4 + (vz&3)*16
        vword = taa(slot_row, sidx*16 + (vlin>>2))
        return vword, in_slot
    args = (cur_brick, slot_row, px, py, pz) + sb_cols
r = f(*args); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(8): r = f(*args)
jax.block_until_ready(r)
print(f"{case}: {(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)

import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
T = 16200
i32 = jnp.int32
cur_brick = jnp.asarray(rng.integers(-1, 262144, (T,128)), i32)
sb8 = jnp.asarray(rng.integers(0, 262144, (T,8)), i32)
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
idx_direct = jnp.asarray(rng.integers(0, 128, (T,128)), i32)
px = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

def bench(name, f, *args):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(8): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)

@jax.jit
def match_only(cur_brick, sb8):
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
    return sidx, in_slot
bench("match_only", match_only, cur_brick, sb8)

@jax.jit
def taa_direct(slot_row, idx_direct):
    return taa(slot_row, idx_direct)
bench("taa_direct_idx", taa_direct, slot_row, idx_direct)

@jax.jit
def taa_derived(slot_row, cur_brick, sb8, px):
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
    vx = jnp.floor(px).astype(i32)
    vlin = (vx & 3) * 16
    return taa(slot_row, sidx*16 + (vlin >> 2)), in_slot
bench("taa_sidx_derived", taa_derived, slot_row, cur_brick, sb8, px)

@jax.jit
def taa_sidx_simple(slot_row, cur_brick, sb8):
    sidx = (cur_brick & 7)
    return taa(slot_row, sidx*16)
bench("taa_sidx_simple", taa_sidx_simple, slot_row, cur_brick, sb8)

py = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))
pz = jnp.asarray(rng.uniform(0, 256, (T,128)).astype(np.float32))

@jax.jit
def taa_derived3(slot_row, cur_brick, sb8, px, py, pz):
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
    vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
    vlin = (vx & 3) + (vy & 3) * 4 + (vz & 3) * 16
    return taa(slot_row, sidx*16 + (vlin >> 2)), in_slot
bench("taa_derived3", taa_derived3, slot_row, cur_brick, sb8, px, py, pz)

@jax.jit
def taa_derived2(slot_row, cur_brick, sb8, px, py):
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
    vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32)
    vlin = (vx & 3) + (vy & 3) * 4
    return taa(slot_row, sidx*16 + (vlin >> 2)), in_slot
bench("taa_derived2", taa_derived2, slot_row, cur_brick, sb8, px, py)

@jax.jit
def taa_derived3b(slot_row, cur_brick, sb8, px, py, pz):
    # barrier the idx AFTER full derivation, as a separate materialized array
    in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
    for s_i in range(8):
        m = cur_brick == sb8[:, s_i][:, None]
        sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
    vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
    vlin = (vx & 3) + (vy & 3) * 4 + (vz & 3) * 16
    idx = jax.lax.optimization_barrier(sidx*16 + (vlin >> 2))
    return taa(slot_row, idx), in_slot
bench("taa_derived3_extra_barrier", taa_derived3b, slot_row, cur_brick, sb8, px, py, pz)

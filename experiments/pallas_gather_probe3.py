"""Probe 3: size the wavefront-tracer primitives at realistic shapes."""
import time
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

def probe(name, fn, n, unit="lookups"):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20): out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1e3:.3f} ms -> {n/dt/1e6:.1f} M {unit}/s")

M_TILES = 16384  # 2M rays / 128 rays-per-tile

# 1. taa tile shape [16384,128] int32 (phase-B window word lookup)
for W in (128, 256, 512):
    src = jnp.asarray(rng.integers(0, 2**31, (M_TILES, W)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, W, (M_TILES, 128)), jnp.int32)
    probe(f"taa_[16k,{W}]->128", jax.jit(lambda s=src, i=idx: jnp.take_along_axis(s, i, axis=1)), M_TILES*128)

# 2. dtype: int8 and uint16 tables at width 128
for dt_ in ("int8", "int32", "uint16"):
    src = jnp.asarray(rng.integers(0, 100, (M_TILES, 128)), dt_)
    idx = jnp.asarray(rng.integers(0, 128, (M_TILES, 128)), jnp.int32)
    probe(f"taa_128_{dt_}", jax.jit(lambda s=src, i=idx: jnp.take_along_axis(s, i, axis=1)), M_TILES*128)

# 3. idx width 1 and 8 (per-ray brick content lookup shape [2M, 64] idx [2M, 1])
src = jnp.asarray(rng.integers(0, 100, (2**21, 64)), jnp.int32)
idx1 = jnp.asarray(rng.integers(0, 64, (2**21, 1)), jnp.int32)
probe("taa_[2M,64]->1", jax.jit(lambda: jnp.take_along_axis(src, idx1, axis=1)), 2**21)

# 4. row gathers
srcR = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
idxR = jnp.asarray(rng.integers(0, 4096, (M_TILES,)), jnp.int32)
probe("rowgather_[4096,128]x16k", jax.jit(lambda: srcR[idxR]), M_TILES, "rows")
srcR2 = jnp.asarray(rng.integers(0, 100, (2**19, 128)), jnp.uint16)
idxR2 = jnp.asarray(rng.integers(0, 2**19, (2**21,)), jnp.int32)
probe("rowgather_[512K,128]u16x2M", jax.jit(lambda: srcR2[idxR2]), 2**21, "rows")
srcR3 = jnp.asarray(rng.integers(0, 100, (2**18, 64)), jnp.uint16)
idxR3 = jnp.asarray(rng.integers(0, 2**18, (2**21,)), jnp.int32)
probe("rowgather_[256K,64]u16x2M", jax.jit(lambda: srcR3[idxR3]), 2**21, "rows")

# 5. VPU loop cost: 30 iters of ~35 elementwise ops on [16k,128] f32 x3 state
a = jnp.asarray(rng.random((M_TILES,128)), jnp.float32)
@jax.jit
def vpu_loop(a):
    def body(i, s):
        x, y, z = s
        for _ in range(5):
            x = jnp.minimum(x * 1.0001 + y, z)
            y = jnp.where(x > y, y + 0.5, y * 0.999)
            z = z + jnp.abs(x - y) * 0.01
        return (x, y, z)
    x, y, z = jax.lax.fori_loop(0, 30, body, (a, a+1, a+2))
    return x + y + z
probe("vpu_30x~35ops_[16k,128]", lambda: vpu_loop(a), M_TILES*128*30, "ray-steps")

# 6. taa inside a fori_loop (30 iters) — the real inner loop shape
srcL = jnp.asarray(rng.integers(0, 2**31, (M_TILES, 128)), jnp.int32)
@jax.jit
def taa_loop(src, idx0):
    def body(i, idx):
        w = jnp.take_along_axis(src, idx & 127, axis=1)
        return (idx + (w & 7) + 1)
    return jax.lax.fori_loop(0, 30, body, idx0)
idx0 = jnp.asarray(rng.integers(0, 128, (M_TILES, 128)), jnp.int32)
probe("taa_loop30_[16k,128]", lambda: taa_loop(srcL, idx0), M_TILES*128*30, "step-lookups")

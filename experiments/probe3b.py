import time, sys
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
def probe(name, fn, n, unit="lookups", iters=10):
    t_c0 = time.perf_counter()
    out = fn(); jax.block_until_ready(out)
    t_c = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms (compile {t_c:.1f}s) -> {n/dt/1e6:.1f} M {unit}/s", flush=True)

M_TILES = 16384
case = sys.argv[1]
if case == "taa128":
    src = jnp.asarray(rng.integers(0, 2**31, (M_TILES, 128)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 128, (M_TILES, 128)), jnp.int32)
    probe("taa_[16k,128]->128", jax.jit(lambda: jnp.take_along_axis(src, idx, axis=1)), M_TILES*128)
elif case == "taa256":
    src = jnp.asarray(rng.integers(0, 2**31, (M_TILES, 256)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 256, (M_TILES, 128)), jnp.int32)
    probe("taa_[16k,256]->128", jax.jit(lambda: jnp.take_along_axis(src, idx, axis=1)), M_TILES*128)
elif case == "taa1":
    src = jnp.asarray(rng.integers(0, 100, (2**21, 64)), jnp.int32)
    idx1 = jnp.asarray(rng.integers(0, 64, (2**21, 1)), jnp.int32)
    probe("taa_[2M,64]->1", jax.jit(lambda: jnp.take_along_axis(src, idx1, axis=1)), 2**21)
elif case == "rowg":
    srcR = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
    idxR = jnp.asarray(rng.integers(0, 4096, (M_TILES,)), jnp.int32)
    probe("rowgather_[4096,128]x16k", jax.jit(lambda: srcR[idxR]), M_TILES, "rows")
    srcR3 = jnp.asarray(rng.integers(0, 100, (2**18, 64)), jnp.int32)
    idxR3 = jnp.asarray(rng.integers(0, 2**18, (2**21,)), jnp.int32)
    probe("rowgather_[256K,64]i32x2M", jax.jit(lambda: srcR3[idxR3]), 2**21, "rows")
elif case == "taaloop":
    srcL = jnp.asarray(rng.integers(0, 2**31, (M_TILES, 128)), jnp.int32)
    @jax.jit
    def taa_loop(src, idx0):
        def body(i, idx):
            w = jnp.take_along_axis(src, idx & 127, axis=1)
            return (idx + (w & 7) + 1)
        return jax.lax.fori_loop(0, 30, body, idx0)
    idx0 = jnp.asarray(rng.integers(0, 128, (M_TILES, 128)), jnp.int32)
    probe("taa_loop30_[16k,128]", lambda: taa_loop(srcL, idx0), M_TILES*128*30, "step-lookups")

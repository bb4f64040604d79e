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
for W in (128, 256, 512):
    src = jnp.asarray(rng.integers(0, 2**31, (M_TILES, W)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, W, (M_TILES, 128)), jnp.int32)
    probe(f"taa_[16k,{W}]->128", jax.jit(lambda s=src, i=idx: jnp.take_along_axis(s, i, axis=1)), M_TILES*128)
src = jnp.asarray(rng.integers(0, 100, (2**21, 64)), jnp.int32)
idx1 = jnp.asarray(rng.integers(0, 64, (2**21, 1)), jnp.int32)
probe("taa_[2M,64]->1", jax.jit(lambda: jnp.take_along_axis(src, idx1, axis=1)), 2**21)

import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
T, nrows = 16384, 64
table = jnp.asarray(rng.integers(0, 2**31, (nrows, 128)), jnp.uint32)
ids0 = jnp.asarray(rng.integers(0, nrows, (T,)), jnp.int32)
dx = jnp.asarray(rng.random((T,128)).astype(np.float32) - 0.5)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32) * 100)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

def make(R):
    @jax.jit
    def run(table, dx, t0_, ids0):
        def round_body(c):
            r, t, ids = c
            rows = table[jnp.clip(ids, 0, nrows-1)]
            def body(i, t):
                lin = jnp.floor(dx * t * 0.25).astype(jnp.int32) & 4095
                w = taa(rows, lin >> 5)
                bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
                return t + 0.5 + bit * 0.01
            t = jax.lax.fori_loop(0, 12, body, t)
            return r+1, t, (ids+1) % nrows
        return jax.lax.while_loop(lambda c: c[0] < R, round_body, (jnp.int32(0), t0_, ids0))
    return run

for R in (8, 80):
    f = make(R)
    r = f(table, dx, t00, ids0); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3): r = f(table, dx, t00, ids0)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/3
    print(f"rounds={R}: {dt*1e3:.3f} ms -> per step {dt/R/12*1e6:.2f} us; checksum {float(r[1].sum()):.1f}", flush=True)

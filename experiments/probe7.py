import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
def probe(name, fn, iters=3):
    t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
    tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms (compile {tc:.1f}s)", flush=True)

T = 16200
table = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.uint32)
ids0 = jnp.asarray(rng.integers(0, 4096, (T,)), jnp.int32)
idx0 = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)

# src computed inside body via row-gather from invariant table; 8 unrolled taa steps
@jax.jit
def loop(table, ids0, idx0):
    def body(i, c):
        ids, idx = c
        rows = table[ids]              # [T,128] computed in-body
        for _ in range(8):             # unrolled steps on same rows
            w = jnp.take_along_axis(rows, idx & 127, axis=1)
            idx = idx + (w & 7).astype(jnp.int32) + 1
        return (ids + 1) & 4095, idx
    return jax.lax.fori_loop(0, 6, body, (ids0, idx0))
probe("taa_inbody_rows_6x8", lambda: loop(table, ids0, idx0))

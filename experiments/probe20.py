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

def make(n_extra):
    @jax.jit
    def run(table, dx, t0_, ids0, extras):
        def round_body(c):
            r, t, ids, ex = c
            rows = table[jnp.clip(ids, 0, nrows-1)]
            def body(i, st):
                t, ex = st
                lin = jnp.floor(dx * t * 0.25).astype(jnp.int32) & 4095
                w = taa(rows, lin >> 5)
                bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
                t = t + 0.5 + bit * 0.01
                ex = tuple(e + bit for e in ex)
                return t, ex
            t, ex = jax.lax.fori_loop(0, 12, body, (t, ex))
            return r+1, t, (ids+1) % nrows, ex
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, ids0, extras))
    return run

for n in (0, 2, 4, 6, 8, 12):
    extras = tuple(jnp.zeros((T,128), jnp.float32) for _ in range(n))
    f = make(n)
    t0 = time.perf_counter(); r = f(table, dx, t00, ids0, extras); jax.block_until_ready(r)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3): r = f(table, dx, t00, ids0, extras)
    jax.block_until_ready(r)
    ws = (3 + n) * 8
    print(f"extras={n} (~{ws}MB ws): {(time.perf_counter()-t0)/3*1e3:.2f} ms (compile {tc:.1f}s)", flush=True)

import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
def probe(name, fn, *args, iters=3):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms (compile {tc:.1f}s)", flush=True)

T, nrows = 16384, 64
table = jnp.asarray(rng.integers(0, 2**31, (nrows, 128)), jnp.uint32)
ids0 = jnp.asarray(rng.integers(0, nrows, (T,)), jnp.int32)
dx = jnp.asarray(rng.random((T,128)).astype(np.float32) - 0.5)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32) * 100)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

case = sys.argv[1]

def make(body):
    @jax.jit
    def run(dx, t0_, ids0):
        def round_body(c):
            r, t, ids = c
            rows = table[jnp.clip(ids, 0, nrows-1)]
            t = jax.lax.fori_loop(0, 12, lambda i, t: body(rows, t), t)
            return r+1, t, (ids+1) % nrows
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, ids0))
    return run

if case == "float_fixedshift":
    def body(rows, t):
        px = dx * t
        lin = jnp.floor(px * 0.25).astype(jnp.int32) & 4095
        w = taa(rows, lin >> 5)
        bit = (w & 1).astype(jnp.float32)
        return t + 0.5 + bit * 0.01
elif case == "float_varshift":
    def body(rows, t):
        px = dx * t
        lin = jnp.floor(px * 0.25).astype(jnp.int32) & 4095
        w = taa(rows, lin >> 5)
        bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
        return t + 0.5 + bit * 0.01
elif case == "int_varshift":
    def body(rows, t):
        lin = (t.astype(jnp.int32) * 3) & 4095
        w = taa(rows, lin >> 5)
        bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
        return t + 0.5 + bit * 0.01
elif case == "float_nofloor":
    def body(rows, t):
        lin = (t * 0.25).astype(jnp.int32) & 4095
        w = taa(rows, lin >> 5)
        bit = (w & 1).astype(jnp.float32)
        return t + 0.5 + bit * 0.01
probe(case, make(body), dx, t00, ids0)

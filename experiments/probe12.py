import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
def probe(name, fn, *args, iters=5):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms (compile {tc:.1f}s)", flush=True)

T, nrows = 16384, 64
table = jnp.asarray(rng.integers(0, 2**31, (nrows, 128)), jnp.int32)
ids0 = jnp.asarray(rng.integers(0, nrows, (T,)), jnp.int32)
idx0 = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)
case = sys.argv[1]

def taa(rows, idx):
    return jnp.take_along_axis(rows, idx, axis=1)

if case == "barrier":
    @jax.jit
    def run(table, ids0, idx0):
        def round_body(r, c):
            ids, idx = c
            rows = table[jnp.clip(ids, 0, nrows - 1)]
            def step(i, ix):
                rows_b, ix_b = jax.lax.optimization_barrier((rows, ix))
                w = taa(rows_b, ix_b & 127)
                w = jax.lax.optimization_barrier(w)
                return ix + (w & 7) + 1
            idx = jax.lax.fori_loop(0, 12, step, idx)
            return (ids + 1) % nrows, idx
        return jax.lax.fori_loop(0, 8, round_body, (ids0, idx0))
    probe("barrier_loop_8x12", run, table, ids0, idx0)
elif case == "pysteps":
    step = jax.jit(lambda rows, ix: ix + (taa(rows, ix & 127) & 7) + 1)
    fetch = jax.jit(lambda table, ids: table[jnp.clip(ids, 0, nrows - 1)])
    def run(table, ids, idx):
        for r in range(8):
            rows = fetch(table, ids)
            for i in range(12):
                idx = step(rows, idx)
            ids = (ids + 1) % nrows
        return idx
    probe("python_loop_8x12", run, table, ids0, idx0)

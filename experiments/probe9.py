import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
def probe(name, fn, iters=5):
    t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms (compile {tc:.1f}s)", flush=True)

T = int(sys.argv[1])
nrows = int(sys.argv[2]) if len(sys.argv) > 2 else 64
table = jnp.asarray(rng.integers(0, 2**31, (nrows, 128)), jnp.uint32)
ids0 = jnp.asarray(rng.integers(0, nrows, (T,)), jnp.int32)
idx0 = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)

@jax.jit
def run(ids0, idx0):
    def round_body(c):
        r, ids, idx = c
        rows = table[jnp.clip(ids, 0, nrows-1)]
        def step(i, idx):
            w = jnp.take_along_axis(rows, idx & 127, axis=1)
            return idx + (w & 7).astype(jnp.int32) + 1
        idx = jax.lax.fori_loop(0, 12, step, idx)
        return r+1, (ids+1) % nrows, idx
    return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), ids0, idx0))
probe(f"T={T} rows={nrows}", lambda: run(ids0, idx0))

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
d3 = jnp.asarray(rng.random((T,128,3)).astype(np.float32) - 0.5)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32) * 100)
o = jnp.asarray([128., 190., 128.], jnp.float32)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

case = sys.argv[1]
if case == "vec3":
    @jax.jit
    def run(d, t0_, ids0):
        def round_body(c):
            r, t, ids = c
            rows = table[jnp.clip(ids, 0, nrows-1)]
            def step(i, t):
                p = o + d * t[..., None]
                b = jnp.floor(p * 0.25).astype(jnp.int32)
                lb = b & 15
                lin = lb[...,0] + lb[...,1]*16 + lb[...,2]*256
                w = taa(rows, (lin >> 5))
                bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
                return t + 0.5 + bit * 0.01
            t = jax.lax.fori_loop(0, 12, step, t)
            return r+1, t, (ids+1) % nrows
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, ids0))
    probe("vec3_body", run, d3, t00, ids0)
elif case == "components":
    dx, dy, dz = d3[...,0], d3[...,1], d3[...,2]
    @jax.jit
    def run(dx, dy, dz, t0_, ids0):
        def round_body(c):
            r, t, ids = c
            rows = table[jnp.clip(ids, 0, nrows-1)]
            def step(i, t):
                px = o[0] + dx * t; py = o[1] + dy * t; pz = o[2] + dz * t
                bx = jnp.floor(px * 0.25).astype(jnp.int32) & 15
                by = jnp.floor(py * 0.25).astype(jnp.int32) & 15
                bz = jnp.floor(pz * 0.25).astype(jnp.int32) & 15
                lin = bx + by*16 + bz*256
                w = taa(rows, (lin >> 5))
                bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1).astype(jnp.float32)
                return t + 0.5 + bit * 0.01
            t = jax.lax.fori_loop(0, 12, step, t)
            return r+1, t, (ids+1) % nrows
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, ids0))
    probe("component_body", run, dx, dy, dz, t00, ids0)

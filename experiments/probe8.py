import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
T = 16200
def probe(name, fn, iters=5):
    t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms (compile {tc:.1f}s)", flush=True)

z = np.load("/tmp/rgrid_w8.npz")
bwin = jnp.asarray(z["bwin"])  # [512? rows,128] uint32
d = jnp.asarray(rng.random((T,128,3)).astype(np.float32) - 0.5)
o = jnp.asarray([128., 190., 128.], jnp.float32)
t0_ = jnp.asarray(rng.random((T,128)).astype(np.float32) * 100)
bw_id0 = jnp.asarray(rng.integers(0, bwin.shape[0], (T,)), jnp.int32)

case = sys.argv[1]

@jax.jit
def run(d, t0_, bw_id0):
    def round_body(c):
        r, t, bw_id = c
        rows = bwin[jnp.clip(bw_id, 0, bwin.shape[0]-1)]
        def step(i, t):
            p = o + d * t[..., None]
            b = jnp.floor(p * 0.25).astype(jnp.int32)
            lb = b & 15
            lin = lb[...,0] + lb[...,1]*16 + lb[...,2]*256
            widx = (lin >> 5)
            if case == "taa_derived":
                w = jnp.take_along_axis(rows, widx, axis=1)
                bump = (w & 1).astype(jnp.float32)
            elif case == "taa_carried":
                w = jnp.take_along_axis(rows, (t.astype(jnp.int32)) & 127, axis=1)
                bump = (w & 1).astype(jnp.float32)
            elif case == "no_taa":
                bump = (widx & 1).astype(jnp.float32)
            elif case == "taa_derived_nofloat":
                # widx from int arithmetic on t only (no [.,.,3] involvement)
                widx2 = (t.astype(jnp.int32) * 7 + i) & 127
                w = jnp.take_along_axis(rows, widx2, axis=1)
                bump = (w & 1).astype(jnp.float32)
            return t + 0.5 + bump * 0.01
        t = jax.lax.fori_loop(0, 12, step, t)
        return r+1, t, (bw_id + 1) % bwin.shape[0]
    return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, bw_id0))
probe(case, lambda: run(d, t0_, bw_id0))

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
src = jnp.asarray(rng.integers(0, 2**31, (T,128)), jnp.uint32)
idx0 = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)

# A: src as loop carry (possibly changing layout each iter)
@jax.jit
def loopA(src, idx0):
    def body(i, c):
        s, idx = c
        w = jnp.take_along_axis(s, idx & 127, axis=1)
        return s, idx + (w & 7).astype(jnp.int32) + 1
    return jax.lax.fori_loop(0, 24, body, (src, idx0))
probe("taa_carried_src", lambda: loopA(src, idx0))

# B: carried src that is actually modified each iteration
@jax.jit
def loopB(src, idx0):
    def body(i, c):
        s, idx = c
        w = jnp.take_along_axis(s, idx & 127, axis=1)
        return s ^ 1, idx + (w & 7).astype(jnp.int32) + 1
    return jax.lax.fori_loop(0, 24, body, (src, idx0))
probe("taa_mutating_src", lambda: loopB(src, idx0))

# C: two taas per iter from two carried srcs + where-merge (like step())
src2 = src ^ 7
@jax.jit
def loopC(src, src2, idx0):
    def body(i, c):
        s1, s2, idx = c
        w1 = jnp.take_along_axis(s1, idx & 127, axis=1)
        w2 = jnp.take_along_axis(s2, (idx+3) & 127, axis=1)
        m = (w1 & 1) != 0
        return s1, s2, idx + jnp.where(m, (w2 & 7).astype(jnp.int32), 1)
    return jax.lax.fori_loop(0, 24, body, (src, src2, idx0))
probe("taa_2src_where", lambda: loopC(src, src2, idx0))

# D: taa with f32 DDA math per iter (floor/div/min/argmin-ish)
dirs = jnp.asarray(rng.random((T,128,3)), jnp.float32)
o = jnp.asarray([1.,2.,3.], jnp.float32)
@jax.jit
def loopD(src, t0_):
    inv_d = 1.0/dirs
    pos_d = (dirs>0).astype(jnp.float32)
    def body(i, c):
        s, t = c
        p = o + dirs * t[..., None]
        cidx = jnp.floor(p / 4.0)
        nxt = (cidx + pos_d) * 4.0
        dt_ax = (nxt - p) * inv_d
        dt = jnp.min(dt_ax, axis=-1)
        crossed = dt_ax <= dt[..., None]
        lin = (cidx[...,0].astype(jnp.int32) & 15)
        w = jnp.take_along_axis(s, lin & 127, axis=1)
        return s, t + dt + 1e-3 + (w & 1).astype(jnp.float32)*0
    return jax.lax.fori_loop(0, 24, body, (src, jnp.ones((T,128), jnp.float32)))
probe("taa_plus_dda_math", lambda: loopD(src, None))

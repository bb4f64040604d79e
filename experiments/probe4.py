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
# A: 30-iter loop with uint32 taa (vs int32)
for dt_ in (jnp.int32, jnp.uint32):
    src = jnp.asarray(rng.integers(0, 2**31, (T,128)), dt_)
    idx0 = jnp.asarray(rng.integers(0, 128, (T,128)), jnp.int32)
    @jax.jit
    def loop(src, idx0):
        def body(i, idx):
            w = jnp.take_along_axis(src, idx & 127, axis=1)
            return (idx + w.astype(jnp.int32) % 5 + 1)
        return jax.lax.fori_loop(0, 30, body, idx0)
    probe(f"taa_loop30_{dt_.__name__}", lambda s=src: loop(s, idx0))

# B: row-gather inside loop: 30 iters of bwin[ids] [T rows from 512]
bwin = jnp.asarray(rng.integers(0, 2**31, (512, 128)), jnp.uint32)
ids0 = jnp.asarray(rng.integers(0, 512, (T,)), jnp.int32)
@jax.jit
def loopB(bwin, ids0):
    def body(i, c):
        ids, acc = c
        row = bwin[ids]
        return (ids + 1) % 512, acc + row[:, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, 30, body, (ids0, jnp.zeros(T, jnp.int32)))
probe("rowgather_loop30_[T]from512", lambda: loopB(bwin, ids0))

# C: bricks gather inside loop: [T,8] rows of 16 words from 262144
bricks = jnp.asarray(rng.integers(0, 2**31, (262144, 16)), jnp.uint32)
sb0 = jnp.asarray(rng.integers(0, 262144, (T, 8)), jnp.int32)
@jax.jit
def loopC(bricks, sb0):
    def body(i, c):
        sb, acc = c
        rows = bricks[sb]  # [T,8,16]
        return (sb + 1) % 262144, acc + rows[:, 0, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, 30, body, (sb0, jnp.zeros(T, jnp.int32)))
probe("brickgather_loop30_[T,8]from262k", lambda: loopC(bricks, sb0))

# D: argmin slot selection 8x inside loop
tt = jnp.asarray(rng.random((T, 128)), jnp.float32)
cb = jnp.asarray(rng.integers(0, 262144, (T, 128)), jnp.int32)
@jax.jit
def loopD(tt, cb):
    def body(i, acc):
        avail = tt < 0.9
        out = jnp.zeros((T,), jnp.int32)
        for s in range(8):
            ts = jnp.where(avail, tt, 3e38)
            si = jnp.argmin(ts, axis=1)
            bid = jnp.take_along_axis(cb, si[:, None], axis=1)[:, 0]
            avail = avail & (cb != bid[:, None])
            out = out + bid
        return acc + out
    return jax.lax.fori_loop(0, 30, body, jnp.zeros(T, jnp.int32))
probe("slotselect8_loop30", lambda: loopD(tt, cb))

# E: eq/argmax per step
sb = jnp.asarray(rng.integers(0, 262144, (T, 8)), jnp.int32)
@jax.jit
def loopE(cb, sb):
    def body(i, acc):
        eq = cb[..., None] == sb[:, None, :]
        return acc + jnp.argmax(eq, axis=-1).astype(jnp.int32)
    return jax.lax.fori_loop(0, 30, body, jnp.zeros((T,128), jnp.int32))
probe("eq_argmax_loop30", lambda: loopE(cb, sb))

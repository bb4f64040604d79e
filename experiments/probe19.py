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

T = 16200
dx = jnp.asarray(rng.random((T,128)).astype(np.float32)*2-1)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32)*100 + 1)
act0 = jnp.asarray(rng.random((T,128)) < 0.9)
case = sys.argv[1]

@jax.jit
def run(dx, t0_, act0):
    if case == "bcast_init":
        act0 = jnp.broadcast_to(jnp.any(act0), (T,128))
    def round_body(c):
        r, t, act = c
        def step(i, st):
            t, act = st
            go = act & (dx * t < 1e6)
            t = jnp.where(go, t + 0.5, t)
            act = act & (t < 500.0)
            return t, act
        t, act = jax.lax.fori_loop(0, 12, step, (t, act))
        return r+1, t, act
    if case in ("any_cond", "bcast_init"):
        cond = lambda c: jnp.any(c[2]) & (c[0] < 8)
    else:
        cond = lambda c: c[0] < 8
    return jax.lax.while_loop(cond, round_body, (jnp.int32(0), t0_, act0))
probe(case, run, dx, t00, act0)

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

if case == "bool_carry":
    @jax.jit
    def run(dx, t0_, act0):
        def round_body(c):
            r, t, act = c
            def step(i, st):
                t, act = st
                px = dx * t
                go = act & (px < 1e6)
                t = jnp.where(go, t + 0.5, t)
                act = act & (t < 500.0)
                return t, act
            t, act = jax.lax.fori_loop(0, 12, step, (t, act))
            return r+1, t, act
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, act0))
    probe("bool_carry", run, dx, t00, act0)
elif case == "int_carry":
    @jax.jit
    def run(dx, t0_, act0):
        act0 = act0.astype(jnp.int32)
        def round_body(c):
            r, t, act = c
            def step(i, st):
                t, act = st
                px = dx * t
                go = (act != 0) & (px < 1e6)
                t = jnp.where(go, t + 0.5, t)
                act = act & (t < 500.0).astype(jnp.int32)
                return t, act
            t, act = jax.lax.fori_loop(0, 12, step, (t, act))
            return r+1, t, act
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, act0))
    probe("int_carry", run, dx, t00, act0)
elif case == "refetch_cost":
    # argmin + lane_select x9, once per round, no steps
    lanes = None
    @jax.jit
    def run(dx, t0_, act0):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (T,128), 1)
        def round_body(c):
            r, t = c
            out = jnp.int32(0)
            for _ in range(9):
                si = jnp.argmin(jnp.where(t < 400, t, 3e38), axis=1)
                bid = jnp.sum(jnp.where(lanes == si[:,None], t.astype(jnp.int32), 0), axis=1)
                out = out + bid.sum()
            return r+1, t + out.astype(jnp.float32)*1e-9
        return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_))
    probe("refetch9x_per_round", run, dx, t00, act0)

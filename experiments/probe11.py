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
lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

def lane_gather(rows, idx):
    sel = idx[..., None] == lane_w
    return jnp.sum(jnp.where(sel, rows[:, None, :], 0), axis=-1)

case = sys.argv[1]
if case == "onehot_loop":
    @jax.jit
    def run(table, ids0, idx0):
        def round_body(r, c):
            ids, idx = c
            rows = table[jnp.clip(ids, 0, nrows - 1)]
            def step(i, ix):
                w = lane_gather(rows, ix & 127)
                return ix + (w & 7) + 1
            idx = jax.lax.fori_loop(0, 12, step, idx)
            return (ids + 1) % nrows, idx
        return jax.lax.fori_loop(0, 8, round_body, (ids0, idx0))
    probe("onehot_loop 8x12", run, table, ids0, idx0)
elif case == "taa_single":
    # true standalone taa with explicit args
    f = jax.jit(lambda rows, idx: jnp.take_along_axis(rows, idx, axis=1))
    rows = table[jnp.clip(ids0, 0, nrows - 1)]
    probe("taa_standalone_2M", f, rows, idx0)
elif case == "onehot_single":
    f = jax.jit(lane_gather)
    rows = table[jnp.clip(ids0, 0, nrows - 1)]
    probe("onehot_standalone_2M", f, rows, idx0)
elif case == "rowgather_onehot_mm":
    # window row fetch as one-hot matmul vs gather
    def fetch_mm(table, ids):
        oh = (ids[:, None] == jnp.arange(nrows, dtype=jnp.int32)).astype(jnp.bfloat16)
        lo = (table & 0xFFFF).astype(jnp.bfloat16)  # exactness check elsewhere
        return jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    probe("rowfetch_onehot_mm", jax.jit(fetch_mm), table, ids0)
    probe("rowfetch_gather", jax.jit(lambda t, i: t[i]), table, ids0)

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
NB, NBRICKS = 64, 262144
z = np.load("/tmp/rgrid_w8.npz")
bwin = jnp.asarray(z["bwin"]); lwin = jnp.asarray(z["lwin"])
bricks = jnp.asarray(z["bricks"]); brick_dir = jnp.asarray(z["brick_dir"])
d3 = jnp.asarray(rng.random((T,128,3)).astype(np.float32) - 0.5)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32) * 100)
ids0 = jnp.asarray(rng.integers(0, NB, (T,)), jnp.int32)
sb0 = jnp.asarray(rng.integers(0, NBRICKS, (T,8)), jnp.int32)
o = jnp.asarray([128., 190., 128.], jnp.float32)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))
def rowg(t, i):
    t, i = jax.lax.optimization_barrier((t, i))
    return jax.lax.optimization_barrier(t[i])

case = sys.argv[1]

@jax.jit
def run(bwin, lwin, bricks, brick_dir, d, t0_, ids0, sb0):
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0/d, 3e38)
    pos_d = (d > 0.0).astype(jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (T,128), 1)
    def round_body(c):
        r, t, ids, sb = c
        if case in ("rows", "slots", "argmin", "full"):
            bw_row = rowg(bwin, jnp.clip(ids, 0, NB-1))
            lw_row = rowg(lwin, jnp.clip(ids, 0, NB-1))
        else:
            bw_row = jnp.zeros((T,128), jnp.uint32); lw_row = bw_row
        if case in ("slots", "argmin", "full"):
            content = rowg(brick_dir, jnp.clip(sb, 0, NBRICKS-1))
            rows8 = rowg(bricks, jnp.clip(content, 0, bricks.shape[0]-1))
            slot_row = rows8.reshape(T, 128)
        else:
            slot_row = jnp.zeros((T,128), jnp.uint32)
        if case in ("argmin", "full"):
            # refetch-style argmin + lane_select x8
            avail = t < 1e9
            newsb = []
            for s in range(8):
                ts = jnp.where(avail, t, 3e38)
                si = jnp.argmin(ts, axis=1)
                bid = jnp.sum(jnp.where(lanes == si[:,None], (t*7).astype(jnp.int32), 0), axis=1)
                newsb.append(bid % NBRICKS)
                avail = avail & ((t*7).astype(jnp.int32) % NBRICKS != bid[:,None])
            sb = jnp.stack(newsb, 1)
        def step(i, t):
            p = o + d * t[..., None]
            b = jnp.floor(p * 0.25).astype(jnp.int32)
            lb = b & 15
            lin = lb[...,0] + lb[...,1]*16 + lb[...,2]*256
            w = taa(bw_row, lin >> 5)
            bit = ((w >> (lin & 31).astype(jnp.uint32)) & 1)
            if case == "full":
                lw = taa(lw_row, lin >> 5)
                sw = taa(slot_row, lin & 127)
                bit = bit + (lw & 1) + (sw & 1)
            # dda-ish
            cidx = jnp.floor(p / 4.0)
            dt_ax = ((cidx + pos_d) * 4.0 - p) * inv_d
            dt = jnp.min(jnp.where(jnp.abs(inv_d) >= 3e38, 3e38, dt_ax), axis=-1)
            return t + dt + 1e-3 + bit.astype(jnp.float32)*0
        t = jax.lax.fori_loop(0, 12, step, t)
        return r+1, t, (ids+1) % NB, sb
    return jax.lax.while_loop(lambda c: c[0] < 8, round_body, (jnp.int32(0), t0_, ids0, sb0))
probe(case, run, bwin, lwin, bricks, brick_dir, d3, t00, ids0, sb0)

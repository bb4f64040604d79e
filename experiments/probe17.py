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
NB = 4
BG = 64
z = np.load("/tmp/rgrid_w8.npz")
bwin = jnp.asarray(z["bwin"]); lwin = jnp.asarray(z["lwin"])
bricks = jnp.asarray(z["bricks"]); brick_dir = jnp.asarray(z["brick_dir"])
dx0 = jnp.asarray(rng.random((T,128)).astype(np.float32)*2-1)
dy0 = jnp.asarray(rng.random((T,128)).astype(np.float32)*2-1)
dz0 = jnp.asarray(rng.random((T,128)).astype(np.float32)*2-1)
t00 = jnp.asarray(rng.random((T,128)).astype(np.float32)*100 + 1)
ids0 = jnp.asarray(rng.integers(0, 64, (T,)), jnp.int32)
sb0 = jnp.asarray(rng.integers(0, 262144, (T,8)), jnp.int32)
cb0 = jnp.asarray(rng.integers(0, 262144, (T,128)), jnp.int32)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))
def rowg(t, i):
    t, i = jax.lax.optimization_barrier((t, i))
    return jax.lax.optimization_barrier(t[i])

level = sys.argv[1]
L = ["p15", "brick", "demote", "voxel", "liquid"].index(level)

@jax.jit
def run(bwin, lwin, bricks, brick_dir, dx, dy, dz, t0_, ids0, sb0, cb0):
    i32, f32 = jnp.int32, jnp.float32
    BIG = jnp.float32(3e38)
    def inv(c): return jnp.where(jnp.abs(c) > 1e-12, 1.0/c, BIG)
    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    sxp = (dx > 0).astype(f32); syp = (dy > 0).astype(f32); szp = (dz > 0).astype(f32)
    def dda3(px, py, pz, cell):
        def ax(pc, iv, sg):
            nxt = (jnp.floor(pc / cell) + sg) * cell
            d = (nxt - pc) * iv
            return jnp.where(jnp.abs(iv) >= BIG, BIG, d)
        a, b, c = ax(px, ivx, sxp), ax(py, ivy, syp), ax(pz, ivz, szp)
        dt = jnp.minimum(a, jnp.minimum(b, c))
        return dt, a <= dt, b <= dt, c <= dt
    def round_body(c_):
        r, t, ids, sb, cb, lvl, went, water = c_
        bw_row = rowg(bwin, jnp.clip(ids, 0, 63))
        lw_row = rowg(lwin, jnp.clip(ids, 0, 63))
        content = rowg(brick_dir, jnp.clip(sb, 0, brick_dir.shape[0]-1))
        slot_row = rowg(bricks, jnp.clip(content, 0, bricks.shape[0]-1)).reshape(T, 128)
        bw_jump = jnp.all(bw_row == 0, axis=1)
        def step(i, st):
            t, cb, lvl, went, water = st
            px = 128.0 + dx*t; py = 190.0 + dy*t; pz = 128.0 + dz*t
            active = t < 500.0
            bx = jnp.floor(px*0.25).astype(i32); by = jnp.floor(py*0.25).astype(i32); bz = jnp.floor(pz*0.25).astype(i32)
            fb = bx + by*BG + bz*BG*BG
            if L >= 2:
                lvl = jnp.where(active & (lvl == 1) & (fb != cb), 0, lvl)
            bl = active & (lvl == 0)
            bw_flat = (bx>>4) + (by>>4)*NB + (bz>>4)*NB*NB
            match_b = bl & (bw_flat == ids[:, None] * 0 + ids[:, None])
            lin = (bx & 15) + (by & 15)*16 + (bz & 15)*256
            widx = lin >> 5
            shift = (lin & 31).astype(jnp.uint32)
            word = taa(bw_row, widx)
            descend = ((word >> shift) & 1) != 0
            lword = taa(lw_row, widx)
            brick_liq = ((lword >> shift) & 1) != 0
            to_voxel = match_b & descend
            lvl = jnp.where(to_voxel, 1, lvl)
            cb = jnp.where(to_voxel, fb, cb)
            bstep = match_b & ~descend
            cell = jnp.where(bw_jump[:, None], f32(64.0), f32(4.0))
            dt_b, cbx, cby, cbz = dda3(px, py, pz, cell)
            bump = descend.astype(f32) * 0
            dt, crx = dt_b, cbx
            if L >= 3:
                vl = active & (lvl == 1)
                in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
                for s_i in range(8):
                    m = cb == sb[:, s_i][:, None]
                    sidx = jnp.where(m, i32(s_i), sidx); in_slot |= m
                match_v = vl & in_slot
                vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
                vlin = (vx & 3) + (vy & 3)*4 + (vz & 3)*16
                vword = taa(slot_row, sidx*16 + (vlin >> 2))
                rid = ((vword >> ((vlin & 3).astype(jnp.uint32)*8)) & 0xFF).astype(i32)
                is_air = rid == 0
                is_liq = (rid >= 1) & (rid <= 3)
                vstep = match_v & (is_air | is_liq)
                dt_v, cvx, cvy, cvz = dda3(px, py, pz, f32(1.0))
                dt = jnp.where(bstep, dt_b, dt_v)
                crx = jnp.where(bstep, cbx, cvx)
                if L >= 4:
                    in_w = went >= 0.0
                    samp_liq = (match_v & is_liq) | (bstep & brick_liq)
                    samp_dry = (match_v & ~is_liq) | (bstep & ~brick_liq)
                    leave = in_w & samp_dry
                    water = water + jnp.where(leave, t - went, 0.0)
                    went = jnp.where(leave, -1.0, went)
                    enter = samp_liq & (went < 0.0)
                    went = jnp.where(enter, t, went)
                stepped = bstep | vstep
            else:
                stepped = bstep
            t = jnp.where(stepped, t + dt + 1e-3, t + 0.5)
            return (t, cb, lvl, went, water)
        t, cb, lvl, went, water = jax.lax.fori_loop(0, 12, step, (t, cb, lvl, went, water))
        return r+1, t, (ids+1) % 64, sb, cb, lvl, went, water
    init = (jnp.int32(0), t0_, ids0, sb0, cb0,
            jnp.zeros((T,128), jnp.int32), jnp.full((T,128), -1.0), jnp.zeros((T,128)))
    return jax.lax.while_loop(lambda c: c[0] < 8, round_body, init)

probe(level, run, bwin, lwin, bricks, brick_dir, dx0, dy0, dz0, t00, ids0, sb0, cb0)

import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
rng = np.random.default_rng(0)
T = 16200
f32, i32 = jnp.float32, jnp.int32
BIG = jnp.float32(3e38)

def mk(shape, lo, hi, dt=np.float32):
    return jnp.asarray(rng.uniform(lo, hi, shape).astype(dt))

dx, dy, dz = (mk((T,128), -1, 1) for _ in range(3))
t = mk((T,128), 1, 300)
texit = mk((T,128), 100, 400)
bw_id = jnp.asarray(rng.integers(0, 64, (T,)), i32)
cur_brick = jnp.asarray(rng.integers(-1, 262144, (T,128)), i32)
level = jnp.asarray(rng.integers(0, 2, (T,128)), i32)
active = jnp.asarray(rng.random((T,128)) < 0.8)
sb = jnp.asarray(rng.integers(0, 262144, (T,8)), i32)
bw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
lw_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
slot_row = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
bw_jump = jnp.asarray(rng.random((T,)) < 0.3)
wenter = mk((T,128), -1, 10)
water = jnp.zeros((T,128), f32)

def taa(rows, idx):
    rows, idx = jax.lax.optimization_barrier((rows, idx))
    return jax.lax.optimization_barrier(jnp.take_along_axis(rows, idx, axis=1))

ivx = jnp.where(jnp.abs(dx) > 1e-12, 1.0/dx, BIG)
ivy = jnp.where(jnp.abs(dy) > 1e-12, 1.0/dy, BIG)
ivz = jnp.where(jnp.abs(dz) > 1e-12, 1.0/dz, BIG)
sxp, syp, szp = (dx>0).astype(f32), (dy>0).astype(f32), (dz>0).astype(f32)

LVL = ["a","b","c","d","e","f"].index(__import__("sys").argv[1])

@jax.jit
def step(t, active, level, cur_brick, wenter, water, bw_id, sb,
         bw_row, lw_row, slot_row, bw_jump,
         dx, dy, dz, ivx, ivy, ivz, sxp, syp, szp, texit):
    px = 128.0 + dx*t; py = 190.0 + dy*t; pz = 128.0 + dz*t
    act = active & ~(active & (t >= texit))
    bx = jnp.floor(px*0.25).astype(i32); by = jnp.floor(py*0.25).astype(i32); bz = jnp.floor(pz*0.25).astype(i32)
    fb = bx + by*64 + bz*64*64
    lvl = jnp.where(act & (level==1) & (fb != cur_brick), 0, level)
    out = fb
    if LVL >= 1:
        bl = act & (lvl == 0)
        bw_flat = (bx>>4) + (by>>4)*4 + (bz>>4)*16
        match_b = bl & (bw_flat == bw_id[:, None])
        lin = (bx&15) + (by&15)*16 + (bz&15)*256
        widx = lin >> 5
        shift = (lin & 31).astype(jnp.uint32)
        word = taa(bw_row, widx)
        descend = ((word >> shift) & 1) != 0
        lword = taa(lw_row, widx)
        brick_liq = ((lword >> shift) & 1) != 0
        to_voxel = match_b & descend
        lvl = jnp.where(to_voxel, 1, lvl)
        cb = jnp.where(to_voxel, fb, cur_brick)
        bstep = match_b & ~descend
        out = out + word.astype(i32)
    if LVL >= 2:
        cell = jnp.where(bw_jump[:, None], f32(64.0), f32(4.0))
        def dda(cl):
            def ax(pc, iv, sg):
                nxt = (jnp.floor(pc/cl) + sg) * cl
                d_ = (nxt - pc) * iv
                return jnp.where(jnp.abs(iv) >= BIG, BIG, d_)
            a_, b_, c_ = ax(px,ivx,sxp), ax(py,ivy,syp), ax(pz,ivz,szp)
            dt_ = jnp.minimum(a_, jnp.minimum(b_, c_))
            return dt_, a_<=dt_, b_<=dt_, c_<=dt_
        dt_b, cbx, cby, cbz = dda(cell)
        out = out + dt_b.astype(i32)
    if LVL >= 3:
        vl = act & (lvl == 1)
        in_slot = jnp.zeros((T,128), bool); sidx = jnp.zeros((T,128), i32)
        for s_i in range(8):
            m = cb == sb[:, s_i][:, None]
            sidx = jnp.where(m, i32(s_i), sidx); in_slot = in_slot | m
        match_v = vl & in_slot
        vx = jnp.floor(px).astype(i32); vy = jnp.floor(py).astype(i32); vz = jnp.floor(pz).astype(i32)
        vlin = (vx&3) + (vy&3)*4 + (vz&3)*16
        vword = taa(slot_row, sidx*16 + (vlin>>2))
        rid = ((vword >> ((vlin&3).astype(jnp.uint32)*8)) & 0xFF).astype(i32)
        is_air = rid == 0
        is_liq = (rid >= 1) & (rid <= 3)
        solid = match_v & ~is_air & ~is_liq
        out = out + rid
    if LVL >= 4:
        in_w = wenter >= 0.0
        samp_liq = (match_v & is_liq) | (bstep & brick_liq)
        samp_dry = (match_v & ~is_liq) | (bstep & ~brick_liq)
        leave = in_w & samp_dry
        water2 = water + jnp.where(leave, t - wenter, 0.0)
        we = jnp.where(leave, -1.0, wenter)
        enter = samp_liq & (we < 0.0)
        we = jnp.where(enter, t, we)
        out = out + water2.astype(i32) + we.astype(i32)
    if LVL >= 5:
        vstep = match_v & (is_air | is_liq)
        dt_v, cvx, cvy, cvz = dda(f32(1.0))
        stepped = bstep | vstep
        dt_ = jnp.where(bstep, dt_b, dt_v)
        crx = jnp.where(bstep, cbx, cvx)
        cry = jnp.where(bstep, cby, cvy)
        crz = jnp.where(bstep, cbz, cvz)
        t2 = jnp.where(stepped, t + dt_ + 1e-3, t)
        axbits = crx.astype(i32) | (cry.astype(i32)<<1) | (crz.astype(i32)<<2)
        out = out + t2.astype(i32) + axbits
    return out

args = (t, active, level, cur_brick, wenter, water, bw_id, sb, bw_row, lw_row, slot_row, bw_jump,
        dx, dy, dz, ivx, ivy, ivz, sxp, syp, szp, texit)
r = step(*args); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(8): r = step(*args)
jax.block_until_ready(r)
print(f"level {__import__('sys').argv[1]}: {(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)

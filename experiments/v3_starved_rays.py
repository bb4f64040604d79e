"""Diagnose rays still active after a 14-round 1080p frame: where are
they, what do they want, and is it cached? (readback probe, not timing)"""
import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

W, H = 1920, 1080
wc = 8
perm = noise.make_permutation(7)
grids, cells = demo_chunk_grids_host(
    perm, np.zeros(3, np.int64), wc, wc * 32 * 0.45, int(wc * 32 * 0.28))
mats = demo_materials()
rg = w3.build_render_grid3_host(grids, cells, np.zeros(3, np.int32), wc, mats)
cam = CamData.create((35.0, 45.0, 0.0),
                     (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5),
                     70.0, (W, H))
origin = jnp.asarray(cam.pos, jnp.float32)

args = (rg.gw_jump, rg.gw_liq, rg.wmeta, rg.sw_meta, rg.sw_solid, rg.sw_liq,
        rg.sw_pid, rg.brick_dir, rg.bricks, rg.to_pack)
z = jnp.zeros((), jnp.float32)
zi = jnp.zeros((), jnp.int32)

R = 14
out = w3._trace_frame(
    *args, origin,
    jnp.asarray(cam.inv_view, jnp.float32),
    jnp.asarray(cam.inv_proj, jnp.float32),
    z, z, z, zi, zi, zi,
    width=W, height=H, rounds=R, sub_rounds=6, sub_steps=8,
    v=int(rg.size_voxels), interpret=False, per_ray=False, raw_out=True,
    warm=False, return_cache=True)
ts, fl, wa, we, cache = out
ts = np.asarray(ts)
fl = np.asarray(fl)
wc_ids = np.asarray(cache[0])
sc_ids = np.asarray(cache[1])

act = (fl & 1) != 0
idx = np.argwhere(act)
print(f"active rays: {len(idx)}")

# host replica of _ray_dirs
scal = np.asarray(w3._cam_scal(
    origin, jnp.asarray(cam.inv_view, jnp.float32),
    jnp.asarray(cam.inv_proj, jnp.float32), float(rg.size_voxels),
    W, H, 0.0))
tx = -(-W // w3.TILE_W)
ty = -(-H // w3.TILE_H)
nsx, nsy, T2 = w3._sb_dims(tx, ty)
v = float(rg.size_voxels)
nw = int(v) // w3.WIN
ns = int(v) // w3.SW

gw_jump = np.asarray(rg.gw_jump)
wmeta = np.asarray(rg.wmeta)


scal = scal.astype(np.float32)


def ray_dir(tg, lane):
    sb = tg // w3._BLK
    l = tg - sb * w3._BLK
    txi = float((sb % nsx) * w3.SB_W + l % w3.SB_W)
    tyi = float((sb // nsx) * w3.SB_H + l // w3.SB_W)
    px = txi * w3.TILE_W + lane % w3.TILE_W
    py = tyi * w3.TILE_H + lane // w3.TILE_W + scal[21]
    x = px * scal[4] - 1.0
    y = py * scal[5] - 1.0
    ex = x * scal[6] - y * scal[7] + scal[8]
    ey = x * scal[9] - y * scal[10] + scal[11]
    dx = ex * scal[12] + ey * scal[15] - scal[18]
    dy = ex * scal[13] + ey * scal[16] - scal[19]
    dz = ex * scal[14] + ey * scal[17] - scal[20]
    n = np.float32(np.sqrt(dx * dx + dy * dy + dz * dz))
    return np.float32(dx) / n, np.float32(dy) / n, np.float32(dz) / n


o = np.asarray(origin).astype(np.float32)
for (tg, lane) in idx[:40]:
    t = np.float32(ts[tg, lane])
    f = fl[tg, lane]
    stp = (f >> w3._FL_STP) & 0xFFF
    d = ray_dir(int(tg), int(lane))
    p = o + np.asarray(d, np.float32) * t
    vx, vy, vz = np.floor(p).astype(np.int64)
    wid = (vx >> 6) + (vy >> 6) * nw + (vz >> 6) * nw * nw
    gwf = gw_jump.reshape(-1)
    gj = (int(gwf[wid >> 5]) >> (wid & 31)) & 1 if 0 <= wid < nw**3 else -1
    sid = (vx >> 4) + (vy >> 4) * ns + (vz >> 4) * ns * ns
    blk = int(tg) // w3._BLK
    in_wc = wid in wc_ids[blk]
    in_sc = sid in sc_ids[blk]
    # subwindow-skip bit from the window meta (is this sw uniform?)
    s_loc = ((vx >> 4) & 3) + ((vy >> 4) & 3) * 4 + ((vz >> 4) & 3) * 16
    swj = (int(wmeta[wid][s_loc >> 5]) >> (s_loc & 31)) & 1 \
        if 0 <= wid < nw**3 else -1
    print(f"tg={int(tg):5d} ln={int(lane):3d} blk={blk:3d} t={t:9.3f} "
          f"stp={int(stp):4d} p=({p[0]:9.4f},{p[1]:9.4f},{p[2]:9.4f}) "
          f"d=({d[0]:+.4f},{d[1]:+.4f},{d[2]:+.4f}) w={int(wid):4d} "
          f"gj={int(gj)} swj={int(swj)} s={int(sid):5d} "
          f"wc={in_wc} sc={in_sc}")
print("wc_ids of affected blocks:")
for blk in sorted({int(tg) // w3._BLK for tg, _ in idx[:40]}):
    print(f"  blk {blk}: wc={wc_ids[blk]} sc={sc_ids[blk]}")

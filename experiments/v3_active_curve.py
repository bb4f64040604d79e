"""Per-round active-ray/tile/block curve at 1080p (readback process — not
for timing). Shows what the early-exit loop is waiting for."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

W, H = 1920, 1080
wc = 8
warm = len(sys.argv) > 1 and sys.argv[1] == "warm"
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

cache = None
if warm:
    # build the replay token from a full cold frame first
    r = w3.trace_wavefront3(rg, origin, cam=cam, rounds=16,
                            resolve_ids="none", return_cache=True)
    _, cache = r
    print("# warm token built", flush=True)

for R in (1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16):
    tr = w3.trace_wavefront3(rg, origin, cam=cam, rounds=R,
                             resolve_ids="none", cache=cache)
    # re-derive active from steps/hit is lossy; use the raw flags instead
    wc0, sc0, h0, warm_f = w3._cache_args(cache, W, H)
    ts, fl, wa, we = w3._trace_frame(
        *args, origin,
        jnp.asarray(cam.inv_view, jnp.float32),
        jnp.asarray(cam.inv_proj, jnp.float32),
        z, z, z, wc0, sc0, h0,
        width=W, height=H, rounds=R, sub_rounds=6, sub_steps=8,
        v=int(rg.size_voxels), interpret=False, per_ray=False, raw_out=True,
        warm=warm_f)
    flh = np.asarray(fl)
    act = (flh & 1) != 0
    n_rays = int(act.sum())
    n_tiles = int(act.any(axis=1).sum())
    blocks = act.reshape(-1, w3._BLK, 128).any(axis=(1, 2))
    n_blocks = int(blocks.sum())
    hit = int(((flh >> 1) & 1).sum())
    st = (flh >> w3._FL_STP) & 0xFFF
    print(f"R={R:2d}: active rays={n_rays:8d} tiles={n_tiles:5d} "
          f"blocks={n_blocks:3d} hits={hit:7d} maxsteps={int(st.max()):4d}",
          flush=True)

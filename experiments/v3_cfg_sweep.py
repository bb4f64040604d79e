"""Sweep v3 tracer block/cache geometry: _BLK, SB_W/SB_H, N_SC, _S_INS.

Usage: v3_cfg_sweep.py BLK SBW SBH NSC SINS [rounds...]
Module constants are monkeypatched before the first trace (they are read
at trace time); run each config in its own process.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import wavefront3 as w3
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

BLK, SBW, SBH, NSC, SINS = (int(a) for a in sys.argv[1:6])
rounds_list = [int(a) for a in sys.argv[6:]] or [6, 8, 12, 16]
assert SBW * SBH == BLK
w3._BLK = BLK
w3.SB_W = SBW
w3.SB_H = SBH
w3.N_SC = NSC
w3._S_INS = SINS

W, H = 1920, 1080
wc = 8
perm = noise.make_permutation(7)
grids, cells = demo_chunk_grids_host(
    perm, np.zeros(3, np.int64), wc, wc * 32 * 0.45, int(wc * 32 * 0.28))
mats = demo_materials()
rg3 = w3.build_render_grid3_host(
    grids, cells, np.zeros(3, np.int32), wc, mats)
cam = CamData.create(
    (35.0, 45.0, 0.0), (wc * 32 * 0.5, wc * 32 * 0.75, wc * 32 * 0.5),
    70.0, (W, H))
origin = jnp.asarray(cam.pos, jnp.float32)

for rounds in rounds_list:
    r = w3.trace_wavefront3(rg3, origin, cam=cam, rounds=rounds)
    hits = np.asarray(r.hit)
    ssum = int(np.asarray(r.steps).sum())
    N = 5
    t0 = time.perf_counter()
    for _ in range(N):
        r = w3.trace_wavefront3(rg3, origin, cam=cam, rounds=rounds)
    _ = np.asarray(r.t[:1, :1])
    dt = (time.perf_counter() - t0) / N
    print(f"BLK={BLK} SB={SBW}x{SBH} NSC={NSC} SINS={SINS} R={rounds}: "
          f"{dt*1e3:.1f} ms = {W*H/dt/1e6:.1f} Mrays/s, "
          f"hit={hits.mean():.4f}, steps={ssum/1e6:.1f}M", flush=True)

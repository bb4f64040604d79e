"""Break the v3 frame time into (a) Pallas march kernel, (b) XLA staging
(cache service gathers), (c) round count, at 1080p on the demo world.

Methodology: time three jitted programs over the same inputs —
  full   : N rounds of (staging + march)            [the real frame]
  kmarch : N rounds of march only (static cache)    [kernel share]
  staged : N rounds of staging only (no march; want rows recycled)
All with early-exit disabled (fori_loop over rounds) so N is exact.
"""
import time
from functools import partial

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

tx, ty = W // w3.TILE_W, H // w3.TILE_H
n_tiles = tx * ty
T = -(-n_tiles // w3._BLK) * w3._BLK
nB = T // w3._BLK
ns = rg.sw_solid.shape[0]
ns = int(round(ns ** (1 / 3)))
nw = ns // 4
v = int(rg.size_voxels)
print(f"tiles={n_tiles} T={T} blocks={nB} ns={ns} nw={nw} v={v}", flush=True)


def timeit(name, f, *args, n=6):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms  ({W*H/dt/1e6:6.1f} Mrays/s-equiv)",
          flush=True)
    return dt


# --- full frame at various budgets (early exit active) ---
for R, spr in ((8, 48), (12, 48), (16, 48), (12, 24), (12, 96)):
    f = partial(w3.trace_wavefront3, rg, origin, cam=cam, rounds=R,
                steps_per_round=spr, resolve_ids="none")
    r = f()
    hits = float(np.asarray(r.hit).mean())
    timeit(f"full R={R:2d} spr={spr:3d} hit={hits:.4f}", f)


# --- staging-only: N rounds of cache service on synthetic want rows ---
@partial(jax.jit, static_argnames=("rounds",))
def staged(want_w, want_s, wmeta, sw_meta, sw_solid, sw_liq, sw_pid,
           *, rounds):
    i32 = jnp.int32
    lane16 = jax.lax.broadcasted_iota(i32, (nB, w3.N_WC), 1)
    lane128 = jax.lax.broadcasted_iota(i32, (nB, 128), 1)
    c = dict(
        wc_ids=jnp.full((nB, w3.N_WC), -1, i32),
        wc_meta=jnp.zeros((nB, 128), jnp.uint32),
        sc_ids=jnp.full((nB, w3.N_SC), -1, i32),
        sc_meta=jnp.zeros((nB, 128), jnp.uint32),
        sc_solid=jnp.zeros((nB, w3.N_SC, 128), jnp.uint32),
        sc_liq=jnp.zeros((nB, w3.N_SC, 128), jnp.uint32),
        sc_pid=jnp.zeros((nB, w3.N_SC, 4, 128), jnp.uint32),
        want=jnp.concatenate(
            [want_s, want_w, jnp.full((T, 3), -1, i32)], axis=1),
    )

    def body(r, c):
        # replicate _trace_frame's per-round service (no march)
        bigi = jnp.int32(w3._BIGI)
        pool = c["want"][:, 4].reshape(nB, w3._BLK)
        cached = (pool[:, :, None] == c["wc_ids"][:, None, :]).any(axis=2)
        pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
        wc_ids, wc_meta = c["wc_ids"], c["wc_meta"]
        for j in range(w3._W_INS):
            pick = jnp.min(pool, axis=1)
            ok = pick < bigi
            pool = jnp.where(pool == pick[:, None], bigi, pool)
            slot = (r * w3._W_INS + j) % (w3.N_WC - 1) + 1
            sel = (lane16 == slot) & ok[:, None]
            wc_ids = jnp.where(sel, pick[:, None], wc_ids)
            metaw = wmeta[jnp.clip(pick, 0, wmeta.shape[0] - 1)]
            spread = jnp.take_along_axis(
                metaw, jnp.clip(lane128 & 7, 0, 7), axis=1)
            msel = (lane128 >> 3) == slot
            wc_meta = jnp.where(msel & ok[:, None], spread, wc_meta)

        pool = c["want"][:, :4].reshape(nB, w3._BLK * 4)
        cached = (pool[:, :, None] == c["sc_ids"][:, None, :]).any(axis=2)
        pool = jnp.where((pool >= 0) & ~cached, pool, bigi)
        seg = pool.reshape(nB, w3._S_INS, (w3._BLK * 4) // w3._S_INS)
        picks = jnp.min(seg, axis=2)
        ok = picks < bigi
        safe = jnp.clip(picks, 0, sw_solid.shape[0] - 1)
        new_ids = jnp.where(ok, picks, -1)
        new_sol = jnp.where(ok[..., None], sw_solid[safe], jnp.uint32(0))
        new_liq = jnp.where(ok[..., None], sw_liq[safe], jnp.uint32(0))
        new_pid = jnp.where(ok[..., None, None], sw_pid[safe], jnp.uint32(0))
        lo = (r % 2) == 0

        def half(old, new):
            return jnp.where(
                lo,
                jnp.concatenate([new, old[:, w3._S_INS:]], axis=1),
                jnp.concatenate([old[:, :w3._S_INS], new], axis=1))

        c = dict(c)
        c.update(wc_ids=wc_ids, wc_meta=wc_meta,
                 sc_ids=half(c["sc_ids"], new_ids),
                 sc_solid=half(c["sc_solid"], new_sol),
                 sc_liq=half(c["sc_liq"], new_liq),
                 sc_pid=half(c["sc_pid"], new_pid))
        return c

    c = jax.lax.fori_loop(0, rounds, body, c)
    return c["sc_solid"]


rng = np.random.default_rng(0)
want_s = jnp.asarray(
    rng.integers(0, ns ** 3, (T, 4)), jnp.int32)
want_w = jnp.asarray(rng.integers(0, nw ** 3, (T, 1)), jnp.int32)
for R in (12,):
    timeit(f"staging-only R={R}",
           partial(staged, want_w, want_s, rg.wmeta, rg.sw_meta,
                   rg.sw_solid, rg.sw_liq, rg.sw_pid, rounds=R))

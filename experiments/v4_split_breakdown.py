"""Split-frame breakdown at bench cadence: march vs shade at 1080p.

bench.py syncs once per 96 enqueued frames (the ~40 ms tunnel RTT
otherwise bills ~10 ms/frame at depth-4 cadence — the old
v4_sustained_breakdown numbers carry that tax). This probe times each
dispatch of the split v4 frame at the same batch-96 cadence:

  march   _trace_frame4 (prepacked, warm token)
  shade   _shade_fin4 from fixed march products
  full    render_frame4 (march + shade, prepared + warm token)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_split_breakdown.py
"""

import time

import numpy as np

PX = 1920 * 1080


def sustained(label, mk_frame, tok0=None, batch=96, min_s=4.0):
    import jax

    stride = 4
    toks = [tok0] * stride
    # warm compile both cold/warm variants
    r, t = mk_frame(toks[0])
    toks[0] = t
    r, t = mk_frame(toks[0])
    toks[0] = t
    jax.block_until_ready(r)
    toks = [toks[0]] * stride
    frames = 0
    t0 = time.perf_counter()
    while True:
        last = None
        for i in range(batch):
            last, toks[i % stride] = mk_frame(toks[i % stride])
        jax.block_until_ready(last)
        frames += batch
        el = time.perf_counter() - t0
        if el > min_s:
            break
    ms = el / frames * 1e3
    print(f"# {label}: {ms:.2f} ms/frame  ({PX * frames / el / 1e6:.1f} "
          f"Mrays/s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront3 import _sb_dims
    from voxelraytracing_tpu.ops.wavefront import TILE_W, TILE_H
    from voxelraytracing_tpu.ops.wavefront4 import (
        _shade_fin4,
        _trace_frame4,
        prepare_grid4,
        render_frame4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)
    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)
    kw = dict(rounds=64, step_cap=500, steps_per_round=256)

    def full(tok):
        img, t = render_frame4(rgrid, cam, lut, cache=tok,
                               return_cache=True, prepared=prep, **kw)
        return img, t

    ms_full = sustained("full split frame (prepared+warm)", full)

    f32 = jnp.float32
    wm = jnp.asarray(rgrid.world_min, f32)
    origin = jnp.asarray(cam.pos, f32) - wm
    iv = jnp.asarray(cam.inv_view, f32)
    ip = jnp.asarray(cam.inv_proj, f32)
    z = jnp.zeros((), f32)
    common = dict(
        width=1920, height=1080, sub_rounds=32, sub_steps=8,
        v=int(rgrid.size_voxels), interpret=False, raw_out=True,
        warm=True, prepacked=True,
    )
    planes = (rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
              rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid)

    def march(tok):
        ts, fl, wa, we, ids = _trace_frame4(
            *planes, origin, iv, ip, z, z, z, 64, 500.0, tok,
            prep.sw_cont, prep.wmeta_pad, **common,
        )
        return (ts, fl, wa, we), ids

    ms_march = sustained("march only (prepacked, warm)", march)

    # fixed march products for the shade-only loop
    (ts, fl, wa, we), _ = march(None)
    jax.block_until_ready(ts)
    tx, ty = 1920 // TILE_W, 1080 // TILE_H
    nsx, _, _ = _sb_dims(tx, ty)
    sun_local = jnp.asarray((0.0, 10_000.0, 0.0), f32) - wm

    def shade(tok):
        img = _shade_fin4(
            origin, iv, ip, lut, jnp.asarray((0.81, 0.93, 1.0), f32),
            sun_local, jnp.float32(4.0), jnp.float32(0.4),
            ts, fl, wa, we, fl,
            width=1920, height=1080, full_height=1080,
            v=int(rgrid.size_voxels), nsx=nsx, show_steps=False,
            shadows=False, max_steps=64 * 32 * 8, with_flags=False,
            interpret=False,
        )
        return img, tok

    ms_shade = sustained("shade+untile only", shade)
    print(f"# march {ms_march:.2f} + shade {ms_shade:.2f} = "
          f"{ms_march + ms_shade:.2f} vs full {ms_full:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

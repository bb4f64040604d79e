"""Where does the sustained v4 frame go at 1080p?

Pipelined (depth 4) warm-token timing of: full fused frame, march-only
(raw), and the per-frame table staging (_interleave_meta + sw_cont
concat + pads) in isolation.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python experiments/v4_sustained_breakdown.py
"""

import time


def sustained(label, mk_frame, tok0=None, px=1920 * 1080):
    import jax

    depth = 4
    toks = [tok0] * depth
    frames = 0
    t0 = time.perf_counter()
    while True:
        rs = []
        for i in range(depth):
            r, toks[i] = mk_frame(toks[i])
            rs.append(r)
        jax.block_until_ready(rs[-1])
        frames += depth
        el = time.perf_counter() - t0
        if frames >= 8 and (el > 2.5 or frames >= 96):
            break
    ms = el / frames * 1e3
    print(f"# {label}: {ms:.2f} ms/frame  ({px * frames / el / 1e6:.1f} "
          f"Mrays/s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from experiments.v4_safe_probe import build, cam_for
    from voxelraytracing_tpu.ops.wavefront4 import (
        _trace_frame4,
        render_frame4,
    )

    print(f"# devices={jax.devices()}", flush=True)
    rgrid, mats, lut = build(8)
    cam = cam_for(rgrid, 1920, 1080)
    kw = dict(rounds=64, step_cap=500, steps_per_round=256)

    def full(tok):
        return render_frame4(rgrid, cam, lut, cache=tok,
                             return_cache=True, **kw)

    r, tok0 = full(None)
    r, tok0 = full(tok0)
    jax.block_until_ready(tok0)
    sustained("full fused frame (march+shade)", full, tok0)

    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

    prep = prepare_grid4(rgrid)
    jax.block_until_ready(prep)

    def fullp(tok):
        return render_frame4(rgrid, cam, lut, cache=tok,
                             return_cache=True, prepared=prep, **kw)

    r, tokp = fullp(None)
    r, tokp = fullp(tokp)
    jax.block_until_ready(tokp)
    sustained("full fused frame (prepared tables)", fullp, tokp)

    z = jnp.zeros((), jnp.float32)
    wm = jnp.asarray(rgrid.world_min, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm

    def raw(tok):
        out = _trace_frame4(
            rgrid.gw_jump, rgrid.gw_liq, rgrid.wmeta, rgrid.sw_meta,
            rgrid.sw_solid, rgrid.sw_liq, rgrid.sw_pid,
            origin,
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32),
            z, z, z, 64, 500.0, tok,
            width=1920, height=1080, sub_rounds=32, sub_steps=8,
            v=int(rgrid.size_voxels), interpret=False, raw_out=True,
            warm=True,
        )
        return out[0], out[4]

    r, tokr = raw(None)
    r, tokr = raw(tokr)
    jax.block_until_ready(tokr)
    sustained("march only (raw_out, warm token)", raw, tokr)

    # staging only: jit just the table packing from _trace_frame4
    from voxelraytracing_tpu.ops.wavefront4 import _interleave_meta

    @jax.jit
    def stage(sw_meta, sw_solid, sw_liq, sw_pid, wmeta):
        sw_meta_i = _interleave_meta(sw_meta)
        sw_cont = jnp.concatenate(
            [
                sw_solid[:, None, :],
                sw_liq[:, None, :],
                sw_pid,
                jnp.pad(
                    sw_meta_i, ((0, 0), (0, 128 - sw_meta_i.shape[1]))
                )[:, None, :],
            ],
            axis=1,
        )
        wmeta_i = _interleave_meta(wmeta)
        wmeta_pad = jnp.pad(
            wmeta_i, ((0, 0), (0, 128 - wmeta_i.shape[1]))
        )[:, None, :]
        return sw_cont, wmeta_pad

    def stg(tok):
        return stage(rgrid.sw_meta, rgrid.sw_solid, rgrid.sw_liq,
                     rgrid.sw_pid, rgrid.wmeta), None

    r, _ = stg(None)
    jax.block_until_ready(r)
    sustained("table staging only", stg)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

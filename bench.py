"""Headline benchmark: primary rays/second at 1080p on one chip.

Renders the standard demo world (8³ chunks of layered SVO terrain) at
1920×1080 through the flagship fused pipeline (ops/wavefront3.py march +
in-kernel shade -> packed RGBA8) and reports steady-state Mrays/s. This
matches what the reference kernel does per frame — trace AND shade into
an rgba8unorm texture in one compute pass (ray_tracer.wgsl update()).
Baseline = the 200 Mrays/s/chip north-star target from BASELINE.md (the
reference publishes no numbers of its own).

D2H DISCIPLINE: on this TPU, any device->host transfer permanently drops
the process into a ~83 ms/dispatch mode (see ops/wavefront.py). Nothing
here reads a device value until all timing is done.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

WIDTH, HEIGHT = 1920, 1080
BASELINE_MRAYS = 200.0
ROUNDS = 14    # service-round budget; the frame exits early once converged
STEP_CAP = 500  # per-ray step budget = the reference kernel's iteration cap
#                 (ray_tracer.wgsl:220) -- steps here are coarser (window/
#                 subwindow/brick skips), so 500 covers MORE distance


def _backend_alive(timeout_s=300):
    """Probe the default backend in a SUBPROCESS: a wedged device tunnel
    makes jax.devices() hang (not raise), and a hang here would stall the
    whole bench run. See docs/TPU_NOTES.md."""
    import subprocess

    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp\n"
                "(jax.device_put(jnp.zeros(8), jax.devices()[0]) + 1.0)"
                ".block_until_ready()\n"
                "print('ok')\n",
            ],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def main():
    # Tunnel outages can end at any moment (docs/TPU_NOTES.md records
    # multi-hour wedges): retry the probe for a bounded window before
    # giving up, so a bench launched near the end of an outage still
    # records a real number instead of a zero.
    deadline = time.monotonic() + float(
        __import__("os").environ.get("VOXELTPU_BENCH_WAIT_S", "1200")
    )
    alive = _backend_alive()
    while not alive and time.monotonic() < deadline:
        print("# backend down; retrying probe...", file=sys.stderr, flush=True)
        time.sleep(120)
        alive = _backend_alive(timeout_s=180)
    if not alive:
        # fail fast with a diagnostic line rather than hanging the driver
        print(
            json.dumps(
                {
                    "metric": "primary_rays_1080p_unavailable",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                    "error": "default backend hung or failed the dispatch probe",
                }
            )
        )
        return 1  # nonzero: callers keying on exit status must see failure

    import jax
    import jax.numpy as jnp

    # NOTE: no persistent compilation cache here — cached executables from
    # an earlier (degraded) session reproduce the degraded behavior.

    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import (
        build_render_grid3_host,
        color_lut_rows,
        render_frame3,
    )
    from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

    platform = jax.devices()[0].platform
    w_chunks = 8

    # World build happens entirely on host (NumPy), then uploads: running
    # the device builder would poison this process (see ops/wavefront.py).
    import numpy as np

    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w_chunks,
        w_chunks * 32 * 0.45, int(w_chunks * 32 * 0.28),
    )
    mats = demo_materials()
    rgrid = build_render_grid3_host(grids, cells, np.zeros(3, np.int32), w_chunks, mats)

    world_voxels = w_chunks * 32
    cam = CamData.create(
        rot_deg=(35.0, 45.0, 0.0),
        eye=(world_voxels * 0.5, world_voxels * 0.75, world_voxels * 0.5),
        fov_deg=70.0,
        proj_size=(WIDTH, HEIGHT),
    )
    lut = color_lut_rows(mats.color)

    import os

    # Orbit cameras for the sustained moving-camera metric: the warm-start
    # token is only honest if it survives a changing view (the reference's
    # real workload is a player flying through the world, main.rs:681-721).
    # One full revolution around the world center at terrain-skimming
    # height, all host-side NumPy (CamData is host data).
    n_orbit = 48
    cx = cz = world_voxels * 0.5
    orbit_cams = []
    for i in range(n_orbit):
        a = 360.0 * i / n_orbit
        r = world_voxels * 0.35
        eye = (
            cx + r * np.cos(np.deg2rad(a)),
            world_voxels * 0.72,
            cz + r * np.sin(np.deg2rad(a)),
        )
        # look inward and slightly down
        orbit_cams.append(CamData.create(
            rot_deg=(30.0, (a + 180.0) % 360.0, 0.0), eye=eye,
            fov_deg=70.0, proj_size=(WIDTH, HEIGHT),
        ))

    if os.environ.get("VOXELTPU_TRACER", "v4") == "v4":
        from voxelraytracing_tpu.ops.wavefront4 import (
            prepare_grid4,
            render_frame4,
        )

        prepared = prepare_grid4(rgrid)  # pack HBM tables once (static world)

        def frame(tok, cam=cam):
            # v4 warm-start token: last frame's per-block cache IDS;
            # the kernel prefetches them in one DMA wave and skips most
            # cold serve rounds (rounds stays a safety bound).
            # steps_per_round=256: sub-rounds have a fixed-point early
            # exit, so a bigger in-kernel budget only helps (sustained
            # sweep: 91 vs 85 Mrays/s at the 128 default).
            # fused=True: shade inside the march kernel — ONE launch per
            # frame, the reference kernel's shape (ray_tracer.wgsl
            # update() traces AND shades in one pass). Bit-exact vs the
            # split dispatches (tests/test_wavefront4.py) and ~1.23x
            # faster at 1080p (experiments/v4_fused_probe.py).
            # s_seg=4: each serve DMA fetches 4 consecutive subwindow
            # rows (stalled neighbors along +x share the issue cost);
            # pixel-identical, best-of-sweep on chip (14.47 vs 14.6-16.4
            # ms/f across seg1 repeats, experiments probe_seg2).
            return render_frame4(
                rgrid, cam, lut, rounds=64, step_cap=STEP_CAP,
                steps_per_round=256, prepared=prepared,
                cache=tok, return_cache=True, fused=True, s_seg=4,
            )
    else:
        def frame(tok, cam=cam):
            return render_frame3(
                rgrid, cam, lut, rounds=ROUNDS, step_cap=STEP_CAP,
                cache=tok, return_cache=True,
            )

    # Warm-up / compile (cold- and warm-cache program variants).
    print("# compiling...", file=sys.stderr, flush=True)
    r, tok0 = frame(None)
    r, tok0 = frame(tok0)
    jax.block_until_ready(tok0)
    print("# compiled; timing...", file=sys.stderr, flush=True)

    # Sustained throughput: enqueue a large batch of frames and sync once
    # per batch. JAX dispatch is async and enqueue costs ~0.1 ms/frame;
    # syncing every few frames would bill this tunnel's ~40 ms host<->device
    # round-trip latency to every small batch (measured: 88 -> 136 Mrays/s
    # at 1080p just from the sync cadence). Each frame warm-starts its
    # service cache from the token of the frame `stride` back — exactly
    # what an interactive loop does (WavefrontRenderer carries the token).
    #
    # STATISTICS: this runtime can insert a multi-second stall at an
    # arbitrary point after sustained dispatch activity (docs/TPU_NOTES.md),
    # which makes any single timed window a lottery. Each metric therefore
    # times REPEATS independent windows and reports the MEDIAN, with the
    # min/max spread carried in the JSON so the variance is visible.
    stride = 4
    batch = 96
    REPEATS = 5

    def timed_windows(cam_for_frame):
        rates = []
        tokens = [tok0] * stride
        fi = 0
        for _ in range(REPEATS):
            frames = 0
            t0 = time.perf_counter()
            while True:
                last = None
                for i in range(batch):
                    last, tokens[i % stride] = frame(
                        tokens[i % stride], cam=cam_for_frame(fi + i)
                    )
                jax.block_until_ready(last)
                fi += batch
                frames += batch
                elapsed = time.perf_counter() - t0
                if elapsed > 2.0 or frames >= 2 * batch:
                    break
            rates.append(WIDTH * HEIGHT * frames / elapsed / 1e6)
        rates.sort()
        return rates[len(rates) // 2], rates[0], rates[-1]

    mrays, mrays_lo, mrays_hi = timed_windows(lambda i: cam)

    # Moving-camera sustained throughput: one orbit step per frame, warm
    # tokens carried frame-to-frame exactly as EngineApp does. This is the
    # reference's actual workload shape (a player flying through the
    # world, main.rs:681-721) and guards against the static number ever
    # being an artifact of re-warming one frozen view.
    print("# orbit timing...", file=sys.stderr, flush=True)
    last, _t = frame(tok0, cam=orbit_cams[0])
    jax.block_until_ready(last)
    o_mrays, o_lo, o_hi = timed_windows(
        lambda i: orbit_cams[i % len(orbit_cams)]
    )

    # No device readback at all: even a 4-byte D2H can stall for minutes
    # after sustained dispatch activity on this runtime. Image correctness
    # is covered by tests/test_wavefront.py (CPU backend, exact checks).
    print(
        json.dumps(
            {
                "metric": f"primary_rays_1080p_{platform}",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
                "spread": [round(mrays_lo, 3), round(mrays_hi, 3)],
                "orbit_mrays": round(o_mrays, 3),
                "orbit_spread": [round(o_lo, 3), round(o_hi, 3)],
                "windows": REPEATS,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

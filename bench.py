"""Headline benchmark: primary rays/second at 1080p on one chip.

Renders the standard demo world (8³ chunks of layered SVO terrain) at
1920×1080 with the flagship primary-ray tracer and reports steady-state
Mrays/s. Baseline = the 200 Mrays/s/chip north-star target from BASELINE.md
(the reference publishes no numbers of its own).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

WIDTH, HEIGHT = 1920, 1080
BASELINE_MRAYS = 200.0


def main():
    import jax
    import jax.numpy as jnp

    from voxelraytracing_tpu.models.raytracer import RayTracer, RenderSettings
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.world.demo import demo_materials, make_demo_world

    platform = jax.devices()[0].platform
    w_chunks = 8
    world = make_demo_world(seed=7, size_in_chunks=w_chunks)
    world = jax.device_put(world)
    materials = demo_materials()
    tracer = RayTracer(materials)

    world_voxels = w_chunks * 32
    cam = CamData.create(
        rot_deg=(35.0, 45.0, 0.0),
        eye=(world_voxels * 0.5, world_voxels * 0.75, world_voxels * 0.5),
        fov_deg=70.0,
        proj_size=(WIDTH, HEIGHT),
    )
    settings = RenderSettings(sun_pos=(1000.0, 2000.0, 500.0))

    # Warm-up / compile.
    img, _ = tracer.render(world, cam, settings)
    img.block_until_ready()

    # Time enough frames for a stable number, at least 3, at most ~30s.
    frames = 0
    t0 = time.perf_counter()
    while True:
        img, _ = tracer.render(world, cam, settings)
        img.block_until_ready()
        frames += 1
        elapsed = time.perf_counter() - t0
        if frames >= 3 and (elapsed > 5.0 or frames >= 30):
            break
        if elapsed > 30.0:
            break

    mrays = WIDTH * HEIGHT * frames / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": f"primary_rays_1080p_{platform}",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

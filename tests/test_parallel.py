"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest).

Covers `parallel/render.py`: band-sharded primary rendering must be
pixel-identical to the single-device renderer, and the shard_map'd
sample-accumulation step must equal the host-side average of its
per-sample frames (the psum is exact: same adds, same order per pixel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelraytracing_tpu.models.raytracer import RayTracer, RenderSettings
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo_batch
from voxelraytracing_tpu.parallel.render import (
    ShardedRayTracer,
    make_mesh,
    sharded_accumulate_step,
)
from voxelraytracing_tpu.world.assemble import assemble_world_slice
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


@pytest.fixture(scope="module")
def scene():
    w = 2
    perm = jnp.asarray(noise.make_permutation(7))
    grids, cells = demo_chunk_grids(
        perm, jnp.zeros(3, jnp.int32), w,
        jnp.float32(w * 32 * 0.45), jnp.int32(int(w * 32 * 0.28)),
    )
    nodes, _ = build_chunk_svo_batch(grids)
    world = assemble_world_slice(nodes, cells, jnp.zeros(3, jnp.int32), w)
    return world, demo_materials()


def test_make_mesh_shapes():
    mesh = make_mesh(n_samples=2, n_rays=4)
    assert mesh.shape == {"samples": 2, "rays": 4}
    assert mesh.axis_names == ("samples", "rays")
    mesh1 = make_mesh()  # all devices on the rays axis
    assert mesh1.shape["samples"] == 1
    assert mesh1.shape["rays"] == len(jax.devices())


def test_sharded_tracer_matches_unsharded(scene):
    world, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 42.0, 32.0), 70.0, (32, 32))
    s = RenderSettings(sun_pos=(100.0, 300.0, 50.0))

    ref_img, _ = RayTracer(mats).render(world, cam, s)
    mesh = make_mesh(n_samples=1, n_rays=8)
    sh_img = ShardedRayTracer(mats, mesh).render(world, cam, s)

    # Frame rows land on 8 devices; values must be identical to 1-device.
    np.testing.assert_array_equal(np.asarray(ref_img), np.asarray(sh_img))
    # And the output really is sharded over the rays axis.
    shard_rows = {
        sh.index[0].start for sh in sh_img.addressable_shards
    }
    assert len(shard_rows) == 8


def test_accumulate_step_matches_host_average(scene):
    world, mats = scene
    n_samples, n_rays = 2, 4
    width, band_height = 32, 8
    full_h = band_height * n_rays
    mesh = make_mesh(n_samples=n_samples, n_rays=n_rays)
    cam = CamData.create(
        (30.0, 45.0, 0.0), (32.0, 42.0, 32.0), 70.0, (width, full_h)
    )
    jitter = 0.05

    step = sharded_accumulate_step(
        mesh, mats, width=width, band_height=band_height, max_steps=64
    )
    acc = step(
        world.nodes,
        world.chunk_roots,
        jnp.asarray(world.world_min, jnp.int32),
        jnp.asarray(cam.inv_view),
        jnp.asarray(cam.inv_proj),
        jnp.asarray(cam.pos),
        jnp.float32(jitter),
    )
    assert acc.shape == (full_h, width, 3)

    # Host-side reference: render each sample's jittered camera with the
    # plain tracer and average.
    tracer = RayTracer(mats, max_steps=64)
    frames = []
    for sid in range(n_samples):
        eps = (sid / n_samples) * jitter
        cam_s = CamData.create(
            (30.0, 45.0, 0.0),
            (32.0 + eps, 42.0 + eps, 32.0 + eps),
            70.0,
            (width, full_h),
        )
        img, _ = tracer.render(world, cam_s, RenderSettings())
        frames.append(np.asarray(img))
    expect = np.stack(frames).mean(axis=0)
    np.testing.assert_allclose(np.asarray(acc), expect, atol=1e-6)


def test_sharded_render_frame3_matches_single_device():
    """Band-sharded fused v3 frame == the single-device fused frame."""
    import numpy as np

    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import (
        build_render_grid3_host,
        render_frame3,
    )
    from voxelraytracing_tpu.parallel.render import (
        make_mesh,
        sharded_render_frame3,
    )
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )

    w = 2
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w, w * 32 * 0.45, int(w * 32 * 0.28)
    )
    mats = demo_materials()
    rg3 = build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), w, mats
    )
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0,
                         (64, 64))
    ref = np.asarray(render_frame3(rg3, cam, mats.color, rounds=32))
    mesh = make_mesh(n_samples=1, n_rays=8)
    got = np.asarray(
        sharded_render_frame3(mesh, rg3, cam, mats.color, rounds=32)
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_sharded_render_frame4_matches_single_device():
    """Band-sharded self-serving v4 frame == the single-device v4 frame."""
    import numpy as np

    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import build_render_grid3_host
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4
    from voxelraytracing_tpu.parallel.render import (
        make_mesh,
        sharded_render_frame4,
    )
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )

    w = 2
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w, w * 32 * 0.45, int(w * 32 * 0.28)
    )
    mats = demo_materials()
    rg3 = build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), w, mats
    )
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0,
                         (64, 64))
    ref = np.asarray(render_frame4(rg3, cam, mats.color, rounds=64))
    mesh = make_mesh(n_samples=1, n_rays=8)
    got = np.asarray(
        sharded_render_frame4(mesh, rg3, cam, mats.color, rounds=64)
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)

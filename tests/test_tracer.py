"""Pixel-level verification of the jnp tracer against the scalar oracle."""

import numpy as np
import pytest

from voxelraytracing_tpu.core.constants import CHUNK_SIZE
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
from voxelraytracing_tpu.ops.materials import make_material_table
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo
from voxelraytracing_tpu.ops.traverse import trace_rays
from voxelraytracing_tpu.world.pool import build_world_slice

from reference_tracer import scalar_ray_dir, trace_one

AIR, STONE, WATER, GRASS = 0, 1, 2, 3


def make_test_chunk():
    g = np.zeros((CHUNK_SIZE,) * 3, dtype=np.int32)
    g[:, :8, :] = STONE
    g[:, 8, :] = GRASS
    g[4:12, 8:12, 4:12] = WATER  # pool
    g[20:23, 9:17, 20:23] = STONE  # pillar
    return g


@pytest.fixture(scope="module")
def world():
    nodes, n = build_chunk_svo(make_test_chunk())
    chunk_nodes = np.asarray(nodes)[: int(n)]
    slice_, _pool = build_world_slice({(0, 0, 0): chunk_nodes}, (0, 0, 0), 1)
    return slice_


@pytest.fixture(scope="module")
def mats():
    styles = {
        AIR: {"state": "gas", "color": (0, 0, 0)},
        STONE: {"state": "solid", "color": (0.4, 0.4, 0.4)},
        WATER: {"state": "liquid", "color": (0.076, 0.563, 0.563)},
        GRASS: {"state": "solid", "color": (0.18, 0.45, 0.09)},
    }
    return make_material_table(4, styles)


@pytest.fixture(scope="module")
def cam():
    return CamData.create(rot_deg=(35.0, 30.0, 0.0), eye=(16.0, 24.0, 16.0), fov_deg=70.0, proj_size=(48, 48))


def test_ray_gen_matches_scalar(cam, world):
    origin, dirs = generate_rays(cam, world.world_min)
    dirs = np.asarray(dirs)
    for px, py in [(0, 0), (24, 24), (47, 47), (5, 40)]:
        d = scalar_ray_dir(px, py, 48, 48, cam.inv_proj, cam.inv_view)
        np.testing.assert_allclose(dirs[py, px], d, atol=2e-6)


def test_trace_matches_scalar_oracle(cam, world, mats):
    origin, dirs = generate_rays(cam, world.world_min)
    rs = trace_rays(world, mats.is_liquid, origin, dirs)

    nodes = np.asarray(world.nodes)
    roots = np.asarray(world.chunk_roots)
    liquid = np.asarray(mats.is_liquid)
    origin_np = np.asarray(origin, dtype=np.float32)
    dirs_np = np.asarray(dirs, dtype=np.float32)

    hit = np.asarray(rs.hit)
    voxel = np.asarray(rs.voxel)
    norm = np.asarray(rs.norm)
    pos = np.asarray(rs.pos)
    water = np.asarray(rs.water_dist)
    steps = np.asarray(rs.steps)

    n_hits = 0
    for py in range(48):
        for px in range(48):
            ref = trace_one(nodes, roots, 1, origin_np, dirs_np[py, px], liquid)
            at = f"pixel ({px},{py})"
            assert bool(hit[py, px]) == ref["hit"], at
            assert int(steps[py, px]) == ref["steps"], at
            np.testing.assert_allclose(
                water[py, px], ref["water_dist"], atol=1e-3, err_msg=at
            )
            if ref["hit"]:
                n_hits += 1
                assert int(voxel[py, px]) == ref["voxel"], at
                np.testing.assert_array_equal(norm[py, px], ref["norm"], err_msg=at)
                np.testing.assert_allclose(pos[py, px], ref["pos"], atol=1e-3, err_msg=at)
    # the scene must actually exercise hits, misses and water
    assert 0 < n_hits < 48 * 48
    assert (water > 0).any()


def test_render_produces_image(cam, world, mats):
    from voxelraytracing_tpu.models.raytracer import RayTracer, RenderSettings

    tracer = RayTracer(mats)
    img, rs = tracer.render(world, cam, RenderSettings(sun_pos=(100.0, 300.0, 50.0)))
    img = np.asarray(img)
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    # some sky, some terrain
    assert np.asarray(rs.hit).any() and not np.asarray(rs.hit).all()


def test_step_heatmap_mode(cam, world, mats):
    from voxelraytracing_tpu.models.raytracer import RayTracer

    tracer = RayTracer(mats, show_step_count=True)
    img, rs = tracer.render(world, cam)
    img = np.asarray(img)
    # heatmap pixels are grayscale on dry hits (the water overlay is applied
    # after the heatmap, matching ray_tracer.wgsl:311-314 then :137-141)
    h = np.asarray(rs.hit) & (np.asarray(rs.water_dist) == 0.0)
    assert h.any()
    assert np.allclose(img[h][:, 0], img[h][:, 1])


def test_shadows_darken(cam, world, mats):
    from voxelraytracing_tpu.models.raytracer import RayTracer, RenderSettings

    s = RenderSettings(sun_pos=(100.0, 200.0, 30.0))
    base, rs = RayTracer(mats).render(world, cam, s)
    shadowed, _ = RayTracer(mats, shadows=True).render(world, cam, s)
    base, shadowed = np.asarray(base), np.asarray(shadowed)
    assert (shadowed <= base + 1e-6).all()
    assert (shadowed < base - 1e-4).any()


def test_shadow_settings_are_live(cam, world, mats):
    """settings.shadows and settings.shadow_ambient actually take effect."""
    from voxelraytracing_tpu.models.raytracer import RayTracer, RenderSettings

    sun = (100.0, 200.0, 30.0)
    tracer = RayTracer(mats)
    base, _ = tracer.render(world, cam, RenderSettings(sun_pos=sun))
    via_settings, _ = tracer.render(
        world, cam, RenderSettings(sun_pos=sun, shadows=True)
    )
    via_ctor, _ = RayTracer(mats, shadows=True).render(
        world, cam, RenderSettings(sun_pos=sun)
    )
    base = np.asarray(base)
    via_settings = np.asarray(via_settings)
    np.testing.assert_allclose(via_settings, np.asarray(via_ctor))
    assert (via_settings < base - 1e-4).any()

    # shadow_ambient=1.0 keeps all the light: no darkening at all
    lit, _ = tracer.render(
        world, cam, RenderSettings(sun_pos=sun, shadows=True, shadow_ambient=1.0)
    )
    np.testing.assert_allclose(np.asarray(lit), base, atol=1e-6)


def test_packed_node_pool_matches_unpacked(cam, world, mats):
    """Two-u16-per-u32 packed node pool (the reference's device layout,
    shader.rs:22-40) traces identically to the widened int32 pool."""
    import jax.numpy as jnp

    origin, dirs = generate_rays(cam, world.world_min)
    ref = trace_rays(world, mats.is_liquid, origin, dirs, 500)
    pw = world.packed()
    assert pw.nodes.dtype == jnp.uint32
    assert pw.nodes.shape[0] == (world.nodes.shape[0] + 1) // 2
    got = trace_rays(pw, mats.is_liquid, origin, dirs, 500)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(
        np.asarray(ref.voxel), np.asarray(got.voxel)
    )
    np.testing.assert_array_equal(np.asarray(ref.pos), np.asarray(got.pos))
    np.testing.assert_array_equal(
        np.asarray(ref.steps), np.asarray(got.steps)
    )

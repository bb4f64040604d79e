"""Path tracer tests: emission, sky light, determinism, bounce behavior."""

import jax
import numpy as np
import pytest

from voxelraytracing_tpu.core.constants import CHUNK_SIZE
from voxelraytracing_tpu.models.pathtracer import PathTracer
from voxelraytracing_tpu.models.raytracer import RenderSettings
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops.materials import make_material_table
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo
from voxelraytracing_tpu.world.pool import build_world_slice


@pytest.fixture(scope="module")
def scene():
    """Closed room: floor + glowing block, no sky."""
    g = np.zeros((CHUNK_SIZE,) * 3, np.int32)
    g[:, :4, :] = 1  # floor
    g[14:18, 4:6, 14:18] = 2  # emissive block on the floor
    nodes, n = build_chunk_svo(g)
    world, _ = build_world_slice(
        {(0, 0, 0): np.asarray(nodes)[: int(n)]}, (0, 0, 0), 1
    )
    mats = make_material_table(
        8,
        {
            1: {"color": (0.6, 0.6, 0.6), "state": "solid"},
            2: {"color": (1.0, 0.9, 0.5), "state": "solid", "emission": 6.0},
        },
    )
    return world, mats


def _cam(size=(64, 32)):
    # eye above the far corner looking down-diagonally AT the glowing block
    return CamData.create((35.0, 45.0, 0.0), (24.0, 14.0, 24.0), 70.0, size)


def test_emissive_lights_the_scene(scene):
    world, mats = scene
    dark = RenderSettings(sun_intensity=0.0, sky_color=(0.0, 0.0, 0.0))
    pt = PathTracer(mats, max_bounces=2, max_steps=128)
    img = pt.render(world, _cam(), dark, samples=8, key=jax.random.PRNGKey(1))
    a = np.asarray(img)
    assert not np.isnan(a).any()
    # emissive block visible directly and lights nearby floor via bounces
    assert a.max() > 1.0  # direct emission exceeds 1
    assert a.mean() > 0.002  # bounce light spreads

    # zero bounces: only direct emission — darker overall
    pt0 = PathTracer(mats, max_bounces=0, max_steps=128)
    img0 = pt0.render(world, _cam(), dark, samples=8, key=jax.random.PRNGKey(1))
    assert np.asarray(img0).mean() < a.mean()


def test_sky_provides_light(scene):
    world, mats = scene
    lit = RenderSettings(sun_pos=(500.0, 2000.0, 300.0))
    pt = PathTracer(mats, max_bounces=1, max_steps=128)
    img = pt.render(world, _cam(), lit, samples=4, key=jax.random.PRNGKey(2))
    dark = RenderSettings(sun_intensity=0.0, sky_color=(0.0, 0.0, 0.0))
    img_dark = pt.render(world, _cam(), dark, samples=4, key=jax.random.PRNGKey(2))
    assert np.asarray(img).mean() > np.asarray(img_dark).mean() * 2


def test_deterministic_per_key(scene):
    world, mats = scene
    pt = PathTracer(mats, max_bounces=1, max_steps=64)
    s = RenderSettings()
    a = pt.render(world, _cam((32, 16)), s, samples=2, key=jax.random.PRNGKey(5))
    b = pt.render(world, _cam((32, 16)), s, samples=2, key=jax.random.PRNGKey(5))
    c = pt.render(world, _cam((32, 16)), s, samples=2, key=jax.random.PRNGKey(6))
    assert bool(np.all(np.asarray(a) == np.asarray(b)))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_more_samples_less_variance(scene):
    world, mats = scene
    pt = PathTracer(mats, max_bounces=2, max_steps=64)
    s = RenderSettings(sun_pos=(500.0, 2000.0, 300.0))
    cam = _cam((32, 16))
    ref = np.asarray(
        pt.render(world, cam, s, samples=32, key=jax.random.PRNGKey(7))
    )
    lo = np.asarray(pt.render(world, cam, s, samples=2, key=jax.random.PRNGKey(8)))
    hi = np.asarray(pt.render(world, cam, s, samples=16, key=jax.random.PRNGKey(8)))
    assert np.abs(hi - ref).mean() < np.abs(lo - ref).mean()

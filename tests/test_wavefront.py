"""Wavefront tracer tests: agreement with the SVO reference tracer.

The SVO tracer (ops/traverse.py) is the executable spec of the reference
kernel; the windowed wavefront tracer (ops/wavefront.py) must agree with it
on hits, voxel ids, positions and water distances. Grazing-edge rays may
step in a different order across cell boundaries, so voxel ids get a small
mismatch allowance; hits must agree exactly.

All on the CPU backend (conftest) — the TPU-specific dispatch structure is
exercised identically, just without the hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo_batch
from voxelraytracing_tpu.ops.traverse import trace_rays
from voxelraytracing_tpu.ops.wavefront import (
    build_render_grid,
    build_render_grid_host,
    render_id_maps,
    trace_wavefront,
)
from voxelraytracing_tpu.world.assemble import assemble_world_slice
from voxelraytracing_tpu.world.demo import (
    demo_chunk_grids,
    demo_chunk_grids_host,
    demo_materials,
)


@pytest.fixture(scope="module")
def scene():
    w = 4
    perm = jnp.asarray(noise.make_permutation(7))
    grids, cells = demo_chunk_grids(
        perm, jnp.zeros(3, jnp.int32), w,
        jnp.float32(w * 32 * 0.45), jnp.int32(int(w * 32 * 0.28)),
    )
    mats = demo_materials()
    rgrid = build_render_grid(grids, cells, np.zeros(3, np.int32), w, mats)
    nodes, _ = build_chunk_svo_batch(grids)
    world = assemble_world_slice(nodes, cells, jnp.zeros(3, jnp.int32), w)
    return rgrid, world, mats, grids, cells


CAMS = [
    ((30.0, 45.0, 0.0), (64.0, 75.0, 64.0)),
    ((5.0, 120.0, 0.0), (20.0, 40.0, 100.0)),
    ((60.0, 200.0, 0.0), (100.0, 110.0, 30.0)),
    ((-20.0, 300.0, 0.0), (64.0, 20.0, 64.0)),  # underwater, looking up
]


@pytest.mark.parametrize("cam_cfg", CAMS)
@pytest.mark.historical
def test_agrees_with_svo_reference(scene, cam_cfg):
    rgrid, world, mats, _, _ = scene
    cam = CamData.create(cam_cfg[0], cam_cfg[1], 70.0, (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    ref = trace_rays(world, mats.is_liquid, origin, dirs, 500)
    wf = trace_wavefront(rgrid, origin, dirs, width=64, height=32, max_rounds=64)

    # With correct pre-step slot gating in _post_voxel the two tracers agree
    # exactly on hits and voxel ids despite their different acceleration
    # structures (SVO node descent vs brick windows).
    rh, wh = np.asarray(ref.hit), np.asarray(wf.hit)
    np.testing.assert_array_equal(rh, wh)

    m = rh & wh
    rv, wv = np.asarray(ref.voxel), np.asarray(wf.voxel)
    np.testing.assert_array_equal(rv[m], wv[m])

    # hit positions along the ray agree where voxels agree (bulk of rays)
    same = m & (rv == wv)
    wp = np.asarray(origin)[None, None] + np.asarray(dirs) * np.asarray(wf.t)[..., None]
    rp = np.asarray(ref.pos)
    pd = np.abs(wp - rp)[same].max(axis=-1)
    # The SVO reference nudges per-axis, so its position drifts off the ray
    # by ~eps per step — on long grazing paths that accumulates to voxels,
    # while the wavefront tracer is t-parameterized and drift-free. Bulk
    # agreement is tight; the grazing tail diverges by ref drift.
    assert (pd < 0.51).mean() >= 0.75
    assert np.median(pd) < 0.01

    wd = np.abs(np.asarray(ref.water_dist) - np.asarray(wf.water_dist))
    assert np.median(wd) < 0.05


@pytest.mark.historical
def test_camera_outside_world_sees_nothing(scene):
    rgrid, _, mats, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (-50.0, 75.0, 64.0), 70.0, (32, 16))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    wf = trace_wavefront(rgrid, origin, dirs, width=32, height=16, max_rounds=8)
    assert not np.asarray(wf.hit).any()


def test_host_builder_matches_device(scene):
    _, _, mats, grids, cells = scene
    a = build_render_grid(grids, cells, np.zeros(3, np.int32), 4, mats)
    b = build_render_grid_host(
        np.asarray(grids), np.asarray(cells), np.zeros(3, np.int32), 4, mats
    )
    for field in ("bwin", "lwin", "brick_dir", "bricks", "to_pack"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        )
    assert int(a.n_liquid) == int(b.n_liquid)
    assert a.size_voxels == b.size_voxels


def test_demo_host_grids_match_device():
    perm = noise.make_permutation(7)
    g_dev, c_dev = demo_chunk_grids(
        jnp.asarray(perm), jnp.zeros(3, jnp.int32), 2,
        jnp.float32(2 * 32 * 0.45), jnp.int32(int(2 * 32 * 0.28)),
    )
    g_host, c_host = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), 2, 2 * 32 * 0.45, int(2 * 32 * 0.28)
    )
    np.testing.assert_array_equal(np.asarray(g_dev), g_host)
    np.testing.assert_array_equal(np.asarray(c_dev), c_host)


def test_render_id_maps_roundtrip():
    is_liquid = np.array([False, True, False, True, False])
    to_render, to_pack, n_liq = render_id_maps(is_liquid)
    assert n_liq == 2
    assert to_render[0] == 0
    # liquids occupy render ids 1..n_liq
    assert sorted(to_render[[1, 3]]) == [1, 2]
    for pack_id in range(5):
        assert to_pack[to_render[pack_id]] == pack_id


@pytest.mark.historical
def test_step_heatmap_counts(scene):
    rgrid, _, mats, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0, (32, 16))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    wf = trace_wavefront(rgrid, origin, dirs, width=32, height=16, max_rounds=48)
    steps = np.asarray(wf.steps)
    assert steps.max() > 1  # the debug heatmap has signal
    assert steps.min() >= 0

"""Fused in-kernel path tracer (ops/pathtrace4.py) tests.

The fused kernel traces, bounces, and shades in one launch (the
reference's dedicated path_tracer.wgsl shape) with an on-core
counter-hash RNG, so it cannot be bit-exact with the XLA-route
path_trace3 on RNG-dependent paths. What IS pinned:

  * RNG-free paths match path_trace3 EXACTLY: bounces=0 frames, and
    scatter=0 (mirror) worlds where the bounce direction is the
    deterministic specular reflection — including emission pickup and
    water absorption along both legs;
  * diffuse frames agree statistically (mean radiance within a few
    percent at a handful of samples);
  * frames are deterministic given (world, camera, key) and actually
    depend on the key.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops.materials import make_material_table
from voxelraytracing_tpu.ops.pathtrace4 import path_trace_fused4
from voxelraytracing_tpu.ops.wavefront3 import (
    build_render_grid3_host,
    path_trace3,
)
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials

SUN = (1000.0, 2500.0, 500.0)


def _world(mats, w=2):
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), w, w * 32 * 0.45, int(w * 32 * 0.28)
    )
    return build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), w, mats
    )


@pytest.fixture(scope="module")
def diffuse_scene():
    mats = demo_materials()
    return _world(mats), mats


@pytest.fixture(scope="module")
def mirror_scene():
    """scatter=0 everywhere: the bounce is a deterministic reflection,
    so the fused kernel must match the XLA route exactly. Voxel 1 also
    emits, covering the emission-pickup path."""
    styles = {
        1: {"color": (0.55, 0.55, 0.55), "state": "solid",
            "scatter": 0.0, "emission": 0.5},
        2: {"color": (0.55, 0.35, 0.15), "state": "solid", "scatter": 0.0},
        3: {"color": (0.30, 0.68, 0.24), "state": "solid", "scatter": 0.0},
        4: {"color": (0.12, 0.30, 0.85), "state": "liquid", "scatter": 0.0},
    }
    mats = make_material_table(256, styles)
    return _world(mats), mats


CAM = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0, (64, 32))


def test_fused_pt_bounces0_matches_xla_route(diffuse_scene):
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(0),
              rounds=48, step_cap=500)
    a = np.asarray(path_trace3(rg3, CAM, mats, bounces=0, v4=True, **kw))
    b = np.asarray(path_trace_fused4(rg3, CAM, mats, bounces=0, **kw))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("bounces", [1, 2])
def test_fused_pt_specular_matches_xla_route(mirror_scene, bounces):
    rg3, mats = mirror_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(0),
              rounds=64, step_cap=500)
    a = np.asarray(path_trace3(rg3, CAM, mats, bounces=bounces, v4=True,
                               **kw))
    b = np.asarray(path_trace_fused4(rg3, CAM, mats, bounces=bounces,
                                     **kw))
    np.testing.assert_array_equal(a, b)


def test_fused_pt_diffuse_statistics(diffuse_scene):
    """Different RNGs, same estimator: mean radiance agrees within a few
    percent at a handful of samples."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, bounces=1, samples=4, rounds=48, step_cap=500)
    a = np.asarray(path_trace3(rg3, CAM, mats, v4=True,
                               key=jax.random.PRNGKey(0), **kw))
    b = np.asarray(path_trace_fused4(rg3, CAM, mats,
                                     key=jax.random.PRNGKey(0), **kw))
    assert not np.isnan(b).any()
    ma, mb = float(a.mean()), float(b.mean())
    assert abs(ma - mb) / ma < 0.05, (ma, mb)


def test_fused_pt_deterministic_and_key_sensitive(diffuse_scene):
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, bounces=1, samples=1, rounds=48, step_cap=500)
    a = np.asarray(path_trace_fused4(rg3, CAM, mats,
                                     key=jax.random.PRNGKey(7), **kw))
    b = np.asarray(path_trace_fused4(rg3, CAM, mats,
                                     key=jax.random.PRNGKey(7), **kw))
    c = np.asarray(path_trace_fused4(rg3, CAM, mats,
                                     key=jax.random.PRNGKey(8), **kw))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_fused_pt_stable_across_serve_pacing(diffuse_scene):
    """The RNG keys on (ray id, bounce index, seed) — NOT on a round
    counter — so serve-pacing knobs (segmented fetches, bigger budgets)
    cannot change what a ray draws: frames are bit-identical."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, bounces=1, samples=1,
              key=jax.random.PRNGKey(0), step_cap=500)
    a = np.asarray(path_trace_fused4(rg3, CAM, mats, rounds=48, **kw))
    b = np.asarray(path_trace_fused4(rg3, CAM, mats, rounds=48, s_seg=4,
                                     **kw))
    c = np.asarray(path_trace_fused4(rg3, CAM, mats, rounds=96, **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_fused_pt_prepared_tables_are_noop(diffuse_scene):
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, bounces=1, samples=1,
              key=jax.random.PRNGKey(0), rounds=48, step_cap=500)
    a = np.asarray(path_trace_fused4(rg3, CAM, mats, **kw))
    prep = prepare_grid4(rg3)
    b = np.asarray(path_trace_fused4(rg3, CAM, mats, prepared=prep, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_compact_retry_matches_uncapped(diffuse_scene):
    """Straggler re-batching (bounce_rounds cap + tile-compacted resume,
    wavefront4._bounce_retry4) is bit-exact vs a plain high-rounds leg
    when the compaction capacity covers every straggler tile: marching
    is cache-content-deterministic, so capping + resuming equals one
    uncapped march, and the RNG draws are leg-structure-independent."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(3),
              bounces=1, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, CAM, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_compact_retry_specular_two_bounces(mirror_scene):
    """Multi-leg: every bounce leg gets the cap+compact treatment."""
    rg3, mats = mirror_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(0),
              bounces=2, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, CAM, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_compact_lanes_matches_uncapped(diffuse_scene):
    """Lane-level compaction (compact_lanes: per-block active-first lane
    sort before the tile compaction, wavefront4._bounce_retry4
    lane_compact) is bit-exact vs a plain high-rounds leg: the sort is a
    pure placement change (marching is lane-placement-independent given
    cache contents) and results restore through the carried index. A
    tiny capacity that would overflow at tile granularity suffices once
    lanes are packed."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(3),
              bounces=1, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, CAM, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64,
                               compact_lanes=True, **kw))
    np.testing.assert_array_equal(a, b)
    # spatial sort key (compact_lanes=2): same compaction, coherent
    # resume tiles — still a pure placement change
    c = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64,
                               compact_lanes=2, **kw))
    np.testing.assert_array_equal(a, c)


def test_pt_compact_recursion_matches_uncapped(diffuse_scene):
    """Two-level retry (compact_tiles2: the resume launch itself capped
    at retry_rounds1 rounds, its leftovers re-compacted in compacted
    space and run to the full budget) is bit-exact when both capacities
    cover their stragglers — each level is the same cache-content-
    deterministic cap+resume argument applied once more."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(3),
              bounces=1, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, CAM, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64,
                               compact_lanes=1, retry_rounds1=1,
                               compact_tiles2=64, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_compact_lanes_specular_two_bounces(mirror_scene):
    """Lane compaction composes with multi-leg capped bounces."""
    rg3, mats = mirror_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(0),
              bounces=2, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, CAM, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, rounds=64,
                               bounce_rounds=2, compact_tiles=64,
                               compact_lanes=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_compact_partial_capacity_shapes(diffuse_scene):
    """A compaction capacity smaller than the tile count exercises the
    partial gather/scatter path; with an uncapped first leg the retry is
    a structural no-op, so the frame must stay bit-exact."""
    rg3, mats = diffuse_scene
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0,
                         (256, 64))
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(1),
              bounces=1, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, cam, mats, rounds=64, **kw))
    b = np.asarray(path_trace3(rg3, cam, mats, rounds=64,
                               compact_tiles=64, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_bounce_sort_is_bitexact(diffuse_scene):
    """Block-level direction sorting of bounce rays (bounce_sort) is a
    pure scheduling change: marching is lane-placement-independent
    given cache contents, and results restore through the carried
    index, so frames are bit-identical."""
    rg3, mats = diffuse_scene
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0,
                         (256, 64))
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(5),
              bounces=1, step_cap=500, v4=True, rounds=48)
    a = np.asarray(path_trace3(rg3, cam, mats, **kw))
    b = np.asarray(path_trace3(rg3, cam, mats, bounce_sort=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_bounce_rebin_is_bitexact(diffuse_scene):
    """Global tile-level spatial re-binning of bounce rays
    (bounce_rebin) is a pure scheduling change: whole 128-ray tiles are
    permuted across block programs by origin-subwindow key and results
    restore through the inverse permutation, so frames are
    bit-identical — with and without the direction-octant subkey, the
    synthetic warm token, and the bounce-leg wm_full table."""
    rg3, mats = diffuse_scene
    cam = CamData.create((30.0, 45.0, 0.0), (32.0, 40.0, 32.0), 70.0,
                         (256, 64))
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(5),
              bounces=1, step_cap=500, v4=True, rounds=48)
    a = np.asarray(path_trace3(rg3, cam, mats, **kw))
    b = np.asarray(path_trace3(rg3, cam, mats, bounce_rebin=1, **kw))
    c = np.asarray(path_trace3(rg3, cam, mats, bounce_rebin=2,
                               bounce_wm_full=True, **kw))
    d = np.asarray(path_trace3(rg3, cam, mats, bounce_rebin=3, **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(a, d)


def test_pt_bounce_rebin_two_bounces(mirror_scene):
    """Every bounce leg re-bins independently (per-leg keys + token)."""
    rg3, mats = mirror_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(0),
              bounces=2, step_cap=500, v4=True, rounds=64)
    a = np.asarray(path_trace3(rg3, CAM, mats, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, bounce_rebin=3, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_spin_ramp_is_bitexact(diffuse_scene):
    """Ramped in-kernel spin budgets (short early serve-bound rounds,
    long late step-bound rounds) are schedule-only: bit-identical."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(6),
              bounces=1, step_cap=500, v4=True, rounds=48)
    a = np.asarray(path_trace3(rg3, CAM, mats, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats,
                               bounce_steps_per_round=256,
                               bounce_spin_ramp=1, **kw))
    np.testing.assert_array_equal(a, b)


def test_pt_primary_cap_retry_matches(diffuse_scene):
    """Primary-leg cap + compact-resume inside the PT route is bit-exact
    when the capacity covers the stragglers."""
    rg3, mats = diffuse_scene
    kw = dict(sun_pos=SUN, samples=1, key=jax.random.PRNGKey(2),
              bounces=1, step_cap=500, v4=True, rounds=64)
    a = np.asarray(path_trace3(rg3, CAM, mats, **kw))
    b = np.asarray(path_trace3(rg3, CAM, mats, prim_rounds=1,
                               prim_compact=64, **kw))
    np.testing.assert_array_equal(a, b)
    # lane-compacted primary retry (compact_lanes plumbs through the
    # prim_compact path too — the round-5 gate caught its absence as
    # tile-capacity truncation)
    c = np.asarray(path_trace3(rg3, CAM, mats, prim_rounds=1,
                               prim_compact=64, compact_lanes=1, **kw))
    np.testing.assert_array_equal(a, c)

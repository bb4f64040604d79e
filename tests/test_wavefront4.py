"""Self-serving march kernel (v4) tests: agreement with the SVO reference.

v4 (ops/wavefront4.py) serves subwindow content to itself via in-kernel
DMA instead of v3's per-round XLA service pass; converged frames must
agree exactly with the SVO reference tracer (the executable spec of
ray_tracer.wgsl:182-291) and with v3.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData, generate_rays
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo_batch
from voxelraytracing_tpu.ops.traverse import trace_rays
from voxelraytracing_tpu.ops.wavefront3 import build_render_grid3_host
from voxelraytracing_tpu.ops.wavefront4 import (
    trace_wavefront4,
    trace_wavefront4_rays,
)
from voxelraytracing_tpu.world.assemble import assemble_world_slice
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials


@pytest.fixture(scope="module")
def scene():
    w = 4
    perm = jnp.asarray(noise.make_permutation(7))
    grids, cells = demo_chunk_grids(
        perm, jnp.zeros(3, jnp.int32), w,
        jnp.float32(w * 32 * 0.45), jnp.int32(int(w * 32 * 0.28)),
    )
    mats = demo_materials()
    rg3 = build_render_grid3_host(
        np.asarray(grids), np.asarray(cells), np.zeros(3, np.int32), w, mats
    )
    nodes, _ = build_chunk_svo_batch(grids)
    world = assemble_world_slice(nodes, cells, jnp.zeros(3, jnp.int32), w)
    return rg3, world, mats


CAMS = [
    ((30.0, 45.0, 0.0), (64.0, 75.0, 64.0)),
    ((5.0, 120.0, 0.0), (20.0, 40.0, 100.0)),
    ((60.0, 200.0, 0.0), (100.0, 110.0, 30.0)),
    ((-20.0, 300.0, 0.0), (64.0, 20.0, 64.0)),  # underwater, looking up
]


@pytest.mark.parametrize("cam_cfg", CAMS)
def test_v4_agrees_with_svo_reference(scene, cam_cfg):
    rg3, world, mats = scene
    cam = CamData.create(cam_cfg[0], cam_cfg[1], 70.0, (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    ref = trace_rays(world, mats.is_liquid, origin, dirs, 500)
    wf = trace_wavefront4(rg3, origin, cam=cam, rounds=64)

    rh, wh = np.asarray(ref.hit), np.asarray(wf.hit)
    np.testing.assert_array_equal(rh, wh)

    m = rh & wh
    rv, wv = np.asarray(ref.voxel), np.asarray(wf.voxel)
    np.testing.assert_array_equal(rv[m], wv[m])

    wd = np.abs(np.asarray(ref.water_dist) - np.asarray(wf.water_dist))
    assert np.median(wd) < 0.05


def test_v4_camera_outside_world_sees_nothing(scene):
    rg3, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (-50.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    wf = trace_wavefront4(rg3, origin, cam=cam, rounds=4)
    assert not np.asarray(wf.hit).any()


def test_v4_per_ray_bundle_matches_primary(scene):
    """trace_wavefront4_rays with camera rays == the primary tracer."""
    rg3, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    p = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
    r = trace_wavefront4_rays(
        rg3, jnp.broadcast_to(jnp.asarray(origin), (32, 64, 3)), dirs,
        jnp.ones((32, 64), bool), width=64, height=32, rounds=64,
    )
    np.testing.assert_array_equal(np.asarray(p.hit), np.asarray(r.hit))
    np.testing.assert_array_equal(np.asarray(p.voxel), np.asarray(r.voxel))
    np.testing.assert_allclose(np.asarray(p.t), np.asarray(r.t), atol=1e-4)


def test_v4_shadow_rays(scene):
    """Secondary rays from hit points behave like v3's shadow pass."""
    rg3, world, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    p = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
    hit = np.asarray(p.hit)
    hitp = (np.asarray(origin)[None, None]
            + np.asarray(dirs) * np.asarray(p.t)[..., None])
    sun = np.array([1000.0, 2500.0, 500.0], np.float32)
    sd = sun[None, None] - hitp
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    so = (hitp + np.asarray(p.norm) * 1e-3).astype(np.float32)
    sh = trace_wavefront4_rays(
        rg3, so, sd.astype(np.float32), hit, width=64, height=32, rounds=64
    )
    shadowed = np.asarray(sh.hit)
    assert shadowed[~hit].sum() == 0  # inactive rays stay misses
    frac = shadowed[hit].mean()
    assert 0.0 < frac < 0.5


def test_v4_matches_v3(scene):
    """v4 and v3 are the same march — frames must be bit-identical."""
    from voxelraytracing_tpu.ops.wavefront3 import trace_wavefront3

    rg3, _, _ = scene
    for cfg in CAMS[:2]:
        cam = CamData.create(cfg[0], cfg[1], 70.0, (64, 32))
        origin, _ = generate_rays(cam, np.zeros(3, np.int32))
        a = trace_wavefront3(rg3, origin, cam=cam, rounds=32)
        b = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
        for f in ("hit", "voxel", "t", "water_dist", "norm"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), f)


def test_v4_render_frame_matches_v3(scene):
    """The fused v4 frame (march + shade, shadows on) is pixel-identical
    to the v3 fused frame."""
    from voxelraytracing_tpu.ops.wavefront3 import render_frame3
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, step_cap=500)
    a = np.asarray(render_frame3(rg3, cam, mats.color, rounds=32, **kw))
    b = np.asarray(render_frame4(rg3, cam, mats.color, rounds=64, **kw))
    np.testing.assert_array_equal(a, b)

    r = WavefrontRendererV4()
    pk = np.asarray(r.render_packed(rg3, cam))
    assert pk.shape == a.shape


def WavefrontRendererV4():
    from voxelraytracing_tpu.models.raytracer import WavefrontRenderer
    from voxelraytracing_tpu.world.demo import demo_materials

    return WavefrontRenderer(demo_materials(), tracer="v4")


def test_v4_path_trace_matches_v3(scene):
    """path_trace4 (every bounce on the self-serving kernel) matches the
    v3 path tracer bit-for-bit given the same RNG key."""
    import jax

    from voxelraytracing_tpu.ops.wavefront3 import path_trace3
    from voxelraytracing_tpu.ops.wavefront4 import path_trace4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    key = jax.random.PRNGKey(3)
    for bounces in (0, 1):
        a = np.asarray(path_trace3(rg3, cam, mats, bounces=bounces,
                                   samples=1, key=key, rounds=32))
        b = np.asarray(path_trace4(rg3, cam, mats, bounces=bounces,
                                   samples=1, key=key, rounds=64))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_v4_path_trace_perf_carries_are_noops(scene):
    """The PT perf carries — prepared tables, the frame-to-frame warm ids
    token, and a separate bounce-leg spin budget — are all pixel-exact
    no-ops on the v4 route (wavefront3._path_frame docstring)."""
    import jax

    from voxelraytracing_tpu.ops.wavefront3 import path_trace3
    from voxelraytracing_tpu.ops.wavefront4 import prepare_grid4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), bounces=1, samples=1,
              key=jax.random.PRNGKey(3), rounds=48, step_cap=500, v4=True)
    a = np.asarray(path_trace3(rg3, cam, mats, **kw))
    prep = prepare_grid4(rg3)
    b, tok = path_trace3(rg3, cam, mats, prepared=prep, return_cache=True,
                         **kw)
    np.testing.assert_array_equal(a, np.asarray(b))
    assert tok is not None
    c = path_trace3(rg3, cam, mats, prepared=prep, cache=tok, **kw)
    np.testing.assert_array_equal(a, np.asarray(c))
    d = path_trace3(rg3, cam, mats, bounce_steps_per_round=128, **kw)
    np.testing.assert_array_equal(a, np.asarray(d))


def test_v4_step_cap(scene):
    """step_cap kills rays at the cap exactly like v3 (reference cap
    semantics: exhausted rays render as misses, ray_tracer.wgsl:220)."""
    rg3, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    full = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
    capped = trace_wavefront4(rg3, origin, cam=cam, rounds=64, step_cap=4)
    s = np.asarray(capped.steps)
    assert s.max() <= 4
    # with a generous cap the capped trace equals the full trace
    wide = trace_wavefront4(rg3, origin, cam=cam, rounds=64, step_cap=500)
    np.testing.assert_array_equal(np.asarray(full.hit), np.asarray(wide.hit))
    np.testing.assert_array_equal(np.asarray(full.t), np.asarray(wide.t))


def test_v4_low_round_budget_is_safe(scene):
    """Same starvation semantics as v3: budget exhaustion degrades to
    misses, never fabricated hits (ray_tracer.wgsl:220 fall-out)."""
    rg3, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    full = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
    for rounds in (1, 2, 4):
        poor = trace_wavefront4(rg3, origin, cam=cam, rounds=rounds)
        ph = np.asarray(poor.hit)
        fh = np.asarray(full.hit)
        assert not (ph & ~fh).any(), rounds
        m = ph & fh
        np.testing.assert_array_equal(
            np.asarray(poor.voxel)[m], np.asarray(full.voxel)[m])
        np.testing.assert_allclose(
            np.asarray(poor.t)[m], np.asarray(full.t)[m], atol=1e-4)


def test_v4_grouped_service_matches_chain(scene):
    """The grouped (vectorized per-tile-group) service pick converges to
    the exact same frame as the distinct-min chain."""
    rg3, _, _ = scene
    for cfg in CAMS[:2]:
        cam = CamData.create(cfg[0], cfg[1], 70.0, (64, 32))
        origin, _ = generate_rays(cam, np.zeros(3, np.int32))
        a = trace_wavefront4(rg3, origin, cam=cam, rounds=96)
        b = trace_wavefront4(rg3, origin, cam=cam, rounds=96, grouped=True)
        for f in ("hit", "voxel", "t", "water_dist", "norm"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), f)


def test_v4_warm_cache_matches_cold(scene):
    """A frame warm-started from another frame's cache-id token equals
    the cold trace exactly (ids only; contents re-fetched in kernel)."""
    from voxelraytracing_tpu.ops.wavefront4 import trace_wavefront4 as tw4

    rg3, _, _ = scene
    cam_a = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    cam_b = CamData.create((30.0, 52.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    origin, _ = generate_rays(cam_a, np.zeros(3, np.int32))
    _, tok = tw4(rg3, origin, cam=cam_a, rounds=96, return_cache=True)
    assert np.asarray(tok).shape[1:] == (2, 128)
    warm, tok2 = tw4(rg3, origin, cam=cam_b, rounds=96, cache=tok,
                     return_cache=True)
    cold = tw4(rg3, origin, cam=cam_b, rounds=96)
    for f in ("hit", "voxel", "t", "water_dist", "norm"):
        np.testing.assert_array_equal(
            np.asarray(getattr(warm, f)), np.asarray(getattr(cold, f)), f)
    # an all-invalid token reproduces the cold trace too
    empty = np.full_like(np.asarray(tok), -1)
    e = tw4(rg3, origin, cam=cam_b, rounds=96, cache=empty)
    np.testing.assert_array_equal(np.asarray(e.hit), np.asarray(cold.hit))
    np.testing.assert_array_equal(np.asarray(e.t), np.asarray(cold.t))


def test_v4_warm_cache_sees_world_edits(scene):
    """Tokens carry only IDS: after a world rebuild a warm frame renders
    the NEW world."""
    from voxelraytracing_tpu.ops.wavefront4 import trace_wavefront4 as tw4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    _, tok = tw4(rg3, origin, cam=cam, rounds=96, return_cache=True)

    w = 4
    perm = jnp.asarray(noise.make_permutation(7))
    grids, cells = demo_chunk_grids(
        perm, jnp.zeros(3, jnp.int32), w,
        jnp.float32(w * 32 * 0.30), jnp.int32(int(w * 32 * 0.18)),
    )
    rg_edit = build_render_grid3_host(
        np.asarray(grids), np.asarray(cells), np.zeros(3, np.int32), w, mats
    )
    warm = tw4(rg_edit, origin, cam=cam, rounds=96, cache=tok)
    cold = tw4(rg_edit, origin, cam=cam, rounds=96)
    for f in ("hit", "voxel", "t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(warm, f)), np.asarray(getattr(cold, f)), f)


def test_v4_warm_cache_converges_faster(scene):
    """The token's point: at a starved round budget, the warm frame is
    strictly closer to converged than the cold frame."""
    from voxelraytracing_tpu.ops.wavefront4 import trace_wavefront4 as tw4

    rg3, _, _ = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    full = tw4(rg3, origin, cam=cam, rounds=96)
    _, tok = tw4(rg3, origin, cam=cam, rounds=96, return_cache=True)
    fh = np.asarray(full.hit)
    warm = tw4(rg3, origin, cam=cam, rounds=2, cache=tok)
    cold = tw4(rg3, origin, cam=cam, rounds=2)
    warm_m = (np.asarray(warm.hit) != fh).mean()
    cold_m = (np.asarray(cold.hit) != fh).mean()
    assert warm_m < cold_m or (warm_m == 0.0 and cold_m == 0.0)


def test_v4_render_frame_warm_matches_cold(scene):
    """Warm fused frames (shadows on, token carried) are pixel-identical
    to cold fused frames."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam_a = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    cam_b = CamData.create((30.0, 52.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, step_cap=500,
              rounds=96)
    _, tok = render_frame4(rg3, cam_a, mats.color, return_cache=True, **kw)
    warm, tok2 = render_frame4(rg3, cam_b, mats.color, cache=tok,
                               return_cache=True, **kw)
    cold = render_frame4(rg3, cam_b, mats.color, **kw)
    np.testing.assert_array_equal(np.asarray(warm), np.asarray(cold))


def test_v4_warm_gather_matches_inkernel_dma(scene):
    """The hoisted warm-cache path (warm_gather=True: XLA row-gathers the
    previous frame's cache contents and streams them in as pipelined
    block inputs) is pixel-identical to the in-kernel DMA prefetch wave
    (warm_gather=False) given the same cache token."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam_a = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    cam_b = CamData.create((30.0, 52.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    for fused in (False, True):
        kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=not fused,
                  step_cap=500, rounds=96, fused=fused)
        _, tok = render_frame4(rg3, cam_a, mats.color, return_cache=True,
                               **kw)
        a, _ = render_frame4(rg3, cam_b, mats.color, cache=tok,
                             return_cache=True, warm_gather=False, **kw)
        b, _ = render_frame4(rg3, cam_b, mats.color, cache=tok,
                             return_cache=True, warm_gather=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v4_vb_and_sseg_are_pixel_identical(scene):
    """Program-virtualization (vb sub-blocks per grid program, amortizing
    the ~16 us/program pipeline setup) and segmented serve fetches
    (s_seg consecutive subwindow rows per DMA) are pure perf knobs:
    pixel-identical output, and warm tokens interchange across vb
    settings (the token stays per-SUB-block shaped)."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam_a = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    cam_b = CamData.create((30.0, 52.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), rounds=64, step_cap=500)
    for fused in (False, True):
        a = render_frame4(rg3, cam_a, mats.color, shadows=not fused,
                          fused=fused, **kw)
        for vkw in ({"vb": 2}, {"s_seg": 4}, {"vb": 2, "s_seg": 4}):
            b = render_frame4(rg3, cam_a, mats.color, shadows=not fused,
                              fused=fused, **vkw, **kw)
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{fused} {vkw}"
            )
    # warm-token interchange: a token from a vb=1 frame warms a vb=2
    # frame (and the result equals the vb=1 warm frame)
    _, tok = render_frame4(rg3, cam_a, mats.color, fused=True,
                           return_cache=True, **kw)
    w1, _ = render_frame4(rg3, cam_b, mats.color, fused=True, cache=tok,
                          return_cache=True, **kw)
    w2, _ = render_frame4(rg3, cam_b, mats.color, fused=True, cache=tok,
                          return_cache=True, vb=2, **kw)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_v4_fused_inkernel_shade_matches_split(scene):
    """fused=True (shade inside the march kernel — one launch per frame,
    the reference kernel's trace-and-shade-in-one-pass shape,
    ray_tracer.wgsl:173-316) is pixel-identical to the split
    march|shade dispatches, flags included."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), step_cap=500, rounds=64,
              with_flags=True)
    for cfg in CAMS[:3]:
        cam = CamData.create(cfg[0], cfg[1], 70.0, (64, 32))
        a, afl = render_frame4(rg3, cam, mats.color, **kw)
        b, bfl = render_frame4(rg3, cam, mats.color, fused=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(afl), np.asarray(bfl))


def test_v4_fused_show_steps_matches_split(scene):
    """The fused kernel's in-kernel step-count heatmap equals the split
    path's (debug mode, ray_tracer.wgsl:311-314)."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(step_cap=500, rounds=64, show_steps=True)
    a = np.asarray(render_frame4(rg3, cam, mats.color, **kw))
    b = np.asarray(render_frame4(rg3, cam, mats.color, fused=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_v4_fused_warm_and_prepared_match_cold(scene):
    """Fused frames with a warm token and/or prepared tables are
    pixel-identical to the cold unprepared fused frame."""
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )

    rg3, _, mats = scene
    prep = prepare_grid4(rg3)
    cam_a = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    cam_b = CamData.create((30.0, 52.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                           (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), step_cap=500, rounds=96,
              fused=True)
    _, tok = render_frame4(rg3, cam_a, mats.color, return_cache=True, **kw)
    assert tok[0] is not None
    warm, tok2 = render_frame4(rg3, cam_b, mats.color, cache=tok,
                               return_cache=True, prepared=prep, **kw)
    cold = render_frame4(rg3, cam_b, mats.color, **kw)
    np.testing.assert_array_equal(np.asarray(warm), np.asarray(cold))


def test_v4_prepared_tables_bit_exact(scene):
    """prepare_grid4 tables reproduce the in-frame packing exactly: a
    prepared fused frame (shadows on) is pixel-identical to an
    unprepared one, and the marched products match too."""
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )

    rg3, _, mats = scene
    prep = prepare_grid4(rg3)
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, step_cap=500,
              rounds=64)
    base = render_frame4(rg3, cam, mats.color, **kw)
    prepd = render_frame4(rg3, cam, mats.color, prepared=prep, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(prepd))

    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    a = trace_wavefront4(rg3, origin, cam=cam, rounds=64)
    b = trace_wavefront4(rg3, origin, cam=cam, rounds=64, prepared=prep)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.voxel), np.asarray(b.voxel))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))


def test_v4_shadow_compact_retry_matches_uncapped(scene):
    """Shadow-leg straggler re-batching (shadow_rounds cap + compacted
    resume launch, _bounce_retry4) is bit-exact vs the plain leg when
    the capacity covers every straggler tile."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, rounds=64,
              step_cap=500)
    a = render_frame4(rg3, cam, mats.color, **kw)
    b = render_frame4(rg3, cam, mats.color, shadow_rounds=2,
                      compact_tiles=64, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v4_fused_shadow_matches_split(scene):
    """The fused shadow leg (primary march + in-kernel sun re-march +
    shade, ONE launch) is bit-exact vs the split march|shadow|shade
    dispatches: same ray construction as _shadow_prep4, same per-ray
    init as _trace_frame4, same shade op order as _shade_kernel."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, rounds=64,
              step_cap=500)
    for cfg in CAMS[:2]:
        cam = CamData.create(cfg[0], cfg[1], 70.0, (64, 32))
        a = render_frame4(rg3, cam, mats.color, **kw)
        b = render_frame4(rg3, cam, mats.color, fused=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(cfg))
    # warm-token round trip through the fused-shadow program
    cam = CamData.create(*CAMS[0], 70.0, (64, 32))
    img0, tok = render_frame4(rg3, cam, mats.color, fused=True,
                              return_cache=True, **kw)
    img1, _ = render_frame4(rg3, cam, mats.color, fused=True, cache=tok,
                            return_cache=True, **kw)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))


def test_v4_primary_compact_retry_matches_uncapped(scene):
    """Primary-leg cap + compacted resume (split path) is bit-exact vs
    the plain full-rounds march when the capacity covers every
    straggler tile (_primary_retry4 re-derives the camera rays)."""
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    rg3, _, mats = scene
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), rounds=64, step_cap=500)
    a = render_frame4(rg3, cam, mats.color, **kw)
    b = render_frame4(rg3, cam, mats.color, primary_rounds=1,
                      compact_tiles=64, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

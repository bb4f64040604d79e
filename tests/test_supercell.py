"""Super-cell global plane tests (>32-chunk windows).

Worlds past 16 windows (32 chunks) per axis coarsen the 4096-bit global
window plane to 2^gs-window SUPER-CELLS (ops/wavefront3.py:_gs_for): a
set bit means every covered window is jumpable with uniform liquidity
and rays cross it in (64<<gs)-voxel jumps. This is how the fused path
reaches the reference's 10..80-chunk window slider
(clientdesktop/src/ui.rs:163-168) without growing the kernels' VMEM
planes.

Pinned here:
  * _super_gplanes_np packing semantics (unit),
  * gs=0 pass-through equals the original packing bit-for-bit,
  * v3 agreement with the SVO reference tracer on a sparse 34-chunk
    world (nw=17 -> gs=1, the first super-cell size),
  * v4 bit-exactness vs v3 on the same world.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxelraytracing_tpu.ops.camera import CamData, generate_rays
from voxelraytracing_tpu.ops.svo_build import build_chunk_svo
from voxelraytracing_tpu.ops.traverse import trace_rays
from voxelraytracing_tpu.ops.wavefront3 import (
    _gs_for,
    _pack_bits_np,
    _super_gplanes_np,
    trace_wavefront3,
)
from voxelraytracing_tpu.world.demo import (
    EARTH,
    GRASS,
    STONE,
    WATER,
    demo_materials,
)
from voxelraytracing_tpu.world.pool import build_world_slice

W = 34  # chunks -> 1088 voxels, nw = 17 -> gs = 1, nwg = 9


def test_gs_for_breakpoints():
    assert _gs_for(1) == 0
    assert _gs_for(16) == 0
    assert _gs_for(17) == 1
    assert _gs_for(32) == 1
    assert _gs_for(33) == 2
    assert _gs_for(64) == 2
    assert _gs_for(65) == 3
    assert _gs_for(128) == 3


def test_super_gplane_gs0_passthrough():
    """At <=16 windows the super-cell reduction must pack bit-identically
    to the original format (every pre-existing world keeps its planes)."""
    nw = 4
    rng = np.random.RandomState(0)
    wj = rng.rand(nw ** 3) < 0.5
    wl = wj & (rng.rand(nw ** 3) < 0.5)  # real gw_liq input is jump&liq
    gj, gl = _super_gplanes_np(wj, wl, nw)

    def old_gplane(bits):
        pad = np.zeros(4096, bool)
        pad[: bits.shape[0]] = bits
        return _pack_bits_np(pad.reshape(1, 4096))

    np.testing.assert_array_equal(gj, old_gplane(wj))
    np.testing.assert_array_equal(gl, old_gplane(wl))


def _bit(plane, x, y, z, nwg):
    wg = x + y * nwg + z * nwg * nwg
    return int(
        (np.asarray(plane).reshape(-1)[wg >> 5] >> np.uint32(wg & 31)) & 1
    )


def test_super_gplane_semantics():
    """nw=17 (gs=1, nwg=9): jump bits AND over covered windows; liquidity
    must be uniform; pad windows beyond nw don't block."""
    nw, nwg = 17, 9
    n3 = nw ** 3
    wj = np.ones(n3, bool)
    wl = np.zeros(n3, bool)
    gj, gl = _super_gplanes_np(wj, wl, nw)
    # fully-empty world: every super-cell jumpable (edge cells included —
    # their out-of-range halves are pad), nothing liquid
    assert _bit(gj, 0, 0, 0, nwg) == 1
    assert _bit(gj, 8, 8, 8, nwg) == 1  # covers only window (16,16,16)+pad
    assert _bit(gl, 0, 0, 0, nwg) == 0

    # one non-jumpable window clears ONLY its super-cell
    wj2 = wj.copy()
    wj2[3 + 0 * nw + 0 * nw * nw] = False          # window (3,0,0) -> cell (1,0,0)
    gj2, _ = _super_gplanes_np(wj2, wl, nw)
    assert _bit(gj2, 1, 0, 0, nwg) == 0
    assert _bit(gj2, 0, 0, 0, nwg) == 1
    assert _bit(gj2, 2, 0, 0, nwg) == 1

    # uniform liquid super-cell: both covered windows on each axis pair
    # liquid -> jump + liq bits set
    wl3 = wl.copy()
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                wl3[(4 + dx) + (4 + dy) * nw + (4 + dz) * nw * nw] = True
    gj3, gl3 = _super_gplanes_np(wj, wl3, nw)
    assert _bit(gj3, 2, 2, 2, nwg) == 1
    assert _bit(gl3, 2, 2, 2, nwg) == 1

    # MIXED liquidity (one of the eight water, rest air): the crossing
    # granularity can't represent it -> jump must clear (rays fall back
    # to per-window service, which is exact)
    wl4 = wl.copy()
    wl4[(6) + (6) * nw + (6) * nw * nw] = True      # cell (3,3,3), 1 of 8
    gj4, gl4 = _super_gplanes_np(wj, wl4, nw)
    assert _bit(gj4, 3, 3, 3, nwg) == 0
    assert _bit(gl4, 3, 3, 3, nwg) == 0


# --------------------------------------------------------- traced world


def _terrain_chunk():
    g = np.zeros((32, 32, 32), np.int32)
    g[:, :12, :] = STONE
    g[:, 12:14, :] = EARTH
    g[:, 14, :] = GRASS
    return g


def _water_chunk():
    return np.full((32, 32, 32), WATER, np.int32)


@pytest.fixture(scope="module")
def big_scene():
    """Sparse 34-chunk window: terrain islands at opposite corners plus a
    floating water cube mid-world — rays cross many empty super-cells,
    mixed-edge super-cells, and a uniform-liquid region."""
    from voxelraytracing_tpu.world.render_grid import RenderGrid3Builder

    mats = demo_materials()
    cells = [
        (0, 0, 0), (1, 0, 0), (0, 0, 1), (1, 0, 1),     # origin island
        (32, 0, 32), (33, 0, 33),                       # far-corner island
        (16, 8, 16),                                    # water cube
    ]
    grids = np.stack(
        [_terrain_chunk()] * 6 + [_water_chunk()]
    )
    b = RenderGrid3Builder(W, mats)
    b.set_chunks(cells, grids)
    rg3 = b.grid()

    chunks = {}
    for c, g in zip(cells, grids):
        nodes, n = build_chunk_svo(jnp.asarray(g))
        chunks[c] = np.asarray(nodes)[: int(n)]
    world, _ = build_world_slice(chunks, (0, 0, 0), W)
    return rg3, world, mats


CAMS = [
    # above the origin island looking down at it
    ((35.0, 45.0, 0.0), (20.0, 60.0, 20.0)),
    # from high above the origin, looking across the whole window toward
    # the far island (crosses ~15 empty super-cells before hitting)
    ((14.5, 225.0, 0.0), (10.0, 400.0, 10.0)),
    # down through the floating water cube (uniform-liquid super-cell)
    ((70.0, 10.0, 0.0), (528.0, 400.0, 500.0)),
    # grazing: from the far corner back toward the origin island
    ((4.2, 45.0, 0.0), (1080.0, 120.0, 1080.0)),
]


@pytest.mark.parametrize("cam_cfg", CAMS)
def test_supercell_v3_agrees_with_svo_reference(big_scene, cam_cfg):
    rg3, world, mats = big_scene
    cam = CamData.create(cam_cfg[0], cam_cfg[1], 70.0, (64, 32))
    origin, dirs = generate_rays(cam, np.zeros(3, np.int32))
    ref = trace_rays(world, mats.is_liquid, origin, dirs, 2000)
    wf = trace_wavefront3(rg3, origin, cam=cam, rounds=48, step_cap=2000)

    rh, wh = np.asarray(ref.hit), np.asarray(wf.hit)
    np.testing.assert_array_equal(rh, wh)
    m = rh & wh
    np.testing.assert_array_equal(
        np.asarray(ref.voxel)[m], np.asarray(wf.voxel)[m]
    )
    wd = np.abs(np.asarray(ref.water_dist) - np.asarray(wf.water_dist))
    assert np.median(wd) < 0.05


@pytest.mark.parametrize("cam_cfg", CAMS)
def test_supercell_v4_matches_v3(big_scene, cam_cfg):
    from voxelraytracing_tpu.ops.wavefront4 import trace_wavefront4

    rg3, _, _ = big_scene
    cam = CamData.create(cam_cfg[0], cam_cfg[1], 70.0, (64, 32))
    origin, _ = generate_rays(cam, np.zeros(3, np.int32))
    a = trace_wavefront3(rg3, origin, cam=cam, rounds=48, step_cap=2000)
    b = trace_wavefront4(rg3, origin, cam=cam, rounds=96, step_cap=2000)
    for f in ("hit", "voxel", "t", "water_dist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), f
        )

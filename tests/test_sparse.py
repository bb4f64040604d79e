"""Sparse v4 packed tables (PreparedGrid4Sparse) tests.

The dense sw_cont table at the reference's 80-chunk window would be
~15 GB (ui.rs:165 slider ceiling); the sparse twin stores content rows
only for non-jump subwindows with all-solid rows deduplicated, and the
kernel translates sid -> row through the window-meta rows' index lanes.
Frames must be pixel-exact vs the dense tables — the translation is a
pure addressing change.
"""

import numpy as np
import pytest

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops.wavefront4 import render_frame4
from voxelraytracing_tpu.world.demo import demo_chunk_grids_host, demo_materials
from voxelraytracing_tpu.world.render_grid import RenderGrid3Builder

W = 4
SUN = (1000.0, 2500.0, 500.0)


@pytest.fixture(scope="module")
def builders():
    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), W, W * 32 * 0.45, int(W * 32 * 0.28)
    )
    mats = demo_materials()
    cell_xyz = [(int(c % W), int((c // W) % W), int(c // (W * W)))
                for c in cells]
    dense = RenderGrid3Builder(W, mats, sparse=False)
    dense.set_chunks(cell_xyz, grids)
    sp = RenderGrid3Builder(W, mats, sparse=True)
    sp.set_chunks(cell_xyz, grids)
    return dense, sp, mats, grids, cell_xyz


CAMS = [
    ((30.0, 45.0, 0.0), (64.0, 75.0, 64.0)),
    ((5.0, 120.0, 0.0), (20.0, 40.0, 100.0)),
    ((-20.0, 300.0, 0.0), (64.0, 20.0, 64.0)),  # underwater, looking up
]


def _frame(b, mats, cam_cfg, **kw):
    cam = CamData.create(cam_cfg[0], cam_cfg[1], 70.0, (64, 32))
    return render_frame4(
        b.grid(), cam, mats.color, sun_pos=SUN, rounds=64, step_cap=500,
        prepared=b.prepared(), **kw,
    )


@pytest.mark.parametrize("cam_cfg", CAMS)
def test_sparse_matches_dense(builders, cam_cfg):
    dense, sp, mats, _, _ = builders
    a = _frame(dense, mats, cam_cfg)
    b = _frame(sp, mats, cam_cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparse_fused_shadow_matches_dense(builders):
    dense, sp, mats, _, _ = builders
    kw = dict(shadows=True, fused=True)
    a = _frame(dense, mats, CAMS[0], **kw)
    b = _frame(sp, mats, CAMS[0], **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparse_warm_token_and_edit(builders):
    """Warm tokens carry content-ROW indices (row 2), verified on
    restore against the sid stamped in each row — warm frames are
    bit-exact, and an edit under a live token still renders the NEW
    world (stale rows fail verification or are overwritten in place)."""
    dense, sp, mats, grids, cell_xyz = builders
    cam = CamData.create(*CAMS[0], 70.0, (64, 32))

    kw = dict(sun_pos=SUN, rounds=64, step_cap=500)
    cold, tok = render_frame4(sp.grid(), cam, mats.color,
                              prepared=sp.prepared(), return_cache=True,
                              **kw)
    assert np.asarray(tok[0]).shape[1] == 3  # sparse token rows
    warm, tok2 = render_frame4(sp.grid(), cam, mats.color,
                               prepared=sp.prepared(), cache=tok,
                               return_cache=True, **kw)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm))

    # edit: hollow out one chunk under the live token, in BOTH builders
    edited = np.array(grids[:1])
    edited[0, :, :, :] = 0
    for b in (dense, sp):
        b.set_chunks(cell_xyz[:1], edited)
    after_sp, _ = render_frame4(sp.grid(), cam, mats.color,
                                prepared=sp.prepared(), cache=tok2,
                                return_cache=True, **kw)
    after_dn = render_frame4(dense.grid(), cam, mats.color,
                             prepared=dense.prepared(), **kw)
    np.testing.assert_array_equal(np.asarray(after_sp),
                                  np.asarray(after_dn))
    # restore the fixture state for other tests
    for b in (dense, sp):
        b.set_chunks(cell_xyz[:1], grids[:1])


def test_sparse_eviction_and_memory(builders):
    """Evicted cells free their rows; buried all-solid volume shares
    canonical rows (the table stays small)."""
    _, sp, mats, grids, cell_xyz = builders
    sp.prepared()
    used_before = sp._sp_next - len(sp._sp_free)
    sp.clear_cells(cell_xyz[:2])
    sp.prepared()
    used_after = sp._sp_next - len(sp._sp_free)
    assert used_after < used_before
    # the world's distinct content rows are far fewer than its
    # subwindows (dedup is doing real work on buried volume)
    n_content = int((sp._sp_row >= 0).sum())
    assert used_after <= n_content
    assert sp.sparse_tables_mb() < 50.0
    # restore
    sp.set_chunks(cell_xyz[:2], grids[:2])

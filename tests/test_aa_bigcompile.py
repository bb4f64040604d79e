"""Early compile of the suite's largest XLA programs (runs FIRST — the
"aa" name sorts this file to the front of the alphabetical collection).

The XLA CPU compiler SEGFAULTS compiling the warm+shadow split v4
programs when they first compile LATE in a long suite run (reproduced
deterministically at tests/test_wavefront4.py::
test_v4_render_frame_warm_matches_cold after ~130 prior in-process
compilations, on fresh compile caches and with the zstandard cache
compressor removed — a process-state-dependent jax/XLA CPU bug, the
same compiles succeed standalone). Compiling the exact programs here,
while the process is young, makes the late calls in-memory pjit cache
HITS: every shape and static argument below must stay identical to the
late callers' (same 4-chunk demo world, 64x32 camera, rounds=96,
shadows=True, warm token carried).

This is also a legitimate smoke test: the full warm+shadow split
pipeline must produce a finite, non-empty frame.
"""

import numpy as np

import jax.numpy as jnp

from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops.camera import CamData
from voxelraytracing_tpu.ops.wavefront3 import build_render_grid3_host
from voxelraytracing_tpu.ops.wavefront4 import render_frame4
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials


def test_big_programs_compile_early():
    w = 4
    perm = jnp.asarray(noise.make_permutation(7))
    grids, cells = demo_chunk_grids(
        perm, jnp.zeros(3, jnp.int32), w,
        jnp.float32(w * 32 * 0.45), jnp.int32(int(w * 32 * 0.28)),
    )
    mats = demo_materials()
    rg3 = build_render_grid3_host(
        np.asarray(grids), np.asarray(cells), np.zeros(3, np.int32), w,
        mats,
    )
    cam = CamData.create((30.0, 45.0, 0.0), (64.0, 75.0, 64.0), 70.0,
                         (64, 32))
    kw = dict(sun_pos=(1000.0, 2500.0, 500.0), shadows=True, step_cap=500,
              rounds=96)
    # cold variant (no cache) then warm variant (token carried): exactly
    # the two program signatures test_v4_render_frame_warm_matches_cold
    # compiles
    img, tok = render_frame4(rg3, cam, mats.color, return_cache=True, **kw)
    img2, _ = render_frame4(rg3, cam, mats.color, cache=tok,
                            return_cache=True, **kw)
    a = np.asarray(img2)
    assert a.shape == (32, 64)
    assert (a != a[0, 0]).any()  # not a constant frame

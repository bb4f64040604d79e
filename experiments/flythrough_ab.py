"""Flythrough A/B: incremental prepared() vs one-shot full repack.

config4_flythrough regressed 26.1 -> 17.1 f/s in round 4; the suspect is
the incremental packed-table maintenance (donating scatters may force
full-table copies while in-flight frames still hold the buffer). This
replicates config4c's loop in three modes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python experiments/flythrough_ab.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import numpy as np

    from benchmarks.run import _gen_strip_subproc
    from voxelraytracing_tpu.ops.camera import CamData
    from voxelraytracing_tpu.ops.wavefront3 import color_lut_rows
    from voxelraytracing_tpu.ops.wavefront4 import (
        prepare_grid4,
        render_frame4,
    )
    from voxelraytracing_tpu.resources.packs import (
        Resources,
        builtin_respack_path,
    )
    from voxelraytracing_tpu.world.render_grid import RenderGrid3Builder

    print(f"# devices={jax.devices()}", flush=True)
    NX, NY, NZ = 32, 3, 8
    W = 32
    res = Resources.load_from(builtin_respack_path())
    dp, sp = res.datapacks["terra"], res.stylepacks["terra"]
    mats = sp.material_table(dp.voxels)
    g, mn = _gen_strip_subproc(NX, NY, NZ, 20260816)
    g = g.astype(np.int16)
    lut = color_lut_rows(mats.color)

    def col_cells(i):
        cells, grids = [], []
        for j in range(NY):
            for k in range(NZ):
                n = (i * NY + j) * NZ + k
                cells.append((i, j, k + (W - NZ) // 2))
                grids.append(g[n])
        return cells, np.asarray(grids)

    def cam_at(fx):
        return CamData.create(
            (20.0, 225.0, 0.0),
            ((mn[0] + fx) * 32.0, 110.0, (mn[2] + NZ // 2) * 32.0),
            70.0, (1920, 1080),
        )

    def run(label, mode):
        b = RenderGrid3Builder(W, mats, world_min=np.asarray(mn) * 32)
        for i in range(8):
            c, gg = col_cells(i)
            b.set_chunks(c, gg)
        prep = {"p": None, "g": None}

        def get_prep(rg):
            if mode == "inc":
                return b.prepared()
            if prep["g"] is not rg:
                prep["p"] = prepare_grid4(rg)
                prep["g"] = rg
            return prep["p"]

        def frame(tok, fx):
            rg = b.grid()
            return render_frame4(
                rg, cam_at(fx), lut, rounds=64, step_cap=500,
                steps_per_round=256, prepared=get_prep(rg), cache=tok,
                return_cache=True, fused=True,
            )

        img, tok = frame(None, 1.0)
        img, tok = frame(tok, 1.0)
        jax.block_until_ready(img)
        frames = chunks = 0
        t0 = time.perf_counter()
        fx = 1.0
        last = img
        for col in range(8, 8 + NX - 9):
            if mode != "static":
                cells, gg = col_cells(col)
                b.set_chunks(cells, gg)
                chunks += len(cells)
            for f in range(4):
                fx += 0.25
                last, tok = frame(tok, fx)
                frames += 1
            jax.block_until_ready(last)
        dt = time.perf_counter() - t0
        print(f"# {label}: {frames / dt:.2f} f/s "
              f"({chunks / dt:.0f} chunks/s)", flush=True)

    run("fullpack (r3 behavior)", "full")
    run("incremental prepared()", "inc")
    run("render only (static world)", "static")


if __name__ == "__main__":
    main()

"""Profile the config4 render-grid incremental update: host vs device phases.

Times, per 128-chunk step: set_chunks (host numpy incl. palettes), grid()
split into window-meta/global-planes (host) and the dirty-row device
scatters. Run on TPU (default backend)."""
import sys
import time

import numpy as np

from voxelraytracing_tpu.resources.packs import Resources, builtin_respack_path
from voxelraytracing_tpu.worldgen import WorldGen
from voxelraytracing_tpu.world.render_grid import RenderGrid3Builder

def _p(msg):
    print(f"[{time.perf_counter():8.1f}] {msg}", flush=True)


_p("loading resources")
res = Resources.load_from(builtin_respack_path())
dp, sp = res.datapacks["terra"], res.stylepacks["terra"]
gen = WorldGen.from_datapack(dp, seed=1)
mats = sp.material_table(dp.voxels)

if "--phase1-first" in sys.argv:
    import jax.numpy as jnp
    from voxelraytracing_tpu.ops.svo_build import build_chunk_svo_batch

    _p("phase1: 10s of device SVO rebuild dispatches")

    def step1(offset):
        pos = [(offset + i, 1, j) for i in range(16) for j in range(8)]
        grids1, _ = gen.generate_chunks(pos)
        nodes, counts = build_chunk_svo_batch(jnp.asarray(grids1))
        return counts

    step1(0)
    t0 = time.perf_counter()
    off = 0
    n1 = 0
    while time.perf_counter() - t0 < 10.0:
        off += 1
        step1(off)
        n1 += 128
    _p(f"phase1 done: {n1/(time.perf_counter()-t0):.1f} chunks/s")

w = 30
batch = 128
b = RenderGrid3Builder(w, mats)
pos0 = [(i, 1, j) for i in range(16) for j in range(8)]
_p("generating chunks")
grids, _ = gen.generate_chunks(pos0)
grids = np.asarray(grids)
cells = [(i % w, 1, (i // 16) % w) for i in range(batch)]
_p("warm set_chunks")
b.set_chunks(cells, grids)
_p("warm grid() upload")
g = b.grid()  # warm upload
import jax
jax.block_until_ready(g.sw_solid)
_p("warm done")

t_set = t_grid = 0.0
n_steps = 8
col = 0
t00 = time.perf_counter()
for s in range(n_steps):
    col = (col + 2) % (w - 2)
    cells = [((col + i) % w, 1, j % w) for i in range(16) for j in range(8)]
    t0 = time.perf_counter()
    b.set_chunks(cells, grids)
    t1 = time.perf_counter()
    g = b.grid()
    t2 = time.perf_counter()
    t_set += t1 - t0
    t_grid += t2 - t1
    _p(f"step {s}: set={1e3*(t1-t0):.0f}ms grid={1e3*(t2-t1):.0f}ms")
jax.block_until_ready(g.sw_solid)
t_all = time.perf_counter() - t00
print(f"steps={n_steps} batch={batch}")
print(f"set_chunks : {t_set/n_steps*1e3:8.1f} ms/step")
print(f"grid()     : {t_grid/n_steps*1e3:8.1f} ms/step")
print(f"total      : {t_all/n_steps*1e3:8.1f} ms/step "
      f"-> {batch*n_steps/t_all:.1f} chunks/s")

# Phase-order sensitivity: when run with --phase1-first, a 10 s
# build_chunk_svo_batch dispatch loop (config4 phase 1) precedes the
# update loop — isolating whether sustained device dispatch degrades the
# later scatter path (the config4-in-one-process regression).

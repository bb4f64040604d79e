import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from voxelraytracing_tpu.world.demo import demo_chunk_grids, demo_materials
from voxelraytracing_tpu.ops import noise
from voxelraytracing_tpu.ops import wavefront as WF
W = 8
perm = jnp.asarray(noise.make_permutation(7))
grids, cells = demo_chunk_grids(perm, jnp.zeros(3, jnp.int32), W, jnp.float32(W*32*0.45), jnp.int32(int(W*32*0.28)))
mats = demo_materials()
t0 = time.time()
rgrid = WF.build_render_grid(grids, cells, np.zeros(3, np.int32), W, mats)
jax.block_until_ready(rgrid.bricks)
print("build:", time.time()-t0, flush=True)
np.savez("/tmp/rgrid_w8.npz", bwin=np.asarray(rgrid.bwin), lwin=np.asarray(rgrid.lwin),
         brick_dir=np.asarray(rgrid.brick_dir), bricks=np.asarray(rgrid.bricks),
         world_min=np.asarray(rgrid.world_min), to_pack=np.asarray(rgrid.to_pack),
         n_liquid=np.asarray(rgrid.n_liquid), size_voxels=rgrid.size_voxels)
print("saved", flush=True)

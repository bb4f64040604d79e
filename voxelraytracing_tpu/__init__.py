"""voxelraytracing_tpu — a TPU-native sparse-voxel ray-tracing engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
voxel engine (MasonFeurer/VoxelRayTracing): an infinite world of 32³-voxel
chunks stored as flat, pointer-free sparse-voxel-octree node arrays in HBM,
rendered by per-pixel DDA/octree traversal kernels — no triangle meshes —
with data-driven world generation, a client/server streaming layer, and
multi-device scaling via ``jax.sharding``.

Layout:
  core/       node format, octree functional spec, coordinates, host geometry
  ops/        device compute: noise, SVO build, traversal, tracers, sky, camera
  models/     renderer + worldgen model families (user-facing)
  world/      node pool, scrolling chunk grid, client/server world state
  resources/  RON/JSON datapacks, stylepacks, standard resource pack
  engine/     network protocol, server, client game state, player, persistence
  parallel/   device-mesh sharded rendering
  utils/      timers, debug tooling
"""

__version__ = "0.1.0"

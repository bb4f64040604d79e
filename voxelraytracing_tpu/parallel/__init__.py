"""Multi-device rendering over a jax.sharding mesh."""

from .render import ShardedRayTracer, make_mesh, sharded_accumulate_step

__all__ = ["ShardedRayTracer", "make_mesh", "sharded_accumulate_step"]

"""Procedural sky: horizon/void gradient plus a sun disc.

Exact re-expression of the reference sky model (ray_tracer.wgsl:144-157):
a smoothstep blend from a void color below the horizon through a horizon
gradient into the sky color, and a hard sun disc where the ray direction is
within ``1 - 0.01`` of the sun direction above the horizon.
"""

import jax.numpy as jnp

HORIZON_COLOR = (1.0, 0.3, 0.0)
VOID_COLOR = (0.03, 0.03, 0.03)
SUN_SIZE = 0.01


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def ray_sky(dirs, origin, sky_color, sun_pos, sun_intensity, world_min):
    """Sky radiance for rays ``dirs`` (f32[...,3]) from world-local ``origin``.

    ``sun_pos`` is a world-coordinate position; the sun direction is computed
    per the reference as ``normalize(sun_pos - world_min - origin)``
    (ray_tracer.wgsl:152).
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    y = dirs[..., 1]
    ground_to_sky = smoothstep(-0.01, 0.0, y)
    gradient_t = smoothstep(0.0, 0.4, y) ** 0.35
    horizon = jnp.asarray(HORIZON_COLOR, jnp.float32)
    void = jnp.asarray(VOID_COLOR, jnp.float32)
    sky_color = jnp.asarray(sky_color, jnp.float32)
    gradient = horizon + (sky_color - horizon) * gradient_t[..., None]

    sun_vec = (
        jnp.asarray(sun_pos, jnp.float32)
        - jnp.asarray(world_min, jnp.float32)
        - jnp.asarray(origin, jnp.float32)
    )
    sun_dir = sun_vec / jnp.linalg.norm(sun_vec, axis=-1, keepdims=True)
    sun = (
        (jnp.sum(dirs * sun_dir, axis=-1) > (1.0 - SUN_SIZE))
        & (ground_to_sky >= 1.0)
    ).astype(jnp.float32)

    base = void + (gradient - void) * ground_to_sky[..., None]
    return base + (sun * sun_intensity)[..., None]

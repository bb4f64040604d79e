"""Progressive path tracer with emissive materials and sky light.

The reference ships a path-tracing kernel that is never dispatched and
reads a stale node format (path_tracer.wgsl, SURVEY §2.4) — its material
model (emission, diffuse/specular scatter mix) exists only as dead code.
This module finishes that capability the TPU way: a **wavefront** bounce
loop — a fixed number of whole-frame trace passes with structure-of-arrays
ray state — instead of a per-thread recursive loop, with counter-based
`jax.random` keys per (pixel, sample) so accumulation is deterministic and
order-independent.

Per bounce (semantics of path_tracer.wgsl:149-194, completed):
  * trace all active rays; on hit: ``incoming += emission * color_so_far``,
    ``color_so_far *= albedo``; next direction mixes the specular reflection
    with a cosine-weighted scatter by the material's ``scatter`` factor.
  * on miss: ``incoming += sky * color_so_far`` and the ray retires.
  * liquid path segments attenuate by Beer–Lambert absorption toward the
    material's water tint (the physically-based version of the primary
    tracer's screen-space water overlay).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import MAX_PATH_STEPS, RAY_EPS
from ..ops.camera import generate_rays_raw
from ..ops.materials import MaterialTable
from ..ops.sky import ray_sky
from ..ops.traverse import WorldSlice, trace_rays

# per-voxel-length; a plain tuple — a module-level jnp array would
# initialize the default backend at import time (hangs when the device
# tunnel is broken) and bake a device constant into every jit
WATER_ABSORB = (0.35, 0.08, 0.04)


def _diffuse_dir(key, norm):
    """Cosine-ish scatter: normalize(norm + random unit vector)
    (path_tracer.wgsl:186-189)."""
    v = jax.random.normal(key, norm.shape, dtype=jnp.float32)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    d = norm + v
    # degenerate (v == -norm): fall back to the normal
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.where(n > 1e-6, d / jnp.maximum(n, 1e-6), norm)


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


class PathTracer:
    """Wavefront path tracer over a WorldSlice."""

    def __init__(self, materials: MaterialTable, max_bounces=3, max_steps=MAX_PATH_STEPS):
        self.materials = materials
        self.max_bounces = int(max_bounces)
        self.max_steps = int(max_steps)
        self._render = jax.jit(
            self._render_impl, static_argnames=("width", "height", "samples")
        )

    def _render_impl(
        self,
        nodes,
        chunk_roots,
        world_min,
        inv_view,
        inv_proj,
        cam_pos,
        sky_color,
        sun_pos,
        sun_intensity,
        key,
        *,
        width,
        height,
        samples,
    ):
        world = WorldSlice(nodes=nodes, chunk_roots=chunk_roots, world_min=world_min)
        mats = self.materials
        m_emission = jnp.asarray(mats.emission)
        m_color = jnp.asarray(mats.color)
        m_scatter = jnp.asarray(mats.scatter)
        origin0, dirs0 = generate_rays_raw(
            inv_view, inv_proj, cam_pos, width, height, world_min
        )

        def one_sample(sample_key):
            shape = dirs0.shape[:-1]
            origin = jnp.broadcast_to(origin0, dirs0.shape)
            dirs = dirs0
            color = jnp.ones(shape + (3,), jnp.float32)  # throughput
            light = jnp.zeros(shape + (3,), jnp.float32)
            alive = jnp.ones(shape, bool)

            for bounce in range(self.max_bounces + 1):
                rs = trace_rays(world, mats.is_liquid, origin, dirs, self.max_steps)

                # liquid absorption along this segment
                absorb = jnp.exp(
                    -rs.water_dist[..., None]
                    * jnp.asarray(WATER_ABSORB, jnp.float32)
                )
                color = color * jnp.where(alive[..., None], absorb, 1.0)

                # miss -> sky light, retire
                sky = ray_sky(dirs, origin, sky_color, sun_pos, sun_intensity, world_min)
                miss = alive & ~rs.hit
                light = light + jnp.where(miss[..., None], color * sky, 0.0)

                hit = alive & rs.hit
                emis = m_emission[rs.voxel][..., None]
                albedo = m_color[rs.voxel]
                light = light + jnp.where(hit[..., None], color * emis * albedo, 0.0)
                color = jnp.where(hit[..., None], color * albedo, color)
                alive = hit

                if bounce == self.max_bounces:
                    break

                # next ray: offset off the surface, mix diffuse/specular
                bkey = jax.random.fold_in(sample_key, bounce)
                norm = rs.norm
                # camera-inside-voxel etc.: zero normal -> bounce straight back
                degenerate = jnp.all(norm == 0.0, axis=-1, keepdims=True)
                norm = jnp.where(degenerate, -dirs, norm)
                diff = _diffuse_dir(bkey, norm)
                spec = _reflect(dirs, norm)
                scat = m_scatter[rs.voxel][..., None]
                nd = diff * scat + spec * (1.0 - scat)
                # guarded normalize: a zero-length mix must not divide by 0
                # (Infs permanently degrade the TPU — see ops/wavefront.py)
                nn = jnp.linalg.norm(nd, axis=-1, keepdims=True)
                nd = jnp.where(nn > 1e-6, nd / jnp.maximum(nn, 1e-6), norm)
                origin = rs.pos + norm * (4.0 * RAY_EPS)
                dirs = nd

            return light

        keys = jax.random.split(key, samples)
        acc = jnp.zeros(dirs0.shape[:-1] + (3,), jnp.float32)
        for s in range(samples):
            acc = acc + one_sample(keys[s])
        return acc / samples

    def render(
        self, world: WorldSlice, cam, settings=None, samples=1, key=None
    ):
        from .raytracer import RenderSettings

        s = settings or RenderSettings()
        key = key if key is not None else jax.random.PRNGKey(0)
        w, h = cam.proj_size
        return self._render(
            world.nodes,
            world.chunk_roots,
            jnp.asarray(world.world_min, jnp.int32),
            jnp.asarray(cam.inv_view),
            jnp.asarray(cam.inv_proj),
            jnp.asarray(cam.pos),
            jnp.asarray(s.sky_color, jnp.float32),
            jnp.asarray(s.sun_pos, jnp.float32),
            jnp.asarray(s.sun_intensity, jnp.float32),
            key,
            width=w,
            height=h,
            samples=int(samples),
        )


def accumulate(frames):
    """Temporal accumulation of progressive sample frames."""
    return jnp.mean(jnp.stack(frames), axis=0)

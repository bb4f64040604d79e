"""Multi-device rendering: pixel-grid and sample sharding over a device mesh.

The reference scales by giving every pixel its own GPU thread
(SURVEY §2.7 P1/P6). On a TPU slice the same two axes of parallelism are
expressed with ``jax.sharding`` + ``shard_map``:

  * **rays** ("dp"): the image's row dimension is sharded across devices —
    each chip traces a horizontal band of the frame against its (replicated)
    node pool. No communication at all until the final frame gather.
  * **samples** ("sp"): independent path-trace/temporal samples are sharded;
    accumulation is one ``psum`` over the sample axis — the direct analog of
    the reference's progressive accumulation, ridden over ICI.

The node pool is replicated per device (a 30³-chunk window is ≲2 GB worst
case and far less in practice, SURVEY §6 — it fits in HBM comfortably), so
collectives only touch *radiance*, never world data.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.camera import generate_rays_raw
from ..ops.traverse import WorldSlice, trace_rays
from ..models.raytracer import shade_hits


def make_mesh(n_samples=1, n_rays=None, devices=None):
    """Build a ``(samples, rays)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_rays is None:
        n_rays = len(devices) // n_samples
    devices = np.asarray(devices[: n_samples * n_rays]).reshape(n_samples, n_rays)
    return Mesh(devices, ("samples", "rays"))


class ShardedRayTracer:
    """Primary-ray renderer with the pixel grid sharded over a mesh's
    ``rays`` axis.

    Single jitted program: XLA SPMD-partitions the whole march along the row
    dimension; world buffers are replicated, the output image is sharded.
    """

    def __init__(self, materials, mesh, max_steps=None, shadows=False):
        from ..core.constants import MAX_RAY_STEPS

        self.materials = materials
        self.mesh = mesh
        self.max_steps = int(max_steps or MAX_RAY_STEPS)
        self.shadows = bool(shadows)
        self._render = jax.jit(self._render_impl, static_argnames=("width", "height"))

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
        *,
        width,
        height,
    ):
        world = WorldSlice(nodes=nodes, chunk_roots=chunk_roots, world_min=world_min)
        origin, dirs = generate_rays_raw(
            inv_view, inv_proj, cam_pos, width, height, world_min
        )
        dirs = jax.lax.with_sharding_constraint(
            dirs, NamedSharding(self.mesh, P("rays", None, None))
        )
        rs = trace_rays(world, self.materials.is_liquid, origin, dirs, self.max_steps)
        img = shade_hits(
            rs, dirs, origin, self.materials, sky_color, sun_pos, sun_intensity,
            world_min, max_steps=self.max_steps,
        )
        return jax.lax.with_sharding_constraint(
            img, NamedSharding(self.mesh, P("rays", None, None))
        )

    def render(self, world: WorldSlice, cam, settings=None):
        from ..models.raytracer import RenderSettings

        s = settings or RenderSettings()
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
            width=w,
            height=h,
        )


def sharded_accumulate_step(mesh, materials, width, band_height, max_steps=64):
    """Build a shard_map'd full frame step: trace a band per `rays`-shard with a
    per-`samples`-shard jittered camera, then ``psum``-average over samples.

    This is the engine's multi-chip "training step": worldgen output (a batch
    of chunk node arrays) goes in, an accumulated frame comes out, with the
    sample reduction riding ICI. Returns ``step(nodes, chunk_roots, world_min,
    inv_view, inv_proj, cam_pos, jitter_scale) -> f32[band*n_rays, width, 3]``.
    """
    try:
        from jax import shard_map
        check_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}

    n_samples = mesh.shape["samples"]
    n_rays = mesh.shape["rays"]
    full_h = band_height * n_rays

    def local_step(nodes, chunk_roots, world_min, inv_view, inv_proj, cam_pos, jitter):
        sid = jax.lax.axis_index("samples")
        rid = jax.lax.axis_index("rays")
        # Deterministic per-sample sub-pixel jitter: sample s looks through a
        # slightly shifted camera (temporal-accumulation analog).
        eps = (sid.astype(jnp.float32) / jnp.float32(max(n_samples, 1))) * jitter
        cam_pos = cam_pos + eps
        world = WorldSlice(
            nodes=nodes, chunk_roots=chunk_roots, world_min=world_min
        )
        origin, dirs = generate_rays_raw(
            inv_view, inv_proj, cam_pos, width, band_height, world_min,
            y0=rid * band_height, full_height=full_h,
        )
        rs = trace_rays(world, materials.is_liquid, origin, dirs, max_steps)
        img = shade_hits(
            rs, dirs, origin, materials,
            jnp.asarray((0.81, 0.93, 1.0), jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.float32(4.0), world_min,
            max_steps=max_steps,
        )
        acc = jax.lax.psum(img, "samples") / jnp.float32(n_samples)
        return acc

    return jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=P("rays", None, None),
            **check_kw,
        )
    )


def sharded_render_frame3(mesh, rg3, cam, materials_color, settings=None,
                          rounds=12):
    """Band-sharded fused v3 frame: each device on the mesh's ``rays`` axis
    traces+shades its horizontal band through ops/wavefront3._render_frame
    (its own Pallas programs), with world tables replicated — the flagship
    pipeline under SPMD. Returns ``uint32[H, W]`` packed RGBA8 sharded over
    rows.
    """
    try:
        from jax import shard_map
        check_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}

    from ..models.raytracer import RenderSettings
    from ..ops.wavefront3 import _render_frame, color_lut_rows

    s = settings or RenderSettings()
    width, height = cam.proj_size
    n_rays = mesh.shape["rays"]
    assert height % (n_rays * 8) == 0, (height, n_rays)
    band_h = height // n_rays
    lut = color_lut_rows(materials_color)
    wm = jnp.asarray(rg3.world_min, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm
    sun_local = jnp.asarray(s.sun_pos, jnp.float32) - wm
    # interpret-mode decision follows the MESH's devices, not the default
    # backend (a CPU fallback mesh can coexist with a live TPU default)
    interpret = mesh.devices.reshape(-1)[0].platform != "tpu"
    v = int(rg3.size_voxels)

    tables = (rg3.gw_jump, rg3.gw_liq, rg3.wmeta, rg3.sw_meta, rg3.sw_solid,
              rg3.sw_liq, rg3.sw_pid, rg3.brick_dir, rg3.bricks, rg3.to_pack)

    def band(*tabs):
        y0 = jax.lax.axis_index("rays").astype(jnp.float32) * band_h
        img, _ = _render_frame(
            *tabs, origin,
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32), lut,
            jnp.asarray(s.sky_color, jnp.float32), sun_local,
            jnp.float32(s.sun_intensity), jnp.float32(s.shadow_ambient),
            width=width, height=band_h, rounds=rounds,
            sub_rounds=16, sub_steps=8, v=v, interpret=interpret,
            shadows=bool(s.shadows), show_steps=False,
            full_height=height, y0=y0,
        )
        return img

    fn = shard_map(
        band, mesh=mesh,
        in_specs=tuple(P() for _ in tables),
        out_specs=P("rays", None),
        **check_kw,
    )
    return jax.jit(fn)(*tables)


def sharded_render_frame4(mesh, rg3, cam, materials_color, settings=None,
                          rounds=64):
    """Band-sharded fused v4 frame: like :func:`sharded_render_frame3`,
    but each device's band marches through the self-serving kernel
    (ops/wavefront4.py) — one launch per band per pass, in-kernel DMA
    service, world tables replicated. Returns ``uint32[H, W]`` packed
    RGBA8 sharded over rows."""
    try:
        from jax import shard_map
        check_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}

    from ..models.raytracer import RenderSettings
    from ..ops.wavefront3 import color_lut_rows
    from ..ops.wavefront4 import _render_frame4

    s = settings or RenderSettings()
    width, height = cam.proj_size
    n_rays = mesh.shape["rays"]
    assert height % (n_rays * 8) == 0, (height, n_rays)
    band_h = height // n_rays
    lut = color_lut_rows(materials_color)
    wm = jnp.asarray(rg3.world_min, jnp.float32)
    origin = jnp.asarray(cam.pos, jnp.float32) - wm
    sun_local = jnp.asarray(s.sun_pos, jnp.float32) - wm
    interpret = mesh.devices.reshape(-1)[0].platform != "tpu"
    v = int(rg3.size_voxels)

    tables = (rg3.gw_jump, rg3.gw_liq, rg3.wmeta, rg3.sw_meta, rg3.sw_solid,
              rg3.sw_liq, rg3.sw_pid)

    def band(*tabs):
        y0 = jax.lax.axis_index("rays").astype(jnp.float32) * band_h
        img, _ = _render_frame4(
            *tabs, origin,
            jnp.asarray(cam.inv_view, jnp.float32),
            jnp.asarray(cam.inv_proj, jnp.float32), lut,
            jnp.asarray(s.sky_color, jnp.float32), sun_local,
            jnp.float32(s.sun_intensity), jnp.float32(s.shadow_ambient),
            width=width, height=band_h, rounds=rounds,
            sub_rounds=16, sub_steps=8, v=v, interpret=interpret,
            shadows=bool(s.shadows), show_steps=False,
            full_height=height, y0=y0,
        )
        return img

    fn = shard_map(
        band, mesh=mesh,
        in_specs=tuple(P() for _ in tables),
        out_specs=P("rays", None),
        **check_kw,
    )
    return jax.jit(fn)(*tables)

"""Camera model: inverse view/projection matrices and per-pixel ray generation.

Matches the reference pipeline exactly: the host builds an inverse view matrix
``T(eye) · Rx(pitch) · Ry(-yaw) · Rz(roll)`` and an inverted right-handed
perspective matrix (clientdesktop/src/graphics/mod.rs:92-110), and the kernel
unprojects each pixel with *row-vector* products, i.e. ``v · M ≡ Mᵀ v``
(ray_tracer.wgsl:159-171).
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def _translation(t):
    m = np.eye(4, dtype=np.float64)
    m[:3, 3] = t
    return m


def _perspective_rh(fov_y, aspect, z_near, z_far):
    """Right-handed, zero-to-one depth — glam's ``Mat4::perspective_rh``."""
    h = np.cos(0.5 * fov_y) / np.sin(0.5 * fov_y)
    w = h / aspect
    r = z_far / (z_near - z_far)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = r
    m[2, 3] = r * z_near
    m[3, 2] = -1.0
    return m


@dataclass(frozen=True)
class CamData:
    """Everything the tracer needs about the camera (one frame)."""

    pos: np.ndarray  # f32[3] — eye position, world coordinates
    inv_view: np.ndarray  # f32[4,4]
    inv_proj: np.ndarray  # f32[4,4]
    proj_size: tuple  # (width, height) in pixels

    @classmethod
    def create(cls, rot_deg, eye, fov_deg, proj_size):
        """rot_deg = (pitch, yaw, roll) in degrees; mirrors CamData::create
        (clientdesktop/src/graphics/mod.rs:93-110)."""
        rot = np.deg2rad(np.asarray(rot_deg, dtype=np.float64))
        inv_view = (
            _translation(np.asarray(eye, dtype=np.float64))
            @ _rot_x(rot[0])
            @ _rot_y(-rot[1])
            @ _rot_z(rot[2])
        )
        aspect = proj_size[0] / proj_size[1]
        inv_proj = np.linalg.inv(
            _perspective_rh(np.deg2rad(fov_deg), aspect, 0.001, 1000.0)
        )
        return cls(
            pos=np.asarray(eye, dtype=np.float32),
            inv_view=inv_view.astype(np.float32),
            inv_proj=inv_proj.astype(np.float32),
            proj_size=(int(proj_size[0]), int(proj_size[1])),
        )


def generate_rays_raw(
    inv_view, inv_proj, cam_pos, width, height, world_min, y0=0, full_height=None
):
    """Per-pixel primary rays, world-local coordinates.

    Returns ``(origin f32[3], dirs f32[H, W, 3])``; the origin is shared by
    every pixel (ray_tracer.wgsl:159-171). Runs in jnp so it can fold into the
    jitted frame pipeline. ``width``/``height`` must be static under jit.

    ``y0``/``full_height`` select a horizontal band of a taller frame —
    how a device renders its row block when the pixel grid is sharded
    (``parallel/``): band ``i`` of ``n`` is ``y0=i*height, full_height=n*height``.
    """
    w, h = width, height
    fh = full_height if full_height is not None else h
    px = jnp.arange(w, dtype=jnp.float32)
    py = jnp.arange(h, dtype=jnp.float32) + jnp.float32(y0)
    x = (px * 2.0) / w - 1.0
    y = (py * 2.0) / fh - 1.0
    xg, yg = jnp.meshgrid(x, y)  # [H, W]

    clip = jnp.stack(
        [xg, -yg, -jnp.ones_like(xg), jnp.ones_like(xg)], axis=-1
    )  # [H, W, 4]
    inv_proj = jnp.asarray(inv_proj)
    inv_view = jnp.asarray(inv_view)

    def row_vec_mul(v, m):
        # v · M as explicit f32 multiply-adds in fixed order: on TPU a plain
        # ``@`` would route these 4-vectors through the MXU at bf16 input
        # precision, costing ~1e-3 of ray-direction accuracy.
        return ((v[..., 0, None] * m[0] + v[..., 1, None] * m[1])
                + (v[..., 2, None] * m[2] + v[..., 3, None] * m[3]))

    eye0 = row_vec_mul(clip, inv_proj)
    eye = jnp.concatenate(
        [eye0[..., :2], -jnp.ones_like(eye0[..., :1]), jnp.zeros_like(eye0[..., :1])],
        axis=-1,
    )
    d = row_vec_mul(eye, inv_view)[..., :3]
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    origin = jnp.asarray(cam_pos) - jnp.asarray(world_min, dtype=jnp.float32)
    return origin, dirs


def generate_rays(cam: CamData, world_min):
    """Convenience wrapper over :func:`generate_rays_raw` for a CamData."""
    w, h = cam.proj_size
    return generate_rays_raw(cam.inv_view, cam.inv_proj, cam.pos, w, h, world_min)

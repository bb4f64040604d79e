"""Independent scalar-Python oracle for the ray tracer.

A deliberately separate, per-ray transliteration of the traversal semantics
(reference: clientdesktop/src/graphics/ray_tracer.wgsl) in plain NumPy
float32. The production jnp tracer is property-tested pixel-by-pixel against
this. Slow by design — tests only.
"""

import numpy as np

SPLIT_MASK = 0x8000
DATA_MASK = 0x7FFF
EPS = np.float32(0.001)
BIG = np.float32(1e30)


def f32(x):
    return np.asarray(x, dtype=np.float32)


def _row_vec_mul(v, m):
    # matches the production kernel's fixed multiply-add order
    return (v[0] * m[0] + v[1] * m[1]) + (v[2] * m[2] + v[3] * m[3])


def scalar_ray_dir(px, py, width, height, inv_proj, inv_view):
    x = np.float32(px * 2.0) / np.float32(width) - np.float32(1.0)
    y = np.float32(py * 2.0) / np.float32(height) - np.float32(1.0)
    clip = f32([x, -y, -1.0, 1.0])
    e0 = _row_vec_mul(clip, f32(inv_proj))
    eye = f32([e0[0], e0[1], -1.0, 0.0])
    d = _row_vec_mul(eye, f32(inv_view))[:3]
    return d / np.float32(np.sqrt(np.sum(d * d)))


def find_node(nodes, roots, w, pos):
    cc = np.floor(pos / np.float32(32.0)).astype(np.int64)
    chunk_idx = cc[0] + cc[1] * w + cc[2] * w * w
    root = int(roots[chunk_idx])
    center = cc.astype(np.float32) * np.float32(32.0) + np.float32(16.0)
    size = np.float32(32.0)
    idx = 0
    depth = 0
    while True:
        node = int(nodes[root + idx])
        if (node & SPLIT_MASK) == 0 or depth == 5:
            half = size * np.float32(0.5)
            return node, center - half, center + half
        size = size * np.float32(0.5)
        gt = (pos >= center).astype(np.int64)
        child = gt[0] | (gt[1] << 1) | (gt[2] << 2)
        idx = (node & DATA_MASK) + child
        center = center + np.float32(size * 0.5) * (gt * 2 - 1).astype(np.float32)
        depth += 1


def trace_one(nodes, roots, w, origin, direction, is_liquid, max_steps=500):
    d = f32(direction)
    mask = (d >= 0).astype(np.float32)
    imask = np.float32(1.0) - mask
    pos = f32(origin).copy()
    world_size = np.float32(w * 32.0)

    out = dict(
        hit=False,
        voxel=0,
        norm=np.zeros(3, np.float32),
        pos=np.zeros(3, np.float32),
        water_dist=np.float32(0.0),
        steps=0,
    )

    if np.any(pos - np.floor(pos) < EPS):
        pos = pos + EPS * d
    if np.any(pos <= 0.0) or np.any(pos >= world_size):
        return out

    with np.errstate(divide="ignore", invalid="ignore"):
        unit = np.sqrt(
            f32(
                [
                    1.0 + (d[1] / d[0]) ** 2 + (d[2] / d[0]) ** 2,
                    1.0 + (d[0] / d[1]) ** 2 + (d[2] / d[1]) ** 2,
                    1.0 + (d[0] / d[2]) ** 2 + (d[1] / d[2]) ** 2,
                ]
            )
        )
    unit = np.where(np.isfinite(unit), unit, BIG).astype(np.float32)

    voxel = 0
    norm = np.zeros(3, np.float32)
    entered_water = np.float32(-1.0)
    total_len = np.float32(0.0)
    iters = 0
    hit = False
    while iters < max_steps:
        iters += 1
        node, bmin, bmax = find_node(nodes, roots, w, pos)
        voxel = node & DATA_MASK
        liq = bool(is_liquid[voxel])
        if voxel != 0 and not liq:
            hit = True
            break
        if not liq and entered_water != -1.0:
            out["water_dist"] += total_len - entered_water
            entered_water = np.float32(-1.0)
        if liq and entered_water == -1.0:
            entered_water = total_len

        axis = ((pos - bmin) * imask + (bmax - pos) * mask) * unit
        ax, ay, az = axis
        if ax == 0.0:
            if ay == 0.0:
                step = az
            elif az == 0.0:
                step = ay
            else:
                step = min(ay, az)
        else:
            if ay == 0.0:
                step = ax if az == 0.0 else min(ax, az)
            else:
                step = min(ay, ax) if az == 0.0 else min(ax, min(ay, az))
        step = np.float32(step)
        total_len = total_len + step
        stepped = (step == axis).astype(np.float32)
        norm = stepped * -np.sign(d)
        pos = pos + d * (step + EPS) * stepped + d * step * (np.float32(1.0) - stepped)
        if np.any(pos < 0.0) or np.any(pos >= world_size):
            if entered_water != -1.0:
                out["water_dist"] += total_len - entered_water
            out["steps"] = iters
            return out

    # hit, or ran out of steps (the reference treats both as a hit)
    out["hit"] = True
    out["voxel"] = int(voxel)
    out["norm"] = norm
    out["pos"] = pos
    out["steps"] = iters
    if entered_water != -1.0:
        out["water_dist"] += total_len - entered_water
    return out

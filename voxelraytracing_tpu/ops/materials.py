"""Per-voxel shading LUTs.

Voxel styles compile into structure-of-arrays material tables resident in
HBM — the analog of the reference's ``Material`` storage buffer built by
``Material::construct_arr`` (clientdesktop/src/graphics/mod.rs:20-60), widened
with the path-tracer material fields the reference declared but never wired
up (path_tracer.wgsl:23-32).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MaterialTable(NamedTuple):
    color: jax.Array  # f32[V, 3]
    is_empty: jax.Array  # bool[V] — gas voxels
    is_liquid: jax.Array  # bool[V]
    scatter: jax.Array  # f32[V] — 1 = fully diffuse, 0 = mirror
    emission: jax.Array  # f32[V] — emitted radiance scale (path tracer)

    @property
    def n_voxels(self):
        return self.color.shape[0]


def make_material_table(n_voxels, styles):
    """Build a MaterialTable from ``{voxel_id: style}``.

    ``styles`` values need ``color`` (3-seq), ``state`` (one of "solid",
    "liquid", "gas"), and optionally ``scatter`` / ``emission`` attributes or
    keys. Unstyled ids get the zero material, like the reference's
    ``Material::ZERO`` fallback (graphics/mod.rs:29-36, 49-60).
    """
    color = np.zeros((n_voxels, 3), dtype=np.float32)
    is_empty = np.zeros(n_voxels, dtype=bool)
    is_liquid = np.zeros(n_voxels, dtype=bool)
    scatter = np.zeros(n_voxels, dtype=np.float32)
    emission = np.zeros(n_voxels, dtype=np.float32)
    is_empty[:] = False
    for vid, style in styles.items():
        if vid >= n_voxels:
            continue

        def get(key, default):
            if isinstance(style, dict):
                v = style.get(key, default)
            else:
                v = getattr(style, key, default)
            return default if v is None else v

        color[vid] = np.asarray(get("color", (0.0, 0.0, 0.0)), dtype=np.float32)
        state = get("state", "solid")
        is_empty[vid] = state == "gas"
        is_liquid[vid] = state == "liquid"
        scatter[vid] = float(get("scatter", 1.0))
        emission[vid] = float(get("emission", 0.0))
    # Deliberately HOST (NumPy) arrays: consumers read them both on host
    # (render-id maps, solidity checks) and in jitted code (where JAX
    # uploads them as arguments). Keeping them on device would force
    # device->host transfers on the host paths — and any D2H permanently
    # degrades the TPU process (see ops/wavefront.py).
    return MaterialTable(
        color=color,
        is_empty=is_empty,
        is_liquid=is_liquid,
        scatter=scatter,
        emission=emission,
    )

"""Batched on-device terrain generation.

The reference generates chunks one column at a time through ``set_node``
mutation on builder threads (server/src/world/gen.rs:171-286). Here a whole
*batch* of chunks becomes one tensor program: noise fields evaluate as
``[B, 32, 32]`` maps, the biome comes from a gather on the 8×20 lookup table
(gen.rs:152-165), biome layer stacks fill columns via a gather on a padded
per-biome layer table (gen.rs:204-226), sea-level water fills the remainder
(gen.rs:227-236), and vegetation peaks fall out of an 8-neighbor
strict-maximum test on a halo-extended feature-noise map (gen.rs:242-261).
The dense grids then feed the functional SVO builder
(``ops/svo_build.build_chunk_svo_batch``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import CHUNK_SIZE
from ..resources.packs import WorldPresetCfg
from ..ops import noise
from .fields import CompiledMap, SeedChain, ValueField


class TerrainGen:
    """Compiled preset: value fields + device-side biome/layer tables."""

    def __init__(self, preset: WorldPresetCfg, seed):
        chain = SeedChain(seed)
        self.preset = preset
        self.seed = int(seed)
        # Declaration order fixes the seed chain (gen.rs:96-122).
        self.height = ValueField(preset.height, chain)
        self.temp = ValueField(preset.temp, chain)
        self.humidity = ValueField(preset.humidity, chain)
        self.weirdness = ValueField(preset.weirdness, chain)
        self.vegetation_perm = noise.make_permutation(chain.next())
        self.feat_map = CompiledMap(
            perm=noise.make_permutation(chain.next()), freq=0.15, scale=1.0, offset=0.0
        )

        self.sea_level = int(preset.sea_level)
        self.earth = int(preset.earth)
        self.water = int(preset.water)
        self.biome_lookup = jnp.asarray(preset.biome_lookup, jnp.int32)  # [8, 20]

        n_biomes = len(preset.biomes)
        max_layers = max((len(b.layers) for b in preset.biomes), default=0) or 1
        layers = np.full((n_biomes, max_layers), self.earth, dtype=np.int32)
        layer_len = np.zeros(n_biomes, dtype=np.int32)
        veg = np.zeros((n_biomes, 3), dtype=np.float32)
        for i, b in enumerate(preset.biomes):
            layer_len[i] = len(b.layers)
            layers[i, : len(b.layers)] = b.layers
            veg[i] = (b.vegetation.freq, b.vegetation.scale, b.vegetation.offset)
        self.layer_table = jnp.asarray(layers)
        self.layer_len = jnp.asarray(layer_len)
        self.veg_params = jnp.asarray(veg)

        self._generate = jax.jit(self._generate_impl)

    # -------------------------------------------------- field evaluation

    def biome_index(self, pos2d):
        """Biome id for world-space (x, z) samples (gen.rs:152-165)."""
        temp = self.temp(pos2d)
        humidity = self.humidity(pos2d)
        weird = self.weirdness(pos2d)
        temp_idx = jnp.clip(jnp.floor(temp * 20.0).astype(jnp.int32), 0, 19)
        weird_idx = jnp.clip(jnp.round(weird).astype(jnp.int32), 0, 1) * 4
        hum_idx = jnp.clip(jnp.floor(humidity * 4.0).astype(jnp.int32), 0, 3)
        return self.biome_lookup[hum_idx + weird_idx, temp_idx]

    def terrain_height(self, pos2d):
        """Surface height as int32 (truncation like the reference's
        ``as i32``, gen.rs:125-127)."""
        return self.height(pos2d).astype(jnp.int32)

    # -------------------------------------------------- chunk batch

    def _generate_impl(self, chunk_pos):
        """chunk_pos int32[B, 3] -> (grids, aux dict of [B,32,32] maps)."""
        b = chunk_pos.shape[0]
        cs = CHUNK_SIZE
        corner = chunk_pos * cs  # [B, 3] voxel-space min corner

        lx = jnp.arange(cs, dtype=jnp.int32)
        gx = corner[:, 0, None] + lx  # [B, 32]
        gz = corner[:, 2, None] + lx
        # [B, 32(x), 32(z), 2] world-space column positions
        pos2d = jnp.stack(
            jnp.broadcast_arrays(
                gx[:, :, None].astype(jnp.float32),
                gz[:, None, :].astype(jnp.float32),
            ),
            axis=-1,
        )

        h = self.terrain_height(pos2d)  # [B, 32, 32]
        biome = self.biome_index(pos2d)  # [B, 32, 32]

        # Column fill: voxel at depth `layer = h - y` comes from the biome's
        # layer stack, or `earth` below the stack (gen.rs:204-226).
        gy = corner[:, 1, None] + lx  # [B, 32]
        y = gy[:, None, :, None]  # [B, 1, 32(y), 1]
        hh = h[:, :, None, :]  # [B, 32(x), 1, 32(z)]
        bio = biome[:, :, None, :]  # [B, 32, 1, 32]

        layer = hh - y  # depth below surface
        max_l = self.layer_table.shape[1]
        lv = self.layer_table[bio, jnp.clip(layer, 0, max_l - 1)]
        lv = jnp.where(layer >= self.layer_len[bio], self.earth, lv)
        grid = jnp.where(layer >= 0, lv, 0)

        # Sea-level water above the surface (gen.rs:227-236).
        grid = jnp.where((layer < 0) & (y < self.sea_level), self.water, grid)

        # Vegetation: feature-noise strict local peaks (gen.rs:242-261) at
        # columns whose surface lies inside this chunk and at/above sea level.
        halo = jnp.stack(
            jnp.broadcast_arrays(
                (gx[:, :, None] + 0).astype(jnp.float32),
                (gz[:, None, :] + 0).astype(jnp.float32),
            ),
            axis=-1,
        )
        hx = jnp.concatenate(
            [halo[:, :1] - jnp.asarray([1.0, 0.0]), halo, halo[:, -1:] + jnp.asarray([1.0, 0.0])],
            axis=1,
        )
        hxz = jnp.concatenate(
            [hx[:, :, :1] - jnp.asarray([0.0, 1.0]), hx, hx[:, :, -1:] + jnp.asarray([0.0, 1.0])],
            axis=2,
        )  # [B, 34, 34, 2]
        feat = self.feat_map.sample(hxz)  # [B, 34, 34]
        c = feat[:, 1:-1, 1:-1]
        neigh = jnp.stack(
            [
                feat[:, 0:-2, 0:-2], feat[:, 0:-2, 1:-1], feat[:, 0:-2, 2:],
                feat[:, 1:-1, 0:-2],                       feat[:, 1:-1, 2:],
                feat[:, 2:, 0:-2],   feat[:, 2:, 1:-1],   feat[:, 2:, 2:],
            ],
            axis=-1,
        )
        is_peak = jnp.all(c[..., None] > neigh, axis=-1)

        surf_local = hh[:, :, 0, :] - corner[:, 1, None, None]  # h - chunk_y0
        in_chunk = (surf_local >= 0) & (surf_local < cs)
        peak = is_peak & in_chunk & (h >= self.sea_level)

        # Per-column vegetation probability (biome Map over world coords;
        # the reference samples chunk-local coords here, gen.rs:263-268 — a
        # repeating-pattern quirk we do not reproduce).
        vp = self.veg_params[biome]  # [B, 32, 32, 3]
        veg_prob = (
            noise.sample01(jnp.asarray(self.vegetation_perm), pos2d * vp[..., 0:1])
            * vp[..., 1]
            + vp[..., 2]
        )

        return grid.astype(jnp.int32), {
            "height": h,
            "biome": biome,
            "peak": peak,
            "veg_prob": veg_prob,
        }

    def generate_grids(self, chunk_positions):
        """``int32[B,3]`` chunk coords -> dense voxel grids + aux maps.

        Fully jitted; vmapped noise over the batch. The reference's
        buried-chunk single-node shortcut (gen.rs:179-202) is unnecessary —
        uniform grids collapse to one node in the functional SVO build.
        """
        chunk_positions = jnp.asarray(chunk_positions, jnp.int32)
        return self._generate(chunk_positions)

    # -------------------------------------------------- spawn search

    def find_land_near(self, x, z):
        """First sampled land column at/above sea level on a coarse lattice
        around (x, z) (gen.rs:123-150). Returns (x, h, z) or None."""
        gap, steps = 10, 100
        xs = (np.arange(x, x + steps) * gap).astype(np.float32)
        zs = (np.arange(z, z + steps) * gap).astype(np.float32)
        pos = np.stack(np.meshgrid(xs, zs, indexing="ij"), axis=-1)
        h = np.asarray(self.terrain_height(pos))
        hits = np.argwhere(h > self.sea_level)
        if len(hits) == 0:
            xs2 = (np.arange(x - steps, x) * gap).astype(np.float32)
            zs2 = (np.arange(z - steps, z) * gap).astype(np.float32)
            pos = np.stack(np.meshgrid(xs2, zs2, indexing="ij"), axis=-1)
            h = np.asarray(self.terrain_height(pos))
            hits = np.argwhere(h > self.sea_level)
            if len(hits) == 0:
                return None
            i, j = hits[0]
            return int(pos[i, j, 0]), int(h[i, j]), int(pos[i, j, 1])
        i, j = hits[0]
        return int(pos[i, j, 0]), int(h[i, j]), int(pos[i, j, 1])

"""Worldgen tests: determinism, field semantics, features, chunk batches."""

import numpy as np
import pytest

from voxelraytracing_tpu.core.constants import CHUNK_SIZE
from voxelraytracing_tpu.ops.noise import transmute_seed
from voxelraytracing_tpu.resources.packs import Resources, builtin_respack_path
from voxelraytracing_tpu.worldgen import WorldGen
from voxelraytracing_tpu.worldgen.features import build_feature, feature_rng


@pytest.fixture(scope="module")
def pack():
    return Resources.load_from(builtin_respack_path()).datapacks["terra"]


@pytest.fixture(scope="module")
def gen(pack):
    return WorldGen.from_datapack(pack, seed=1234)


def test_transmute_seed_wraps_like_i64():
    s = 2**62
    s2, derived = transmute_seed(s)
    assert s2 == derived
    assert -(2**63) <= s2 < 2**63
    # deterministic
    assert transmute_seed(s) == (s2, derived)


def test_same_seed_same_world(pack):
    a = WorldGen.from_datapack(pack, seed=77)
    b = WorldGen.from_datapack(pack, seed=77)
    pos = [(0, 1, 0), (3, 1, -2)]
    ga, fa = a.generate_chunks(pos)
    gb, fb = b.generate_chunks(pos)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    assert [len(x) for x in fa] == [len(x) for x in fb]
    for la, lb in zip(fa, fb):
        for x, y in zip(la, lb):
            assert x.voxels == y.voxels


def test_different_seed_different_world(pack):
    a = WorldGen.from_datapack(pack, seed=1)
    b = WorldGen.from_datapack(pack, seed=2)
    ga, _ = a.generate_chunks([(0, 1, 0)])
    gb, _ = b.generate_chunks([(0, 1, 0)])
    assert not np.array_equal(np.asarray(ga), np.asarray(gb))


def test_columns_follow_height_and_layers(gen):
    """Sampled columns match the scalar spec: biome layer stack on top,
    earth below, water up to sea level (gen.rs:204-236)."""
    cpos = (0, 1, 14)
    grids, _ = gen.generate_chunks([cpos])
    g = np.asarray(grids)[0]
    y0 = cpos[1] * CHUNK_SIZE
    preset = gen.preset
    for x, z in [(0, 0), (13, 7), (31, 31)]:
        wx, wz = cpos[0] * CHUNK_SIZE + x, cpos[2] * CHUNK_SIZE + z
        h = gen.terrain_h_at(wx, wz)
        biome = gen.biome_at(wx, wz)
        for ly in range(CHUNK_SIZE):
            wy = y0 + ly
            layer = h - wy
            if layer >= 0:
                want = (
                    biome.layers[layer]
                    if layer < len(biome.layers)
                    else preset.earth
                )
            elif wy < preset.sea_level:
                want = preset.water
            else:
                want = 0
            assert g[x, ly, z] == want, (x, ly, z, h)


def test_flatland_preset(pack):
    gen = WorldGen.from_datapack(pack, seed=5, preset_name="Flatland")
    grids, _ = gen.generate_chunks([(0, 0, 0)])
    g = np.asarray(grids)[0]
    # height 12 everywhere: surface layer at y=12 is grass
    grass = pack.voxels.by_name("grass")
    dirt = pack.voxels.by_name("dirt")
    stone = pack.voxels.by_name("stone")
    assert (g[:, 12, :] == grass).all()
    assert (g[:, 11, :] == dirt).all()
    assert (g[:, 0, :] == stone).all()
    assert (g[:, 13, :] == 0).all()


def test_feature_determinism_and_shape(pack):
    cfg = pack.world_features["oak_tree"]
    a = build_feature(feature_rng(9, (5, 60, 7)), (5, 60, 7), cfg)
    b = build_feature(feature_rng(9, (5, 60, 7)), (5, 60, 7), cfg)
    assert a.voxels == b.voxels
    assert len(a.voxels) > 50  # trunk + canopy
    trunk = pack.world_features["oak_tree"].params["trunk_voxel"]
    assert a.voxels[(5, 60, 7)] == trunk  # trunk base at surface
    assert (a.min <= [5, 60, 7]).all() and (a.max >= [5, 60, 7]).all()


def test_all_feature_kinds_build(pack):
    for name, cfg in pack.world_features.items():
        f = build_feature(feature_rng(3, (0, 50, 0)), (0, 50, 0), cfg)
        assert len(f.voxels) > 0, name


def test_lake_carves_air(pack):
    cfg = pack.world_features["pond"]
    f = build_feature(feature_rng(1, (0, 50, 0)), (0, 50, 0), cfg)
    vals = set(f.voxels.values())
    water = pack.voxels.by_name("water")
    assert 0 in vals and water in vals


def test_find_land_near(gen):
    spot = gen.find_land_near(0, 0)
    assert spot is not None
    x, h, z = spot
    assert h > gen.preset.sea_level
    assert gen.terrain_h_at(x, z) == h


def test_peaks_are_strict_local_maxima(gen):
    """A reported peak's feat-noise must exceed all 8 neighbors (gen.rs:244-261).

    The probe scans a deterministic list of surface chunks near the seed's
    spawn land (seed 1234: land at voxel (160, 65, 0); chunk (3,2,-2)
    carries 11 peaks) until one reports a peak, so the assertion always
    runs — worldgen would have to produce ZERO vegetation peaks across all
    four probes for this to fail, which would itself be a bug."""
    probes = [(3, 2, -2), (4, 2, -2), (4, 2, -1), (5, 2, -1)]
    cpos = peak = None
    for p in probes:
        grids, aux = gen.terrain.generate_grids(np.asarray([p]))
        m = np.asarray(aux["peak"])[0]
        if m.any():
            cpos, peak = p, m
            break
    assert peak is not None, "no feature peaks in any probed chunk"
    fm = gen.terrain.feat_map
    xs, zs = np.nonzero(peak)
    x, z = int(xs[0]), int(zs[0])
    wx, wz = cpos[0] * CHUNK_SIZE + x, cpos[2] * CHUNK_SIZE + z
    center = float(np.asarray(fm.sample(np.asarray([[wx, wz]], np.float32)))[0])
    for dx, dz in [(-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)]:
        nb = float(np.asarray(fm.sample(np.asarray([[wx+dx, wz+dz]], np.float32)))[0])
        assert center > nb

"""Resource system tests: RON parsing, pack validation, material compile.

The reference validates at load time — voxel name resolution, biome layer
expansion, duplicate detection (common/src/resources/loader.rs:277-348);
these tests pin the same behavior.
"""

import pytest

from voxelraytracing_tpu.resources import ron
from voxelraytracing_tpu.resources.packs import (
    Datapack,
    DuplicateVoxel,
    Resources,
    Stylepack,
    VoxelNotFound,
    builtin_respack_path,
    parse_voxelpack,
    parse_world_presets,
)


def test_ron_scalars_and_collections():
    assert ron.loads("42") == 42
    assert ron.loads("-3.5") == -3.5
    assert ron.loads('"hi\\n"') == "hi\n"
    assert ron.loads("true") is True
    assert ron.loads("[1, 2, 3,]") == [1, 2, 3]
    assert ron.loads("(1, 2)") == (1, 2)
    assert ron.loads('{ "a": 1, "b": 2 }') == {"a": 1, "b": 2}


def test_ron_structs_and_variants():
    v = ron.loads("Map( freq: 0.5, scale: 2.0, offset: -1.0 )")
    assert v.tag == "Map" and v["freq"] == 0.5 and v["offset"] == -1.0
    v = ron.loads("Value(3.0)")
    assert v.tag == "Value" and v.args == (3.0,)
    v = ron.loads("Gas")
    assert v.tag == "Gas" and dict(v) == {}
    v = ron.loads("( name: \"x\", version: (0, 1) )  // trailing comment")
    assert v.tag is None and v["version"] == (0, 1)


def test_ron_comments_and_errors():
    assert ron.loads("/* block */ [1, // line\n 2]") == [1, 2]
    with pytest.raises(ron.RonError):
        ron.loads("[1, 2")
    with pytest.raises(ron.RonError):
        ron.loads("1 2")


def test_duplicate_voxel_rejected():
    src = '[VoxelData(name: "a"), VoxelData(name: "a")]'
    with pytest.raises(DuplicateVoxel):
        parse_voxelpack(src)


def test_unknown_voxel_name_rejected():
    voxels = parse_voxelpack('[VoxelData(name: "air", state: Gas)]')
    src = """[RawWorldPreset(
        name: "p", temp: Value(0.0), humidity: Value(0.0),
        weirdness: Value(0.0), height: Value(1.0), sea_level: 0,
        earth: "nope", water: "air",
        biome_lookup: (%s),
        biomes: [RawBiome(name: "b", vegetation: Map(freq:1.0,scale:0.0,offset:0.0),
                          layers: [], features: [])],
    )]""" % ",".join(["(" + ",".join(["0"] * 20) + ")"] * 8)
    with pytest.raises(VoxelNotFound):
        parse_world_presets(src, voxels, {})


def test_builtin_respack_loads_and_validates():
    res = Resources.load_from(builtin_respack_path())
    dp = res.datapacks["terra"]
    sp = res.stylepacks["terra"]
    assert dp.voxels.by_name("air") == 0
    assert dp.voxels.get(0).is_air
    assert len(dp.world_presets) >= 2
    p = dp.world_presets[0]
    assert len(p.biome_lookup) == 8 and all(len(r) == 20 for r in p.biome_lookup)
    # biome layers are depth-expanded
    assert all(isinstance(v, int) for b in p.biomes for v in b.layers)
    # every biome feature name resolves
    for b in p.biomes:
        for f in b.features:
            assert f in dp.world_features
    assert [w.name for w in res.worlds] == ["Demo World"]

    mats = sp.material_table(dp.voxels)
    water = dp.voxels.by_name("water")
    assert bool(mats.is_liquid[water])
    glow = dp.voxels.by_name("glowstone")
    assert float(mats.emission[glow]) > 0


def test_material_table_styles_match_states():
    res = Resources.load_from(builtin_respack_path())
    dp, sp = res.datapacks["terra"], res.stylepacks["terra"]
    # every non-gas voxel has a style with a matching state
    for vd in dp.voxels:
        style = sp.voxel_styles.get(vd.name)
        assert style is not None, vd.name
        assert style.state == vd.state, vd.name


def test_ron_non_ascii_strings_survive():
    # unicode_escape-based unescaping corrupts UTF-8 (mojibake); the parser
    # must pass non-ASCII through verbatim and still honor real escapes.
    assert ron.loads('"Café"') == "Café"
    assert ron.loads('"日本語"') == "日本語"
    assert ron.loads(r'"a\nb\tc\"d"') == 'a\nb\tc"d'
    assert ron.loads(r'"snowman: \u{2603} / bare ☃"') == "snowman: ☃ / bare ☃"

"""Engine session test: singleplayer host -> stream -> edit -> render."""

import numpy as np
import pytest

import os, shutil


@pytest.fixture(scope="module")
def flat_root(tmp_path_factory):
    from voxelraytracing_tpu.resources.packs import builtin_respack_path

    root = str(tmp_path_factory.mktemp("res"))
    shutil.rmtree(root)
    shutil.copytree(builtin_respack_path(), root)
    meta = os.path.join(root, "worlds", "demo", "meta.ron")
    with open(meta, "w") as f:
        f.write('(name: "Flat", version: (0, 1), datapack: "terra", '
                'stylepack: "terra", seed: 7,)')
    return root


def test_singleplayer_session(flat_root):
    from voxelraytracing_tpu.client import PlayerInput
    from voxelraytracing_tpu.engine import EngineApp

    app = EngineApp.host_singleplayer(
        flat_root, "Flat", port=0 or 61723, resolution=(128, 64),
        world_size_chunks=4,
    )
    try:
        # stream the window in (first chunks wait on the child's jit compile)
        import time

        for _ in range(600):
            app.update(net_budget_s=0.05)
            app.update_game()
            if app.game.world.populated_count() >= 64:
                break
            time.sleep(0.1)
        assert app.game.world.populated_count() == 64

        # player falls to the flat ground
        for _ in range(120):
            app.update_input(PlayerInput())
            if app.game.player.on_ground:
                break
        assert app.game.player.on_ground

        img = app.draw_frame()
        a = np.asarray(img)
        assert a.shape == (64, 128, 3) and not np.isnan(a).any()
        assert float(np.asarray(app._last_trace.hit).mean()) > 0.1

        # look down, break the block under the crosshair
        app.game.player.rot = np.asarray([85.0, 0.0, 0.0], np.float32)
        hit = app.pick()
        assert hit is not None
        pos, face = hit
        grass = app.game.voxels.by_name("grass")
        assert app.game.world.get_voxel(pos) == grass
        assert app.break_voxel()
        assert app.game.world.get_voxel(pos) == 0

        # place it back against the face below
        app.placing_voxel = app.game.voxels.by_name("stone")
        assert app.place_voxel()

        # overlay data sane
        ov = app.debug_overlay()
        assert ov["chunks_populated"] == 64
        assert 0.0 < ov["node_space_used_frac"] < 1.0

        # step-count heatmap mode renders
        app.toggle_step_heatmap()
        img2 = app.draw_frame()
        assert not np.isnan(np.asarray(img2)).any()
    finally:
        app.close()


def test_composite_crosshair_styles():
    """Blit-stage crosshair math (screen_shader.wgsl:43-65)."""
    import jax.numpy as jnp

    from voxelraytracing_tpu.models.raytracer import composite_crosshair

    img = jnp.zeros((64, 64, 3), jnp.float32)
    out = composite_crosshair(img, style="dot", size=4.0,
                              color=(1.0, 0.0, 0.0, 1.0))
    o = np.asarray(out)
    assert o[32, 32, 0] == 1.0 and o[32, 32, 1] == 0.0  # center painted red
    assert o[0, 0].sum() == 0.0  # corners untouched

    out = composite_crosshair(img, style="cross", size=8.0,
                              color=(1.0, 1.0, 1.0, 0.5))
    o = np.asarray(out)
    assert abs(o[32, 36, 0] - 0.5) < 1e-6  # horizontal bar, alpha-blended
    assert abs(o[36, 32, 0] - 0.5) < 1e-6  # vertical bar
    assert o[38, 38].sum() == 0.0  # diagonal outside both bars

    assert composite_crosshair(img, style="off") is img

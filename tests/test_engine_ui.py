"""UI page-stack, input aggregation, profiling utils."""

import numpy as np

from voxelraytracing_tpu.engine.input import InputState
from voxelraytracing_tpu.engine.ui import Page, UiState
from voxelraytracing_tpu.resources.packs import Resources, builtin_respack_path


def test_page_stack_navigation():
    ui = UiState()
    assert ui.page == Page.TITLE
    ui.push(Page.OPTIONS)
    ui.push(Page.VISUALS)
    assert ui.page == Page.VISUALS
    ui.pop()
    assert ui.page == Page.OPTIONS
    ui.pop(); ui.pop()  # can't pop past root
    assert ui.page == Page.TITLE
    assert "actions" in ui.view()


def test_world_create_and_list(tmp_path):
    import shutil

    root = str(tmp_path / "res")
    shutil.copytree(builtin_respack_path(), root)
    ui = UiState(resources=Resources.load_from(root))
    n0 = len(ui.worlds())
    ui.create_world("My Test World", seed=99)
    assert len(ui.worlds()) == n0 + 1
    w = next(x for x in ui.worlds() if x.name == "My Test World")
    assert w.seed == 99 and w.datapack == "terra"
    # duplicate name gets a distinct folder
    ui.create_world("My Test World", seed=1)
    assert len(ui.worlds()) == n0 + 2


def test_input_edges_and_bindings():
    inp = InputState()
    inp.key_down("W")
    inp.key_down("w")  # repeat: no new edge
    inp.key_down("f")
    inp.move_cursor(3.0, -2.0)
    pi = inp.to_player_input()
    assert pi.forward and pi.toggle_fly and pi.cursor_movement == (3.0, -2.0)
    inp.finish_frame()
    pi2 = inp.to_player_input()
    assert pi2.forward  # still held
    assert not pi2.toggle_fly  # edge cleared
    inp.key_up("w")
    assert not inp.to_player_input().forward


def test_frame_profiler_and_ray_stats():
    from voxelraytracing_tpu.utils.profiling import FrameProfiler, ray_stats

    prof = FrameProfiler()
    with prof.section("update"):
        pass
    assert "update" in prof.summary()

    class FakeRs:
        steps = np.array([[1, 5], [3, 7]])
        hit = np.array([[True, False], [True, True]])

    st = ray_stats(FakeRs())
    assert st["rays"] == 4 and st["steps_max"] == 7 and 0 < st["hit_fraction"] <= 1

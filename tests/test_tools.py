"""Tool smoke tests: installer + dedicated server CLI."""

import os
import shutil
import threading
import time

import pytest

from voxelraytracing_tpu.resources.packs import builtin_respack_path


def test_installer_copies_packs(tmp_path):
    from voxelraytracing_tpu.tools.installer import install

    dest, installed = install(str(tmp_path))
    assert "datapacks/terra" in installed or os.path.isdir(
        os.path.join(dest, "datapacks", "terra")
    )
    assert os.path.isfile(os.path.join(dest, "datapacks", "terra", "voxels.ron"))
    # second run: no overwrite
    _, installed2 = install(str(tmp_path))
    assert installed2 == []


def test_servercli_serves_and_saves(tmp_path):
    from voxelraytracing_tpu.client import ServerConn
    from voxelraytracing_tpu.tools.servercli import run_server

    root = str(tmp_path / "res")
    shutil.copytree(builtin_respack_path(), root)
    # Flatland world for cheap generation
    meta = os.path.join(root, "worlds", "demo", "meta.ron")
    # point the demo world at a flat test world by rewriting its meta
    with open(meta, "w") as f:
        f.write(
            '(name: "Flat Test", version: (0, 1), datapack: "terra", '
            'stylepack: "terra", seed: 7,)'
        )

    ready = threading.Event()
    info = {}

    def on_ready(state, port):
        info["port"] = port
        info["state"] = state
        ready.set()

    t = threading.Thread(
        target=run_server,
        args=(root, "Flat Test"),
        kwargs=dict(
            port=0, max_ticks=3000, quiet=True, on_ready=on_ready, cli=False
        ),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=120)

    conn = ServerConn.establish(("127.0.0.1", info["port"]), "cli-test")
    assert len(conn.voxel_pack) > 50
    from voxelraytracing_tpu.net import ServerCmd

    conn.write(ServerCmd.LOAD_CHUNKS, chunks=[(0, 0, 0)])
    got = []
    for _ in range(1200):  # generous: first chunk waits on worldgen jit
        got.extend(conn.try_read())
        if got:
            break
        time.sleep(0.05)
    assert got and got[0][1]["pos"] == (0, 0, 0)
    conn.write(ServerCmd.DISCONNECT_NOTICE)
    conn.close()
    t.join(timeout=120)
    assert not t.is_alive()
    assert info["state"].spawn is not None


def test_logging_env_knob(monkeypatch):
    """VOXELTPU_LOG controls the package logger (the RUST_LOG analog)."""
    import importlib
    import logging

    from voxelraytracing_tpu.utils import log as vlog

    monkeypatch.setenv("VOXELTPU_LOG", "debug")
    vlog._initialized = False
    logger = vlog.init_logging()
    assert logger.level == logging.DEBUG
    child = vlog.get_logger("server.state")
    assert child.name == "voxelraytracing_tpu.server.state"
    assert child.getEffectiveLevel() == logging.DEBUG

    vlog._initialized = False
    logger = vlog.init_logging("off")
    assert logger.level > logging.CRITICAL
    vlog._initialized = False
    vlog.init_logging("warning")


def test_web_viewer_serves_frames_and_input(tmp_path_factory):
    """The browser frontend streams engine frames and applies posted
    input (the winit+egui shell analog, clientdesktop/src/main.rs)."""
    import json
    import os
    import shutil
    import time
    import urllib.request

    from voxelraytracing_tpu.engine import EngineApp
    from voxelraytracing_tpu.resources.packs import builtin_respack_path
    from voxelraytracing_tpu.tools import web_viewer

    root = str(tmp_path_factory.mktemp("res"))
    shutil.rmtree(root)
    shutil.copytree(builtin_respack_path(), root)
    with open(os.path.join(root, "worlds", "demo", "meta.ron"), "w") as f:
        f.write('(name: "Flat", version: (0, 1), datapack: "terra", '
                'stylepack: "terra", seed: 7,)')

    app = EngineApp.host_singleplayer(
        root, "Flat", port=61733, resolution=(128, 64), world_size_chunks=4,
    )
    httpd, state = web_viewer.serve(app, port=18765, max_fps=10.0)
    base = "http://127.0.0.1:18765"
    try:
        html = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"/stream" in html

        # wait for the pump to produce a frame
        frame = None
        for _ in range(100):
            try:
                r = urllib.request.urlopen(base + "/frame", timeout=10)
                frame = r.read()
                ctype = r.headers["Content-Type"]
                break
            except urllib.error.HTTPError:
                time.sleep(0.2)
        assert frame and ctype in ("image/jpeg", "image/bmp")

        # input: hold forward + look; player position/rotation must change
        s0 = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=10).read())
        req = urllib.request.Request(
            base + "/input",
            data=json.dumps(
                {"keys": {"forward": True}, "look": [120.0, 0.0]}
            ).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10)
        urllib.request.urlopen(
            urllib.request.Request(
                base + "/act", data=json.dumps({"toggle_fly": True}).encode(),
                method="POST"), timeout=10)
        time.sleep(1.5)
        s1 = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=10).read())
        assert s1["pos"] != s0["pos"]

        def act(body):
            urllib.request.urlopen(
                urllib.request.Request(
                    base + "/act", data=json.dumps(body).encode(),
                    method="POST"), timeout=10)

        # scroll-wheel palette + live visuals controls (ui.rs:163-168,
        # main.rs scroll palette) round-trip through the HTTP layer
        placing0 = s1["placing"]
        act({"scroll": 1})
        act({"crosshair": {"style": "dot", "size": 12}})
        deadline = time.time() + 20
        while time.time() < deadline:
            s2 = json.loads(urllib.request.urlopen(
                base + "/stats", timeout=10).read())
            if s2["placing"] != placing0:
                break
            time.sleep(0.2)
        assert s2["placing"] != placing0
        assert app.crosshair.style == "dot" and app.crosshair.size == 12
        assert s2["world_size"] == 4

        # deliberate panic (Shift+F7 analog, main.rs:374-376): the pump
        # crashes, surfaces the error in /stats, and shutdown still works
        act({"panic": True})
        deadline = time.time() + 20
        while state.running and time.time() < deadline:
            time.sleep(0.2)
        assert not state.running
        s3 = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=10).read())
        assert "panic" in s3.get("error", "")
    finally:
        httpd.shutdown()
        state.stop()
        app.close()

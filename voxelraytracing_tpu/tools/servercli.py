"""Dedicated world server with a stdin CLI.

The servercli equivalent (servercli/src/main.rs:225-377): loads a world's
meta + datapack, builds the worldgen pipeline, serves TCP clients in a tick
loop with region-file persistence, and accepts console commands:

  stop                     save and shut down
  players                  list connected players
  world                    chunk/node occupancy stats
  tp <hex-id> <x> <y> <z>  teleport a player

Usage:
  python -m voxelraytracing_tpu.tools.servercli <resource_root> <world_name> [port]

``resource_root`` is a resource tree (datapacks/stylepacks/worlds) — e.g.
the bundled ``respack/``.
"""

import os
import queue
import sys
import threading
import time

import numpy as np


def _apply_platform_env():
    """Honor VOXELTPU_PLATFORM=cpu|tpu before any jax backend use — the
    axon TPU plugin ignores JAX_PLATFORMS, so subprocess servers need this
    to run CPU-side (e.g. under tests or when a client owns the TPU)."""
    plat = os.environ.get("VOXELTPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    # CPU-only persistent compile cache (VOXELTPU_COMPCACHE=dir): a fresh
    # server process recompiles the worldgen pipeline (~30-60 s) without
    # it. Never applied to device backends — a degraded TPU session's
    # executables must not be reused (docs/TPU_NOTES.md).
    cache = os.environ.get("VOXELTPU_COMPCACHE")
    if cache and plat == "cpu":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_apply_platform_env()


def run_server(resource_root, world_name, port=60000, host="127.0.0.1",
               tick_sleep=0.001, max_ticks=None, quiet=False, on_ready=None,
               cli=True):
    from ..resources.packs import Resources
    from ..server import ServerState, ServerWorld, WorldFs
    from ..worldgen import WorldGen

    res = Resources.load_from(resource_root)
    world_meta = next(w for w in res.worlds if w.name == world_name)
    pack = res.datapacks[world_meta.datapack]
    gen = WorldGen.from_datapack(pack, seed=world_meta.seed)

    world_dir = os.path.join(resource_root, "worlds", _world_dir_name(resource_root, world_name))
    fs = WorldFs(world_dir)

    world = ServerWorld(gen)
    state = ServerState(world, voxel_pack=pack.voxels, host=host, port=port)
    actual_port = state.start()
    if not quiet:
        print(f"serving '{world_name}' on {host}:{actual_port}", flush=True)
    if on_ready is not None:
        on_ready(state, actual_port)

    cmds = queue.Queue()
    if cli:
        threading.Thread(target=_stdin_loop, args=(cmds,), daemon=True).start()

    ticks = 0
    try:
        while True:
            state.handle_clients()
            state.update(fs=fs)
            state.update_world()
            try:
                line = cmds.get_nowait()
            except queue.Empty:
                line = None
            if line is not None and _handle_cli(line, state, world, fs, quiet):
                break
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break
            time.sleep(tick_sleep)
    finally:
        saved = fs.save(world)
        if not quiet:
            print(f"saved {saved} chunks", flush=True)
        state.stop()
    return state


def _world_dir_name(resource_root, world_name):
    base = os.path.join(resource_root, "worlds")
    for entry in sorted(os.listdir(base)):
        meta = os.path.join(base, entry, "meta.ron")
        if os.path.isfile(meta):
            from ..resources.packs import parse_world_meta

            with open(meta, "r", encoding="utf-8") as f:
                if parse_world_meta(f.read()).name == world_name:
                    return entry
    raise FileNotFoundError(world_name)


def _stdin_loop(out_queue):
    try:
        for line in sys.stdin:
            out_queue.put(line.strip())
    except (OSError, ValueError):
        # stdin unreadable (closed, or a captured test stream) — the CLI
        # simply goes quiet; the tick loop runs on.
        pass


def _handle_cli(line, state, world, fs, quiet):
    """Console commands (servercli/src/main.rs:333-377). Returns True on stop."""
    parts = line.split()
    if not parts:
        return False
    cmd = parts[0]
    if cmd == "stop":
        return True
    if cmd == "players":
        for c in state.clients.values():
            print(f"  {c.id:016x} {c.name} @ {c.pos}", flush=True)
        print(f"{len(state.clients)} player(s)", flush=True)
    elif cmd == "world":
        n_chunks = len(world.chunks)
        cached = sum(1 for c in world.chunks.values() if c.nodes is not None)
        used_nodes = sum(
            len(c.nodes) for c in world.chunks.values() if c.nodes is not None
        )
        print(
            f"{n_chunks} chunks loaded; {cached} with built SVO "
            f"({used_nodes} nodes); {fs.dirty_count()} dirty; "
            f"{len(world.unplaced_features)} features pending",
            flush=True,
        )
    elif cmd == "tp" and len(parts) == 5:
        cid = int(parts[1], 16)
        pos = tuple(float(v) for v in parts[2:5])
        state.teleport(cid, pos)
    elif not quiet:
        print(f"unknown command: {line!r}", flush=True)
    return False


def main():
    from ..utils.log import init_logging

    init_logging()  # honor VOXELTPU_LOG (env_logger::init analog)
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    root, world_name = sys.argv[1], sys.argv[2]
    port = int(sys.argv[3]) if len(sys.argv) > 3 else 60000
    run_server(root, world_name, port=port)
    return 0


if __name__ == "__main__":
    sys.exit(main())

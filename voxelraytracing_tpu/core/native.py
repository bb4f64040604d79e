"""ctypes bindings for the native host runtime (native/svo_core.cpp).

The library builds on first use with the system toolchain (g++); when the
build is unavailable the engine transparently falls back to the pure-Python
spec implementations in ``core/svo.py`` — behavior is identical, the native
path is just ~100× faster for interactive edits and region-file decode.

API:
  available() -> bool
  NativeAlloc(used_end, end)           — group-of-8 free-list allocator
  set_node(nodes, alloc, pos, voxel, depth) -> bool (False = OOM)
  get_voxel(nodes, pos) -> int
  svo_to_dense(nodes) -> uint16[32,32,32]
  dense_to_svo(grid, cap) -> (int32[n], n) — bit-identical to the device
    builder's layout (ops/svo_build.py)
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

from .constants import CHUNK_DEPTH, CHUNK_SIZE, NODES_PER_CHUNK

_lock = threading.Lock()
_lib = None
_tried = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(src, out):
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        root = _repo_root()
        src = os.path.join(root, "native", "svo_core.cpp")
        out = os.path.join(root, "native", "libsvo_core.so")
        try:
            if not os.path.isfile(out) or os.path.getmtime(out) < os.path.getmtime(src):
                _build(src, out)
            lib = ctypes.CDLL(out)
        except (OSError, subprocess.CalledProcessError):
            return None

        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

        lib.svo_alloc_new.restype = ctypes.c_void_p
        lib.svo_alloc_new.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.svo_alloc_delete.argtypes = [ctypes.c_void_p]
        lib.svo_alloc_last_used.restype = ctypes.c_int64
        lib.svo_alloc_last_used.argtypes = [ctypes.c_void_p]
        lib.svo_alloc_total_free.restype = ctypes.c_int64
        lib.svo_alloc_total_free.argtypes = [ctypes.c_void_p]
        lib.svo_set_node.restype = ctypes.c_int
        lib.svo_set_node.argtypes = [
            i32p, ctypes.c_void_p, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int32, ctypes.c_int,
        ]
        lib.svo_get_voxel.restype = ctypes.c_int32
        lib.svo_get_voxel.argtypes = [i32p, ctypes.c_float, ctypes.c_float, ctypes.c_float]
        lib.svo_to_dense.argtypes = [i32p, u16p]
        lib.dense_to_svo.restype = ctypes.c_int64
        lib.dense_to_svo.argtypes = [u16p, i32p, ctypes.c_int64]
        lib.dense_to_svo_batch.argtypes = [
            u16p, ctypes.c_int64, i32p, ctypes.c_int64, i64p,
        ]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.hist256_u8.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        lib.sw_rows_build.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, i32p,
            u32p, u32p, u32p, u32p, u8p, u8p, u8p, i32p,
        ]
        _lib = lib
        return _lib


def available():
    return _load() is not None


class NativeAlloc:
    """Native group-of-8 free-list allocator (NodeAlloc semantics)."""

    def __init__(self, used_end, end):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native svo_core unavailable")
        self._h = self._lib.svo_alloc_new(int(used_end), int(end))

    @property
    def last_used_addr(self):
        return int(self._lib.svo_alloc_last_used(self._h))

    def total_free_mem(self):
        return int(self._lib.svo_alloc_total_free(self._h))

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h is not None:
            lib.svo_alloc_delete(h)
            self._h = None


def set_node(nodes, alloc: NativeAlloc, pos, voxel, depth=CHUNK_DEPTH):
    """In-place SVO write; returns False on out-of-memory."""
    lib = _load()
    rc = lib.svo_set_node(
        nodes, alloc._h, float(pos[0]), float(pos[1]), float(pos[2]),
        int(voxel), int(depth),
    )
    return rc == 0


def get_voxel(nodes, pos):
    lib = _load()
    return int(lib.svo_get_voxel(nodes, float(pos[0]), float(pos[1]), float(pos[2])))


def svo_to_dense(nodes):
    lib = _load()
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    out = np.empty((CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE), dtype=np.uint16)
    lib.svo_to_dense(nodes, out)
    return out


def dense_to_svo(grid, cap=NODES_PER_CHUNK):
    lib = _load()
    grid = np.ascontiguousarray(grid, dtype=np.uint16)
    out = np.zeros(cap, dtype=np.int32)
    n = int(lib.dense_to_svo(grid, out, cap))
    if n < 0:
        raise MemoryError("chunk exceeds node capacity")
    return out[:n], n


def dense_to_svo_batch(grids, cap=NODES_PER_CHUNK):
    """``uint16[B,32,32,32] -> (int32[B,cap], int64[B])`` — host batch
    builder (used when the device is busy rendering or absent)."""
    lib = _load()
    grids = np.ascontiguousarray(grids, dtype=np.uint16)
    b = grids.shape[0]
    out = np.zeros((b, cap), dtype=np.int32)
    counts = np.zeros(b, dtype=np.int64)
    lib.dense_to_svo_batch(grids.reshape(b, -1), b, out.reshape(-1), cap, counts)
    if (counts < 0).any():
        raise MemoryError("chunk exceeds node capacity")
    return out, counts


def hist256_u8(ids):
    """``uint8[R, L] -> int32[R, 256]`` per-row histogram (the palette
    pass's count step, ~50x np.bincount for 4096-voxel subwindow rows)."""
    lib = _load()
    ids = np.ascontiguousarray(ids, dtype=np.uint8)
    r, length = ids.shape
    out = np.empty((r, 256), dtype=np.int32)
    lib.hist256_u8(ids.reshape(-1), r, length, out.reshape(-1))
    return out


def sw_rows_build(rg_rows, n_liquid, to_pack):
    """Per-subwindow render data for ``uint8[R, 4096]`` rows of render ids
    — the streaming builder's hot path at memory speed. Returns the same
    dict as the NumPy path in world/render_grid.chunk_batch_sw_data
    (pinned equal by tests/test_native.py)."""
    lib = _load()
    rg_rows = np.ascontiguousarray(rg_rows, dtype=np.uint8)
    r = rg_rows.shape[0]
    tp = np.zeros(256, np.int32)
    tpa = np.asarray(to_pack, np.int32)
    tp[: len(tpa)] = tpa[:256]
    sw_solid = np.empty((r, 128), np.uint32)
    sw_liq = np.empty((r, 128), np.uint32)
    sw_meta = np.empty((r, 8), np.uint32)
    sw_pid = np.empty((r, 4, 128), np.uint32)
    any_solid = np.empty(r, np.uint8)
    all_liq = np.empty(r, np.uint8)
    any_liq = np.empty(r, np.uint8)
    ok = np.zeros(1, np.int32)
    lib.sw_rows_build(
        rg_rows.reshape(-1), r, int(n_liquid), tp,
        sw_solid.reshape(-1), sw_liq.reshape(-1), sw_meta.reshape(-1),
        sw_pid.reshape(-1), any_solid, all_liq, any_liq, ok,
    )
    return dict(
        sw_solid=sw_solid, sw_liq=sw_liq, sw_meta=sw_meta, sw_pid=sw_pid,
        any_solid=any_solid.astype(bool), all_liq=all_liq.astype(bool),
        any_liq=any_liq.astype(bool), palettes_ok=bool(ok[0]),
    )

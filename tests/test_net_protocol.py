"""Wire protocol unit tests: round-trips and partial-frame buffering."""

import numpy as np

from voxelraytracing_tpu.net import ClientCmd, ServerCmd
from voxelraytracing_tpu.net import protocol as P


def roundtrip(cmd, **kw):
    f = P.frame(cmd, **kw)
    buf = bytearray(f)
    out = P.read_frames(buf)
    assert len(out) == 1 and not buf
    return out[0]


def test_simple_commands():
    cmd, fields = roundtrip(ServerCmd.HANDSHAKE, name="ünïcode name")
    assert cmd == ServerCmd.HANDSHAKE and fields["name"] == "ünïcode name"

    cmd, fields = roundtrip(ServerCmd.SET_VOXEL, pos=(-5, 70, 123456), voxel=42)
    assert fields == {"pos": (-5, 70, 123456), "voxel": 42}

    cmd, fields = roundtrip(
        ServerCmd.LOAD_CHUNKS, chunks=[(0, 1, 2), (-3, -4, -5)]
    )
    assert fields["chunks"] == [(0, 1, 2), (-3, -4, -5)]

    cmd, fields = roundtrip(ClientCmd.GIVE_NEW_POS, pos=(1.5, -2.25, 3.0))
    assert fields["pos"] == (1.5, -2.25, 3.0)

    cmd, fields = roundtrip(
        ClientCmd.GIVE_PLAYERS_LIST, players=[(2**63, "a"), (7, "b")]
    )
    assert fields["players"] == [(2**63, "a"), (7, "b")]


def test_voxel_data_roundtrip():
    """GetVoxelData/GiveVoxelData wire parity (common/src/net.rs:41,52)."""
    cmd, fields = roundtrip(
        ServerCmd.GET_VOXEL_DATA, req=7, pos=(-5, 70, 123456)
    )
    assert cmd == ServerCmd.GET_VOXEL_DATA
    assert fields == {"req": 7, "pos": (-5, 70, 123456)}

    cmd, fields = roundtrip(
        ClientCmd.GIVE_VOXEL_DATA, req=7, pos=(-5, 70, 123456), voxel=42
    )
    assert cmd == ClientCmd.GIVE_VOXEL_DATA
    assert fields == {"req": 7, "pos": (-5, 70, 123456), "voxel": 42}


def test_chunk_data_roundtrip():
    nodes = np.arange(1000, dtype=np.uint16)
    cmd, fields = roundtrip(ClientCmd.GIVE_CHUNK_DATA, pos=(1, -2, 3), nodes=nodes)
    assert fields["pos"] == (1, -2, 3)
    np.testing.assert_array_equal(fields["nodes"], nodes)


def test_handshake_accepted_roundtrip():
    pack = [{"name": "air", "state": "gas"}, {"name": "stone", "state": "solid"}]
    cmd, fields = roundtrip(
        ClientCmd.HANDSHAKE_ACCEPTED, spawn=(0.5, 80.0, 0.5), voxel_pack=pack
    )
    assert fields["voxel_pack"] == pack
    assert fields["spawn"][1] == 80.0


def test_partial_frames_buffer():
    """Frames split at arbitrary byte boundaries decode once complete
    (the explicit-framing answer to the reference's UnexpectedEnd retry
    loop, client/src/net.rs:44-60)."""
    f1 = P.frame(ServerCmd.SET_VOXEL, pos=(1, 2, 3), voxel=9)
    f2 = P.frame(ServerCmd.DISCONNECT_NOTICE)
    stream = f1 + f2
    buf = bytearray()
    got = []
    for i in range(0, len(stream), 3):
        buf.extend(stream[i : i + 3])
        got.extend(P.read_frames(buf))
    assert [c for c, _ in got] == [ServerCmd.SET_VOXEL, ServerCmd.DISCONNECT_NOTICE]
    assert not buf


def test_malformed_frames_raise_and_consume():
    import pytest

    # unknown command id: consumed, DecodeError
    buf = bytearray(P._HEADER.pack(0, 99))
    with pytest.raises(P.DecodeError):
        P.read_frames(buf)
    assert not buf  # bad frame consumed — the buffer can't wedge

    # truncated payload for a known command
    buf = bytearray(P._HEADER.pack(3, int(ServerCmd.SET_VOXEL)) + b"abc")
    with pytest.raises(P.DecodeError):
        P.read_frames(buf)
    assert not buf

    # count field exceeding the actual payload (memory-exhaustion guard)
    import struct

    payload = struct.pack("<I", 2**31)  # LOAD_CHUNKS claiming 2^31 entries
    buf = bytearray(P._HEADER.pack(len(payload), int(ServerCmd.LOAD_CHUNKS)) + payload)
    with pytest.raises(P.DecodeError):
        P.read_frames(buf)
    assert not buf

    # oversized declared frame length rejected outright
    buf = bytearray(P._HEADER.pack(P.MAX_FRAME_LEN + 1, int(ServerCmd.HANDSHAKE)))
    with pytest.raises(P.DecodeError):
        P.read_frames(buf)
    assert not buf


def test_conn_marks_broken_on_garbage(monkeypatch):
    import socket

    from voxelraytracing_tpu.net.conn import Conn

    lst = socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)
    b = socket.create_connection(lst.getsockname())
    a, _ = lst.accept()
    lst.close()
    try:
        conn = Conn(a)
        b.sendall(P._HEADER.pack(4, 9999) + b"\xff\xff\xff\xff")
        import time

        deadline = time.time() + 5
        frames = []
        while time.time() < deadline and not conn.broken:
            frames.extend(conn.try_read())
            time.sleep(0.01)
        assert conn.broken
        assert frames == []
        assert conn.try_read() == []  # broken conn goes quiet, never raises
    finally:
        a.close()
        b.close()

"""Client/server networking: framed binary protocol over TCP.

Control-plane only — chunk payloads and commands are host data; device
traffic (the render pipeline) never touches sockets (SURVEY §2.7 P5: the
reference's bincode-on-TCP becomes an explicit length-prefixed frame
protocol; on-device exchange is jax collectives, not sockets).
"""

from .protocol import (
    ClientCmd,
    ServerCmd,
    read_frames,
    recv_cmd_blocking,
    send_cmd,
)
from .conn import Conn, ConnClosed

__all__ = [
    "ClientCmd",
    "ServerCmd",
    "Conn",
    "ConnClosed",
    "read_frames",
    "recv_cmd_blocking",
    "send_cmd",
]

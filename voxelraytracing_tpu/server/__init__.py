"""World-authority server: chunk generation/serving, clients, persistence.

The analog of the reference's ``server`` + ``servercli`` crates, redesigned
around batched device worldgen (SURVEY §2.2, §2.7 P2/P3).
"""

from .persistence import WorldFs, read_region, write_region
from .state import Client, ServerState
from .world import ServerChunk, ServerWorld

__all__ = [
    "Client",
    "ServerChunk",
    "ServerState",
    "ServerWorld",
    "WorldFs",
    "read_region",
    "write_region",
]

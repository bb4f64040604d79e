"""Data-driven resources: RON parsing, datapacks, stylepacks, worlds."""

from .packs import (
    Datapack,
    Resources,
    Stylepack,
    VoxelPack,
    builtin_respack_path,
)

__all__ = [
    "Datapack",
    "Resources",
    "Stylepack",
    "VoxelPack",
    "builtin_respack_path",
]

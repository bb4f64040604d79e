"""User-facing model families: renderers and their settings."""

from .pathtracer import PathTracer, accumulate
from .raytracer import (
    RayTracer,
    RenderSettings,
    WavefrontRenderer,
    shade_hits,
    to_srgb8,
)

__all__ = [
    "PathTracer",
    "RayTracer",
    "RenderSettings",
    "WavefrontRenderer",
    "accumulate",
    "shade_hits",
    "to_srgb8",
]

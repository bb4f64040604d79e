"""Device compute: tracers, SVO build, noise, camera, sky, materials.

Flagship rendering entry points re-exported for discoverability; the
earlier tracer generations (wavefront.py, wavefront2.py, traverse.py)
stay importable as modules — they are the executable oracles.
"""

from .camera import CamData, generate_rays
from .pathtrace4 import path_trace_fused4
from .svo_build import build_chunk_svo, build_chunk_svo_batch
from .wavefront3 import (
    build_render_grid3_host,
    path_trace3,
    render_frame3,
    trace_wavefront3,
    unpack_rgba8,
)
from .wavefront4 import (
    PreparedGrid4,
    PreparedGrid4Sparse,
    path_trace4,
    prepare_grid4,
    render_frame4,
    trace_wavefront4,
)

__all__ = [
    "CamData",
    "generate_rays",
    "build_chunk_svo",
    "build_chunk_svo_batch",
    "build_render_grid3_host",
    "path_trace3",
    "path_trace4",
    "PreparedGrid4",
    "PreparedGrid4Sparse",
    "path_trace_fused4",
    "prepare_grid4",
    "render_frame3",
    "render_frame4",
    "trace_wavefront3",
    "trace_wavefront4",
    "unpack_rgba8",
]

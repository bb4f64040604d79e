"""Core formats and host geometry: SVO nodes/spec, coords, math, native lib."""

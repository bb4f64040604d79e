"""Device compute: tracers, SVO build, noise, camera, sky, materials."""

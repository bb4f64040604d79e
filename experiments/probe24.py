import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
for T in (16384, 16200, 16256, 8192, 8100, 2048, 2025):
    rows = jnp.asarray(rng.integers(0, 2**31, (T,128)), np.uint32)
    idx = jnp.asarray(rng.integers(0, 128, (T,128)), np.int32)
    f = jax.jit(lambda r, i: jnp.take_along_axis(r, i, axis=1))
    out = f(rows, idx); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10): out = f(rows, idx)
    jax.block_until_ready(out)
    print(f"T={T}: {(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)

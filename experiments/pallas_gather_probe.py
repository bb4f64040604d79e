"""Probe: which gather formulations does Mosaic TPU support, and how fast?"""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

N_TABLE = 37449
SHAPE = (256, 1024)  # 256k lookups

def probe(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        n = SHAPE[0] * SHAPE[1]
        print(f"{name}: OK {dt*1e3:.3f} ms -> {n/dt/1e6:.1f} M lookups/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")

table = jnp.arange(N_TABLE, dtype=jnp.int32)
idx = jnp.asarray(np.random.default_rng(0).integers(0, N_TABLE, SHAPE), jnp.int32)

# 1. plain XLA gather (baseline)
probe("xla_gather", jax.jit(lambda: table[idx]))

# 2. pallas: vmem table, advanced indexing
def k2(t_ref, i_ref, o_ref):
    o_ref[:] = t_ref[i_ref[:]]
probe("pallas_vmem_fancy", lambda: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table, idx))

# 3. pallas: jnp.take
def k3(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)
probe("pallas_vmem_take", lambda: pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table, idx))

# 4. pallas: take_along_axis 2D table rows? try take on 2d-reshaped table along axis 0 per column
table2d = jnp.tile(table[:512, None], (1, 128))  # [512,128]
idx_small = idx % 512
def k4(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
probe("pallas_take_along_axis0_512x128", lambda: pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((SHAPE[0], 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table2d, idx_small[:, :128]))

# 5. XLA one-hot matmul gather from 512-entry table
t512 = table[:512].astype(jnp.bfloat16)
def onehot_gather():
    oh = (idx_small[..., None] == jnp.arange(512, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("abt,t->ab", oh, t512, preferred_element_type=jnp.float32)
probe("xla_onehot_512", jax.jit(onehot_gather))

# 6. dynamic slice per-row (pallas loop over sublanes) - skip, scalar loops are known slow

# 7. XLA gather from SMALL table (512)
probe("xla_gather_512", jax.jit(lambda: t512.astype(jnp.int32)[idx_small]))


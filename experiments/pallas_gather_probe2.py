"""Probe 2: find Mosaic's supported 2D gather forms + XLA gather variants."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

rng = np.random.default_rng(0)

def probe(name, fn, n):
    try:
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: OK {dt*1e3:.3f} ms -> {n/dt/1e6:.1f} M lookups/s")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")

def pcall(k, out_shape, *args):
    return pl.pallas_call(k, out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*args)

# A: lane gather via take_along_axis axis=1, src [S,128], idx [S,128]
for S in (8, 256, 2048):
    src = jnp.asarray(rng.integers(0, 1000, (S,128)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 128, (S,128)), jnp.int32)
    def kA(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
    probe(f"pallas_taa_axis1_S{S}", (lambda s=src, i=idx, k=kA: pcall(k, jax.ShapeDtypeStruct(i.shape, jnp.int32), s, i)), S*128)

# B: sublane gather axis=0: src [128,128], idx [128,128] in [0,128)
src = jnp.asarray(rng.integers(0, 1000, (128,128)), jnp.int32)
idx = jnp.asarray(rng.integers(0, 128, (128,128)), jnp.int32)
def kB(s_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)
probe("pallas_taa_axis0_128x128", lambda: pcall(kB, jax.ShapeDtypeStruct((128,128), jnp.int32), src, idx), 128*128)

# C: jnp.take(src2d, idx1d, axis=0): row gather in pallas
src = jnp.asarray(rng.integers(0, 1000, (512,128)), jnp.int32)
idx1 = jnp.asarray(rng.integers(0, 512, (256,)), jnp.int32)
def kC(s_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(s_ref[:], i_ref[:], axis=0)
probe("pallas_take_rows_512", lambda: pcall(kC, jax.ShapeDtypeStruct((256,128), jnp.int32), src, idx1), 256)

# D: big lane-gather: src [2048, 128] gather within rows, bigger width? width 512 lanes
src5 = jnp.asarray(rng.integers(0, 1000, (256, 512)), jnp.int32)
idx5 = jnp.asarray(rng.integers(0, 512, (256, 512)), jnp.int32)
def kD(s_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
probe("pallas_taa_axis1_width512", lambda: pcall(kD, jax.ShapeDtypeStruct((256,512), jnp.int32), src5, idx5), 256*512)

# E: XLA take_along_axis minor-dim gather, big shapes (2M lookups from table 128)
srcE = jnp.asarray(rng.integers(0, 1000, (16384,128)), jnp.int32)
idxE = jnp.asarray(rng.integers(0, 128, (16384,128)), jnp.int32)
probe("xla_taa_axis1_16384x128", jax.jit(lambda: jnp.take_along_axis(srcE, idxE, axis=1)), 16384*128)

# F: XLA row-gather [T,128] rows with 256k indices
srcF = jnp.asarray(rng.integers(0, 1000, (37449//128*128,128)), jnp.int32)
idxF = jnp.asarray(rng.integers(0, srcF.shape[0], (262144,)), jnp.int32)
probe("xla_row_gather_37k", jax.jit(lambda: srcF[idxF]), 262144)

# G: XLA gather broadcast trick: src [1,T] -> take_along_axis axis1 with idx [M,K]? table broadcast over rows
T = 8192
srcG = jnp.asarray(rng.integers(0, 1000, (T,)), jnp.int32)
idxG = jnp.asarray(rng.integers(0, T, (2048, 128)), jnp.int32)
probe("xla_taa_bcast_T8192", jax.jit(lambda: jnp.take_along_axis(jnp.broadcast_to(srcG[None,:], (2048, T)), idxG, axis=1)), 2048*128)

# H: onehot matmul proper: [M,512] bf16 @ [512,128] bf16 (fetch whole row per ray)
M = 8192
tblH = jnp.asarray(rng.integers(0, 1000, (512, 128)), jnp.int32).astype(jnp.bfloat16)
idxH = jnp.asarray(rng.integers(0, 512, (M,)), jnp.int32)
def onehot_rows():
    oh = (idxH[:, None] == jnp.arange(512, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(oh, tblH, preferred_element_type=jnp.float32)
probe("xla_onehot_rowfetch_8k_from512", jax.jit(onehot_rows), M)

import time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
z = jnp.zeros((8,128)); _=float(z[0,0])

BLK=64; NROWS=4096; NB=254

def timeit(name, f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    _=np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    t0=time.perf_counter()
    for _ in range(n): r = f(*args)
    _=np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)

tab = jnp.arange(NROWS*128, dtype=jnp.int32).reshape(NROWS,128)
ids = jnp.asarray(np.random.randint(0, NROWS, (NB, 16)), jnp.int32)

# P1: SMEM-scalar-driven row copies, 16 rows per block, NB blocks
def k_smem(ids_ref, tab_ref, o_ref):
    i = pl.program_id(0)
    def body(k, _):
        sid = ids_ref[i, k]
        o_ref[pl.ds(k,1), :] = tab_ref[pl.ds(sid,1), :]
        return 0
    jax.lax.fori_loop(0, 16, body, 0)

try:
    f1 = pl.pallas_call(
        k_smem, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,16,128), lambda i:(i,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB,16,128), jnp.int32),
    )
    timeit("P1 smem-scalar 16-row copies x254blk", f1, ids, tab)
except Exception as e:
    print("P1 FAIL", str(e)[:200])

# P2: in-kernel DMA HBM->VMEM, 16 rows per block
def k_dma(ids_ref, tab_ref, o_ref, scratch, sem):
    i = pl.program_id(0)
    def body(k, _):
        sid = ids_ref[i, k]
        cp = pltpu.make_async_copy(tab_ref.at[pl.ds(sid,1), :], scratch.at[pl.ds(k,1), :], sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, 16, body, 0)
    o_ref[0] = scratch[:]

try:
    f2 = pl.pallas_call(
        k_dma, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1,16,128), lambda i:(i,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB,16,128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16,128), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    timeit("P2 in-kernel DMA 16 rows x254blk", f2, ids, tab)
except Exception as e:
    print("P2 FAIL", str(e)[:200])

# P3: scalar extract from VMEM vector x64
def k_extract(v_ref, o_ref):
    acc = jnp.int32(0)
    def body(j, acc):
        s = jnp.sum(v_ref[pl.ds(j,1), :1])
        return acc + s
    acc = jax.lax.fori_loop(0, 64, body, acc)
    o_ref[:] = jnp.full((8,128), acc, jnp.int32)

try:
    f3 = pl.pallas_call(
        k_extract, grid=(NB,),
        in_specs=[pl.BlockSpec((64,128), lambda i:(0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8,128), lambda i:(0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32),
    )
    timeit("P3 64 scalar extracts x254blk", f3, tab[:64])
except Exception as e:
    print("P3 FAIL", str(e)[:200])

# P4: XLA single u8 gather 2M
vol = jnp.zeros(256*256*256, jnp.uint8)
idxs = jnp.asarray(np.random.randint(0, 256**3, (32512, 128)), jnp.int32)
@jax.jit
def g1(vol, idxs):
    return vol[idxs]
timeit("P4 XLA u8 gather 2M (1 gather)", g1, vol, idxs)

# P5: pass-through kernel, 7 state arrays, 508 programs
T = 32512
state = [jnp.zeros((T,128), jnp.float32) for _ in range(7)]
def k_pass(*refs):
    ins = refs[:7]; outs = refs[7:]
    for a,b in zip(ins, outs):
        b[:] = a[:]
def vs(): return pl.BlockSpec((64,128), lambda i:(i,0), memory_space=pltpu.VMEM)
f5 = pl.pallas_call(
    k_pass, grid=(T//64,),
    in_specs=[vs()]*7, out_specs=tuple([vs()]*7),
    out_shape=tuple(jax.ShapeDtypeStruct((T,128), jnp.float32) for _ in range(7)),
)
timeit("P5 pass-through 7-state 508 programs", f5, *state)

import time, sys, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
z = jnp.zeros((8,128)); _=float(z[0,0])

BLK=64; NROWS=4096

def k_gather(tab_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

def k_loop(tab_ref, idx_ref, o_ref):
    def body(j, _):
        sid = jnp.sum(idx_ref[pl.ds(j,1), :1])
        o_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(sid, 1), :]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)

tab = jnp.arange(NROWS*128, dtype=jnp.int32).reshape(NROWS,128)
idx = jnp.asarray(np.random.randint(0, NROWS, (BLK,128)), jnp.int32)

which = sys.argv[1]
kern = {"vec": k_gather, "loop": k_loop}[which]
f = pl.pallas_call(
    kern,
    grid=(256,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec((BLK,128), lambda i:(0,0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLK,128), lambda i:(0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((BLK,128), jnp.int32),
)
r = f(tab, idx); rn=np.asarray(r)
exp = np.asarray(tab)[np.asarray(idx)[:, 0]]  # row-gather by lane-0 idx... per-lane idx differs
exp2 = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
print("correct(vec semantics):", (rn==exp2).all(), "correct(row semantics):", (rn==exp).all())
t0=time.perf_counter()
for _ in range(20): r = f(tab, idx)
_=np.asarray(r[:1,:1])
dt=(time.perf_counter()-t0)/20
print(f"{which}: OK {dt*1e6:.0f} us/call (256 blocks)", flush=True)

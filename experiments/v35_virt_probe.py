"""v3.5 mechanics probe: one-program virtualized grid over HBM state.

Checks, in isolation, on the real chip:
  A. manual double-buffered DMA loop over [nB,4*64,128] state in HBM (ANY),
     in-place output via input_output_aliases, idle-block skip from an
     SMEM flag vector
  B. same but all blocks active (upper bound on DMA+loop cost)
Compare with the auto-pipelined pass-through (P5 analog).
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 254
ROWS = 4 * 64          # 4 state planes x 64 tiles
state = jnp.zeros((NB, ROWS, 128), jnp.float32)


def timeit(name, f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)
    return r


def make_virt():
    def kern(act_ref, st_hbm, out_hbm, buf, sem_in, sem_out):
        nb = NB

        def body(b, carry):
            act = act_ref[b]

            @pl.when(act != 0)
            def _():
                slot = b % 2
                cp = pltpu.make_async_copy(
                    st_hbm.at[b], buf.at[slot], sem_in.at[slot]
                )
                cp.start()
                cp.wait()
                # "march": one cheap op over the block
                buf[slot] = buf[slot] * 1.0000001 + 1.0
                cpo = pltpu.make_async_copy(
                    buf.at[slot], out_hbm.at[b], sem_out.at[slot]
                )
                cpo.start()
                cpo.wait()
            return carry

        jax.lax.fori_loop(0, nb, body, 0)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, ROWS, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
    )


try:
    f = make_virt()
    act_all = jnp.ones((NB,), jnp.int32)
    act_few = jnp.zeros((NB,), jnp.int32).at[:30].set(1)
    timeit("A virt all-active ", f, act_all, state)
    timeit("A virt 30-active  ", f, act_few, state)
except Exception as e:
    print("VIRT FAIL:", str(e)[:400], flush=True)


# auto-pipelined baseline: 254-program pass-through of the same volume
def k_pass(s_ref, o_ref):
    o_ref[:] = s_ref[:] * 1.0000001 + 1.0

fp = pl.pallas_call(
    k_pass,
    grid=(NB,),
    in_specs=[pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, ROWS, 128), jnp.float32),
)
timeit("B auto 254-program", fp, state)

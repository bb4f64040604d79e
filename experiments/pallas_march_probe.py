"""Probe: a Pallas kernel that mimics the wavefront inner step —
lane-local take_along_axis gathers + VPU math inside a fori_loop, state in
VMEM, gridded over tile blocks. If this runs near VPU/VMEM speed the whole
inner march can be one dispatch per round instead of 4 per step.

Discipline: no closed-over device constants (poison trigger #2), canaries
between stages, no D2H.
"""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np
from functools import partial

rng = np.random.default_rng(0)

T = 16384
STEPS = 12


@jax.jit
def canary_fn(ct, ci):
    return jnp.take_along_axis(ct, ci, axis=1)


def canary(tag):
    ct = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
    ci = jnp.asarray(rng.integers(0, 128, (4096, 128)), jnp.int32)
    out = canary_fn(ct, ci)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = canary_fn(ct, ci)
    jax.block_until_ready(out)
    print(f"canary[{tag}]: {(time.perf_counter()-t0)/30*1e3:.3f} ms (fast ~<0.2)")


def kernel(bw_ref, lw_ref, sr_ref, t_ref, dx_ref, dy_ref, dz_ref, out_ref):
    tt = t_ref[:]
    ddx = dx_ref[:]
    ddy = dy_ref[:]
    ddz = dz_ref[:]
    bw = bw_ref[:]
    lw = lw_ref[:]
    sr = sr_ref[:]

    def body(i, tt):
        px = ddx * tt
        py = ddy * tt
        pz = ddz * tt
        bx = jnp.floor(px * 16.0).astype(jnp.int32)
        by = jnp.floor(py * 16.0).astype(jnp.int32)
        bz = jnp.floor(pz * 16.0).astype(jnp.int32)
        lin = (bx & 15) + (by & 15) * 16 + (bz & 15) * 256
        widx = (lin >> 5) & 127
        vidx = (bx + by + bz) & 127
        word = jnp.take_along_axis(bw, widx, axis=1)
        lword = jnp.take_along_axis(lw, widx, axis=1)
        vword = jnp.take_along_axis(sr, vidx, axis=1)
        shift = (lin & 31).astype(jnp.uint32)
        descend = ((word >> shift) & 1) != 0
        liq = ((lword >> shift) & 1) != 0
        rid = ((vword >> ((vidx & 3).astype(jnp.uint32) * 8)) & 0xFF).astype(jnp.int32)
        dt = jnp.minimum(jnp.abs(px - py), jnp.minimum(jnp.abs(py - pz), 0.25))
        step = descend & ~liq & (rid != 7)
        tt = jnp.where(step, tt + dt + 1e-3, tt * 1.0001)
        return tt

    tt = jax.lax.fori_loop(0, STEPS, body, tt)
    out_ref[:] = tt


@partial(jax.jit, static_argnames=("blk",))
def run_pallas(bw_row, lw_row, slot_row, t0_, dx, dy, dz, *, blk):
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T // blk,),
        in_specs=[spec] * 7,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(bw_row, lw_row, slot_row, t0_, dx, dy, dz)


def main():
    canary("start")
    args = (
        jnp.asarray(rng.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng.random((T, 128)), jnp.float32),
        jnp.asarray(rng.random((T, 128)) + 0.1, jnp.float32),
        jnp.asarray(rng.random((T, 128)) + 0.1, jnp.float32),
        jnp.asarray(rng.random((T, 128)) + 0.1, jnp.float32),
    )
    for blk in (64, 128, 256, 512):
        if T % blk:
            continue
        out = run_pallas(*args, blk=blk)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = run_pallas(*args, blk=blk)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        n_work = T * 128 * STEPS
        print(f"pallas_march_12step blk={blk}: {dt*1e3:.3f} ms -> "
              f"{n_work/dt/1e6:.1f} M ray-steps/s")
        canary(f"after blk={blk}")


if __name__ == "__main__":
    main()


def main_chained():
    rng2 = np.random.default_rng(1)
    args = [
        jnp.asarray(rng2.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng2.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng2.integers(0, 2**31, (T, 128)), jnp.uint32),
        jnp.asarray(rng2.random((T, 128)), jnp.float32),
        jnp.asarray(rng2.random((T, 128)) + 0.1, jnp.float32),
        jnp.asarray(rng2.random((T, 128)) + 0.1, jnp.float32),
        jnp.asarray(rng2.random((T, 128)) + 0.1, jnp.float32),
    ]
    blk = 256
    tt = args[3]
    out = run_pallas(args[0], args[1], args[2], tt, args[4], args[5], args[6], blk=blk)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        tt = run_pallas(args[0], args[1], args[2], tt, args[4], args[5], args[6], blk=blk)
    jax.block_until_ready(tt)
    dt = (time.perf_counter() - t0) / iters
    n_work = T * 128 * STEPS
    print(f"pallas_march_CHAINED blk={blk}: {dt*1e3:.3f} ms -> "
          f"{n_work/dt/1e6:.1f} M ray-steps/s")
    canary("after chained")


main_chained()

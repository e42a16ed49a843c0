"""Settle the fused extract+sort question (VERDICT r3 item 3): can a
VMEM-resident Pallas sort beat lax.sort's measured 0.41 ns/elt at the
production row length (L = 2^11)?

Measures, fetch-grounded (dispatch -> int), on the same input volumes:

  A. lax.sort baseline, 1 u32 plane,  (R, 2048) rows
  B. lax.sort baseline, 2 u32 planes, (R, 2048) rows  (= production)
  C. Pallas bitonic sort, 1 u32 plane, rows as (16, 128) VMEM tiles:
     the full 66-pass network with XOR-partner exchange; lane-distance
     passes (56 of 66) via paired pltpu.roll + select, sublane passes
     via the same construction on the sublane axis.  This is the
     cheapest comparison-network formulation the hardware offers — no
     payload, no stability, no second plane, i.e. a strict LOWER bound
     on any production-usable Pallas sort.
  D. the minimal lane compare-exchange pass alone (2 rolls + select +
     min/max), x66: the network-depth floor for ANY bitonic
     formulation in VMEM.

If C (and the derived floor D) >= A, then no VMEM sort formulation
beats what lax.sort already does, and the fused-kernel lever is dead:
the count pipeline's sort cost IS the machine's comparison-sort floor
(a radix formulation would need dynamic cross-lane scatter, which
Mosaic does not offer).

Usage: python scripts/probe_r4_pallas_sort.py [--cpu]  (CPU uses the
Pallas interpreter: correctness only, timings meaningless).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CPU = "--cpu" in sys.argv
if CPU:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
from jax import lax                           # noqa: E402
from jax.experimental import pallas as pl     # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

L = 1 << 11          # production sort row length
SUB, LANE = 16, 128  # L = SUB * LANE
BR = 32              # rows per pallas program
R = 1 << 8 if CPU else 1 << 13   # rows per dispatch
S = 2                # scan steps per dispatch
TRIALS = 3


def _xor_partner(x, j, iota, axis):
    """Partner values at XOR stride j along axis (lane or sublane):
    out[i] = x[i ^ j].  j must be a power of two < axis size; for the
    element whose bit j is set the partner sits j BEFORE it (roll +j),
    else j after (roll -j)."""
    n = x.shape[axis]
    fwd = pltpu.roll(x, j, axis=axis)
    bwd = pltpu.roll(x, n - j, axis=axis)
    bit = (iota & j) != 0
    return jnp.where(bit, fwd, bwd)


def bitonic_kernel(x_ref, o_ref):
    x = x_ref[...]  # (BR, SUB, LANE) uint32
    sub_i = lax.broadcasted_iota(jnp.int32, (1, SUB, LANE), 1)
    lane_i = lax.broadcasted_iota(jnp.int32, (1, SUB, LANE), 2)
    gidx = sub_i * LANE + lane_i  # logical index within the row
    for k_exp in range(1, 12):            # k = 2 .. 2048
        k = 1 << k_exp
        up = (gidx & k) == 0
        for j_exp in range(k_exp - 1, -1, -1):
            j = 1 << j_exp
            if j >= LANE:
                js = j // LANE
                xp = _xor_partner(x, js, sub_i, axis=1)
                bit = (sub_i & js) != 0
            else:
                xp = _xor_partner(x, j, lane_i, axis=2)
                bit = (lane_i & j) != 0
            lt = x < xp
            mn = jnp.where(lt, x, xp)
            mx = jnp.where(lt, xp, x)
            keep_min = bit != up
            x = jnp.where(keep_min, mn, mx)
    o_ref[...] = x


def roll_pass_kernel(x_ref, o_ref):
    """One minimal lane compare-exchange pass, repeated 66x: the
    network-depth floor (no direction logic, fixed stride)."""
    x = x_ref[...]
    lane_i = lax.broadcasted_iota(jnp.int32, (1, SUB, LANE), 2)
    bit = (lane_i & 1) != 0
    for _ in range(66):
        fwd = pltpu.roll(x, 1, axis=2)
        bwd = pltpu.roll(x, LANE - 1, axis=2)
        xp = jnp.where(bit, fwd, bwd)
        lt = x < xp
        x = jnp.where(bit != lt, x, xp)
    o_ref[...] = x


def make_pallas(kernel):
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, SUB, LANE), jnp.int32),
        in_specs=[pl.BlockSpec((BR, SUB, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, SUB, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        grid=(R // BR,),
        interpret=CPU,
    )

    @jax.jit
    def pipe(xs):
        def body(carry, x):
            y = call(x)
            return carry + y[0, 0, 0] + y[-1, -1, -1], None
        out, _ = lax.scan(body, jnp.int32(0), xs)
        return out
    return call, pipe


def timeit(fn, inputs):
    int(fn(inputs[0]))
    ts = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        int(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    n_elt = S * R * L

    def fresh(shape, dtype=np.int32):
        return jax.device_put(jnp.asarray(
            rng.integers(-(1 << 31), 1 << 31, size=shape,
                         dtype=np.int64).astype(dtype)))

    # ---- C: pallas bitonic correctness, then rate ----
    call, pipe = make_pallas(bitonic_kernel)
    x0 = np.asarray(rng.integers(-(1 << 31), 1 << 31,
                                 size=(R, SUB, LANE),
                                 dtype=np.int64), np.int32)
    got = np.asarray(call(jnp.asarray(x0)))
    want = np.sort(x0.reshape(R, L), axis=1).reshape(R, SUB, LANE)
    bad = int((got != want).sum())
    print(f"pallas bitonic correctness: {bad} mismatches "
          f"({R} rows of {L})", flush=True)
    assert bad == 0
    if CPU:
        print("CPU interpreter mode: skipping timings", flush=True)
        return

    ins = [fresh((S, R, SUB, LANE)) for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    dt = timeit(pipe, ins)
    print(f"C pallas bitonic 1-plane: {dt*1e3:.1f} ms "
          f"-> {dt/n_elt*1e9:.3f} ns/elt", flush=True)

    # ---- D: minimal pass floor ----
    _, pipe_r = make_pallas(roll_pass_kernel)
    ins = [fresh((S, R, SUB, LANE)) for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    dt = timeit(pipe_r, ins)
    print(f"D 66x minimal lane pass: {dt*1e3:.1f} ms "
          f"-> {dt/n_elt*1e9:.3f} ns/elt "
          f"({dt/n_elt/66*1e12:.1f} ps/elt/pass)", flush=True)

    # ---- A/B: lax.sort baselines ----
    @jax.jit
    def lax1(xs):
        def body(carry, x):
            (y,) = lax.sort((x.reshape(R, L),), num_keys=1,
                            dimension=-1)
            return carry + y[0, 0] + y[-1, -1], None
        out, _ = lax.scan(body, jnp.int32(0), xs)
        return out

    ins = [fresh((S, R, SUB, LANE)) for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    dt = timeit(lax1, ins)
    print(f"A lax.sort 1-plane: {dt*1e3:.1f} ms "
          f"-> {dt/n_elt*1e9:.3f} ns/elt", flush=True)

    @jax.jit
    def lax2(xs):
        def body(carry, x):
            a = x[0].reshape(R, L)
            b = x[1].reshape(R, L)
            y = lax.sort((a, b), num_keys=2, dimension=-1)
            return carry + y[0][0, 0] + y[1][-1, -1], None
        out, _ = lax.scan(body, jnp.int32(0), xs)
        return out

    ins = [fresh((S, 2, R, SUB, LANE)) for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    dt = timeit(lax2, ins)
    print(f"B lax.sort 2-plane (production): {dt*1e3:.1f} ms "
          f"-> {dt/n_elt*1e9:.3f} ns/elt", flush=True)


if __name__ == "__main__":
    main()

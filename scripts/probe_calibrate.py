"""Calibrate the tunnel's dispatch->fetch intercept and measure the
pipeline slope: every fetch-grounded timing includes ~one tunnel RTT,
so stages are timed at two workload sizes and the slope (ms per Mbase)
is what matters.

Run: python scripts/probe_calibrate.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from meryl_tpu.ops import count as cnt          # noqa: E402
from meryl_tpu.ops import extract as ext        # noqa: E402

K = 21


def timeit_fetch(fn, inputs, reps=3):
    assert len(inputs) >= reps + 1
    int(fn(inputs[0]))  # compile + warm
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        int(fn(inputs[1 + r]))
        best = min(best, time.perf_counter() - t0)
    return best


def full_body(carry, codes):
    planes, valid = ext.extract_kmers(codes, K, "canonical")
    splanes, start, n_invalid = cnt.sort_starts(planes, valid)
    return (carry + jnp.sum(start.astype(jnp.uint32))
            + splanes[0][0] + splanes[-1][-1]
            + n_invalid.astype(jnp.uint32)), None


def extract_body(carry, codes):
    planes, valid = ext.extract_kmers(codes, K, "canonical")
    s = jnp.uint32(0)
    for p in planes:
        s = s + p[0] + p[-1]
    return carry + s + jnp.sum(valid.astype(jnp.uint32)), None


@jax.jit
def null_fn(x):
    return x[0] + jnp.uint32(1)


def make(body):
    @jax.jit
    def pipeline(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out
    return pipeline


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # null: dispatch + scalar fetch of a trivial program
    tiny = [jax.device_put(jnp.asarray(
        rng.integers(0, 4, size=256).astype(np.uint32))) for _ in range(4)]
    jax.block_until_ready(tiny)
    dt = timeit_fetch(null_fn, tiny)
    print(f"null dispatch+fetch: {dt*1e3:8.1f} ms", flush=True)

    L = 1 << 20
    for total_log in (24, 26):
        TOTAL = 1 << total_log
        R = TOTAL // L
        inputs = [jax.device_put(jnp.asarray(
            rng.integers(0, 4, size=(R, L)).astype(np.uint8)))
            for _ in range(4)]
        jax.block_until_ready(inputs)
        for name, body in (("extract", extract_body), ("full", full_body)):
            fn = make(body)
            dt = timeit_fetch(fn, inputs)
            print(f"2^{total_log} {name:8s}: {dt*1e3:8.1f} ms -> "
                  f"{TOTAL/dt/1e6:7.1f} Mbases/s", flush=True)


if __name__ == "__main__":
    main()

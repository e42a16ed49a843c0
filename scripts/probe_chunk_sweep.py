"""Sweep device chunk length for the full counting pipeline at fixed
large TOTAL (RTT-amortized, fetch-grounded).  Picks the bench config.

Run: python scripts/probe_chunk_sweep.py [logL ...]
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
TOTAL = 1 << 26


def timeit_fetch(fn, inputs, reps=3):
    assert len(inputs) >= reps + 1
    int(fn(inputs[0]))
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        int(fn(inputs[1 + r]))
        best = min(best, time.perf_counter() - t0)
    return best


def make(L):
    def body(carry, codes):
        planes, valid = ext.extract_kmers(codes, K, "canonical")
        splanes, start, n_invalid = cnt.sort_starts(planes, valid)
        return (carry + jnp.sum(start.astype(jnp.uint32))
                + splanes[0][0] + splanes[-1][-1]
                + n_invalid.astype(jnp.uint32)), None

    @jax.jit
    def pipeline(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out
    return pipeline


def main():
    logs = [int(a) for a in sys.argv[1:]] or [16, 17, 18, 19, 20]
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    for logL in logs:
        L = 1 << logL
        R = TOTAL // L
        inputs = [jax.device_put(jnp.asarray(
            rng.integers(0, 4, size=(R, L)).astype(np.uint8)))
            for _ in range(4)]
        jax.block_until_ready(inputs)
        dt = timeit_fetch(make(L), inputs)
        print(f"L=2^{logL}: {dt*1e3:8.1f} ms -> {TOTAL/dt/1e6:7.1f} "
              f"Mbases/s", flush=True)


if __name__ == "__main__":
    main()

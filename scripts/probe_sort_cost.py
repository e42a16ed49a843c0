"""On-chip probe: where does device time go, and what do sort variants
cost?  One dispatch per measurement (lax.scan over many chunks inside a
single jitted program) so tunnel dispatch latency cannot distort the
numbers (VERDICT r1 weakness #1).

Run on the real chip:  python scripts/probe_sort_cost.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from meryl_tpu.ops import count as cnt
from meryl_tpu.ops import extract as ext

K = 21


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_pipeline(chunks, k, stage):
    """chunks: (R, L) uint8.  Reduces each chunk to a scalar so no big
    outputs leave the device; scan body is the real per-chunk program."""
    def body(carry, codes):
        planes, valid = ext.extract_kmers(codes, k, "canonical")
        if stage == "extract":
            s = sum(jnp.sum(p) for p in planes) + jnp.sum(valid)
            return carry + s.astype(jnp.uint32), None
        if stage == "sort1":  # sort MSB plane only, no payload
            s = lax.sort((planes[-1],), num_keys=1)[0]
            return carry + s[0] + s[-1], None
        if stage == "sort1p":  # 1 key + 1 payload plane
            s = lax.sort((planes[-1], planes[0]), num_keys=1)
            return carry + s[0][0] + s[1][-1], None
        if stage == "sort2":  # the production 2-key multiword sort
            s, _ = cnt._sort_planes(planes)
            return carry + s[0][0] + s[1][-1], None
        if stage == "full":  # production: sort + run starts
            splanes, start, n_invalid = cnt.sort_starts(planes, valid)
            return (carry + jnp.sum(start.astype(jnp.uint32))
                    + splanes[0][0]), None
        raise ValueError(stage)

    out, _ = lax.scan(body, jnp.uint32(0), chunks)
    return out


def main():
    import sys
    logLs = [int(a) for a in sys.argv[1:]] or [18, 20]
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    TOTAL = 1 << 24  # 16M bases per dispatch
    for logL in logLs:
        L = 1 << logL
        R = TOTAL // L
        chunks = jnp.asarray(
            rng.integers(0, 4, size=(R, L)).astype(np.uint8))
        jax.block_until_ready(chunks)
        for stage in ("extract", "sort1p", "sort2", "full"):
            f = jax.jit(lambda c, s=stage: scan_pipeline(c, K, s))
            dt = timeit(f, chunks)
            print(f"L=2^{logL} {stage:8s}: {dt*1e3:8.1f} ms "
                  f"-> {TOTAL/dt/1e6:7.1f} Mbases/s")


if __name__ == "__main__":
    main()

"""Candidate bench v3: the whole counting workload is ONE dispatch
(lax.scan over stacked chunks inside a single jitted program), so
tunnel/dispatch latency cannot distort the measurement.  Per-chunk
outputs are reduced to scalars on device; the scalar consumes the sort
(run-start mask needs the full sorted order), so nothing is DCE'd.

Validated against bench.py's dispatch-loop number, then folded in.
"""
import json
import time

import numpy as np


def bench_counting_scan(k=21, logL=20, total_log2=24, trials=4):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu.ops import count as cnt
    from meryl_tpu.ops import extract as ext

    L = 1 << logL
    R = (1 << total_log2) // L
    rng = np.random.default_rng(0)

    def body(carry, codes):
        planes, valid = ext.extract_kmers(codes, k, "canonical")
        splanes, start, n_invalid = cnt.sort_starts(planes, valid)
        s = jnp.sum(start.astype(jnp.uint32)) + splanes[0][0] + n_invalid
        return carry + s, None

    @jax.jit
    def pipeline(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out

    # distinct data per trial (identical inputs can be memoized)
    inputs = [jax.device_put(jnp.asarray(
        rng.integers(0, 4, size=(R, L)).astype(np.uint8)))
        for _ in range(2)]
    jax.block_until_ready(inputs)
    jax.block_until_ready(pipeline(inputs[0]))  # compile
    jax.block_until_ready(pipeline(inputs[1]))  # warm

    best = 0.0
    times = []
    for t in range(trials):
        x = inputs[t % 2]
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(x))
        dt = time.perf_counter() - t0
        times.append(dt)
        best = max(best, (R * L) / dt)
    return best, times


if __name__ == "__main__":
    import sys
    logL = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    best, times = bench_counting_scan(logL=logL)
    print(json.dumps({"logL": logL, "best_bases_per_s": round(best, 1),
                      "times_s": [round(t, 4) for t in times]}))

"""On-chip probe: batched row sort vs 1D sort for the counting hot
path.  lax.sort along the last axis of an (R, L) array sorts rows
independently — if per-element cost drops with row length (sort cost is
superlinear), replacing the single 2^20..2^22 chunk sort with a row-
batched sort + host merge of per-row runs is a cheap large win
(duplicates across rows are union-summed by the existing host merge
cascade, so correctness is unaffected).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_batched_sort.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, inputs, reps=3):
    """inputs must contain reps+1 DISTINCT argument tuples: the axon
    remote executor memoizes per (executable, input) — reusing an input
    returns instantly and understates cost by 100x (CLAUDE.md)."""
    assert len(inputs) >= reps + 1
    jax.block_until_ready(fn(*inputs[0]))  # compile
    best = 1e9
    for r in range(reps):
        args = inputs[1 + r]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import sys
    TOTAL = 1 << 24
    logs = [int(a) for a in sys.argv[1:]] or [12, 14, 16, 18, 20, 24]
    rng = np.random.default_rng(0)

    @jax.jit
    def rowsort(a, b):
        sa, sb = lax.sort((a, b), num_keys=2, dimension=-1)
        # consume: run-start count per row (the real next step)
        neq = (sa[:, 1:] != sa[:, :-1]) | (sb[:, 1:] != sb[:, :-1])
        return jnp.sum(neq.astype(jnp.uint32)) + sa[0, 0] + sb[-1, -1]

    for logL in logs:
        L = 1 << logL
        R = TOTAL // L
        inputs = []
        for _ in range(4):
            a = jnp.asarray(rng.integers(0, 1 << 10, size=(R, L),
                                         dtype=np.int64).astype(np.uint32))
            b = jnp.asarray(rng.integers(0, 1 << 32, size=(R, L),
                                         dtype=np.int64).astype(np.uint32))
            inputs.append((a, b))
        jax.block_until_ready(inputs)
        dt = timeit(rowsort, inputs)
        print(f"rows {R:6d} x L=2^{logL:2d}: {dt*1e3:8.1f} ms "
              f"-> {TOTAL/dt/1e6:7.1f} Melt/s", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: canonical k=21 kmer counting throughput on device.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): reference meryl publishes no numbers; the
north-star target is 5 GB/s FASTQ counting on a v5p-16 pod.  A FASTQ
byte stream is ~2 bytes per base (sequence + quality lines), so the
per-pod base target is ~2.5e9 bases/s; per chip (v5p-16 = 8 chips)
~3.125e8 bases/s.  vs_baseline = measured bases/s on this host's chips
divided by the per-chip target times local chip count.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from meryl_tpu.counter import _chunk_pipeline

    K = 21
    CHUNK = 1 << 20  # 1M bases per device step (sort cost is superlinear;
    #                  small chunks pipeline better — see docs/tpu-design.md)
    REPS = 32

    rng = np.random.default_rng(0)
    # distinct chunks per rep: identical repeated inputs can be
    # memoized by the runtime and overstate throughput
    chunks = [jax.device_put(
        jnp.asarray(rng.integers(0, 4, size=CHUNK).astype(np.uint8)))
        for _ in range(REPS)]

    # warmup / compile (staged: programs split at sort boundaries)
    jax.block_until_ready(_chunk_pipeline(chunks[0], K, "canonical"))

    t0 = time.perf_counter()
    outs = [_chunk_pipeline(c, K, "canonical") for c in chunks]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    bases_per_s = REPS * CHUNK / dt
    n_chips = jax.device_count()
    per_chip_target = 2.5e9 / 8  # bases/s per chip at the 5 GB/s-FASTQ north star
    vs = bases_per_s / (per_chip_target * n_chips)

    print(json.dumps({
        "metric": "count_k21_canonical_throughput",
        "value": round(bases_per_s, 1),
        "unit": "bases/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()

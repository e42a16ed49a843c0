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
    from meryl_tpu.ops import extract as ext
    from meryl_tpu.ops import count as cnt

    K = 21
    CHUNK = 1 << 24  # 16M bases per device step
    REPS = 8

    def forward(codes):
        planes, valid = ext.extract_kmers(codes, K, "canonical")
        splanes, counts, start, n_unique = cnt.sort_count(planes, valid)
        hist = cnt.value_histogram(counts, start, 1024)
        return n_unique, hist

    fwd = jax.jit(forward)
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        jnp.asarray(rng.integers(0, 4, size=CHUNK).astype(np.uint8)))

    # warmup / compile
    jax.block_until_ready(fwd(codes))

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fwd(codes)
    jax.block_until_ready(out)
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

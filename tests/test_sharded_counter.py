"""Multi-step sharded counting (ShardedCounter) vs the oracle."""

import numpy as np
import jax
from jax.sharding import Mesh

from meryl_tpu import kmer as km, oracle
from meryl_tpu.parallel.shard_count import ShardedCounter


def test_sharded_counter_multi_step():
    n_dev, chunk, k, steps = 8, 256, 13, 3
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=8 * 1024)
    rng = np.random.default_rng(12)
    seqs = []
    for _ in range(steps):
        codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
        for d in range(n_dev):
            s = codes[d * chunk:(d + 1) * chunk]
            seqs.append("".join(km.ALPHABET[c] for c in s))
        sc.add_codes(codes)
    hi, lo, counts = sc.finalize()
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want
    # finalize() output must already be globally sorted
    keys = [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]
    assert keys == sorted(keys)


def test_sharded_counter_with_separators():
    """Invalid codes (sequence separators / N bases) inside shards."""
    n_dev, chunk, k = 4, 256, 11
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=4 * 1024)
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
    codes[rng.integers(0, len(codes), size=30)] = 255
    seqs = []
    for d in range(n_dev):
        s = codes[d * chunk:(d + 1) * chunk]
        seqs.append("".join(km.ALPHABET[c] if c < 4 else "N" for c in s))
    sc.add_codes(codes)
    hi, lo, counts = sc.finalize()
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want


def test_sharded_counter_overflow_detection():
    import pytest
    n_dev, chunk, k = 2, 256, 13
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=64)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
    with pytest.raises(RuntimeError, match="overflow"):
        sc.add_codes(codes)

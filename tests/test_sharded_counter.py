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
    """A single step larger than acc_cap cannot spill its way out and
    must fail loudly (spilling only helps across steps).  add_codes is
    pipelined 1 deep, so the error surfaces by finalize at the latest —
    always before any results are produced."""
    import pytest
    n_dev, chunk, k = 2, 256, 13
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=64)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
    with pytest.raises(RuntimeError, match="overflow"):
        sc.add_codes(codes)
        sc.finalize()


def test_sharded_counter_spill_and_histogram():
    """Total uniques exceed acc_cap across steps: the accumulator must
    spill to host runs (reference P5 batch dump) and finalize() must
    union-sum them; the histogram computed from final counts must equal
    the oracle's (VERDICT r1 item 3)."""
    n_dev, chunk, k, steps = 4, 256, 13, 5
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=512)
    rng = np.random.default_rng(77)
    seqs = []
    for _ in range(steps):
        codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
        for d in range(n_dev):
            s = codes[d * chunk:(d + 1) * chunk]
            seqs.append("".join(km.ALPHABET[c] for c in s))
        sc.add_codes(codes)
    assert any(len(r) for r in sc._spills.values()), \
        "spill path not exercised"
    hi, lo, counts = sc.finalize()
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want
    # exact histogram from final merged counts
    gv, go = np.unique(counts, return_counts=True)
    wv, wo = np.unique(oc, return_counts=True)
    assert gv.tolist() == wv.tolist()
    assert go.tolist() == wo.tolist()


def test_sharded_counter_wide_mesh():
    """8 devices at a larger chunk: results must still match the
    oracle exactly (the all-to-all tiles 8-way and every owner block
    merges rows from all 8 sources)."""
    n_dev, chunk, k = 8, 512, 15
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk)
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
    seqs = ["".join(km.ALPHABET[c] for c in codes[d * chunk:(d + 1) * chunk])
            for d in range(n_dev)]
    sc.add_codes(codes)
    hi, lo, counts = sc.finalize()
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want


def test_sharded_counter_disk_spill(tmp_path):
    """spill_dir routes accumulator spills to .npz files; results are
    identical to the RAM-spill path and to the oracle."""
    from meryl_tpu import oracle

    n_dev, chunk, k, steps = 4, 256, 13, 5
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    rng = np.random.default_rng(3)
    seqs = []
    groups = []
    for _ in range(steps):
        group = []
        for _ in range(n_dev):
            codes = rng.integers(0, 4, size=chunk).astype(np.uint8)
            seqs.append("".join("ACTG"[c] for c in codes))
            group.append(codes)
        groups.append(np.concatenate(group))

    sd = str(tmp_path / "spills")
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=512,
                        spill_dir=sd)
    for g in groups:
        sc.add_codes(g)
    hi, lo, counts = sc.finalize()
    import os
    assert os.path.isdir(sd) and len(os.listdir(sd)) > 0, \
        "expected disk spills with this acc_cap"

    ohi, olo, oc = oracle.count_kmers(seqs, k)
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    want = {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want


def test_sharded_counter_finalize_once():
    """finalize consumes the accumulator; a second call must raise, not
    silently return spill-only data."""
    import pytest

    n_dev, chunk, k = 2, 128, 9
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    sc = ShardedCounter(mesh, k, chunk_len=chunk, acc_cap=4 * 1024)
    rng = np.random.default_rng(5)
    sc.add_codes(rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8))
    sc.finalize()
    with pytest.raises(RuntimeError, match="already finalized"):
        sc.finalize()
    with pytest.raises(RuntimeError, match="already finalized"):
        sc.finalize_parts()

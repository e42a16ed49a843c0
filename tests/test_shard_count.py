"""Multi-chip sharded counting must reproduce the single-stream oracle.

Exercises the full SPMD step (extract -> local sort/count -> all-to-all
on the ownership prefix -> owner merge) on a virtual 8-device CPU mesh
(see conftest.py).
"""

import numpy as np
import jax
from jax.sharding import Mesh

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.parallel import shard_count as sc


def _run(k, n_dev, chunk_len, seed=3, **kw):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n_dev * chunk_len).astype(np.uint8)
    step = sc.make_sharded_count_step(mesh, k, chunk_len=chunk_len, **kw)
    planes, counts, n_unique, overflow = step(codes)
    assert int(np.asarray(overflow)) == 0
    planes = [np.asarray(p).reshape(-1) for p in planes]
    counts = np.asarray(counts).reshape(-1)
    keep = counts > 0
    # n_unique is the replicated per-device MAX (multihost-safe control
    # scalar); real totals come from the data itself
    per_dev = (np.asarray(counts).reshape(n_dev, -1) > 0).sum(axis=1)
    assert int(np.asarray(n_unique)) == int(per_dev.max())
    hi, lo = km.hilo_from_planes([p[keep] for p in planes])
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts[keep])}

    # oracle: each device's shard is an independent sequence (no halo in
    # the SPMD step — shard boundaries are sequence boundaries)
    seqs = []
    for d in range(n_dev):
        s = codes[d * chunk_len:(d + 1) * chunk_len]
        seqs.append("".join(km.ALPHABET[c] for c in s))
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c) for h, l, c in zip(ohi, olo, oc)}
    return got, want


def test_sharded_count_k15_matches_oracle():
    got, want = _run(15, 8, 512)
    assert got == want


def test_sharded_count_k31_matches_oracle():
    got, want = _run(31, 8, 256)
    assert got == want


def test_sharded_count_k33_threeplane_matches_oracle():
    got, want = _run(33, 4, 256)
    assert got == want


def test_sharded_count_k16_sentinel_boundary():
    # 2k == 32: poly-G kmer collides with the sort sentinel
    got, want = _run(16, 2, 128, seed=11)
    assert got == want


def test_sharded_count_wide_prefix():
    # 8 devices on a 10-bit ownership prefix (the >64-device layout)
    got, want = _run(15, 8, 256, prefix_bits=10)
    assert got == want


def test_sharded_count_pair_overflow_detected():
    mesh = Mesh(np.array(jax.devices()[:2]), ("d",))
    # poly-A shards: every kmer is AAAA... -> one owner pair gets all
    codes = np.zeros(2 * 256, np.uint8)
    rng = np.random.default_rng(0)
    codes[512 - 256:] = rng.integers(0, 4, size=256).astype(np.uint8)
    step = sc.make_sharded_count_step(mesh, 13, chunk_len=256, pair_cap=8)
    _, _, _, overflow = step(codes)
    assert int(np.asarray(overflow)) > 0


def test_default_prefix_bits():
    assert sc.default_prefix_bits(8, 21) == 6
    assert sc.default_prefix_bits(64, 21) == 8
    assert sc.default_prefix_bits(128, 21) == 9
    assert sc.default_prefix_bits(256, 21) == 10
    assert sc.default_prefix_bits(4, 4) == 6
    import pytest
    with pytest.raises(ValueError):
        sc.default_prefix_bits(1 << 17, 64)  # > 2^16 devices

"""Sort-merge join bulk lookup vs binary search and the naive model."""

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.lookup import ExactLookup

K = 11


def test_values_bulk_matches_binary_search(tmp_path):
    rng = np.random.default_rng(17)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=6000))
    hi, lo, c = oracle.count_kmers([seq], K)
    dbp = str(tmp_path / "d.meryl")
    MerylDB.write(dbp, K, hi, lo, c)
    L = ExactLookup(MerylDB.open(dbp))

    # queries: half present, half random; some invalid
    n = 5000
    q = np.zeros(n, dtype=object)
    present = rng.integers(0, len(c), size=n // 2)
    qints = [(int(hi[i]) << 64) | int(lo[i]) for i in present]
    qints += [int(rng.integers(0, 1 << (2 * K))) for _ in range(n - n // 2)]
    qhi = np.array([x >> 64 for x in qints], np.uint64)
    qlo = np.array([x & ((1 << 64) - 1) for x in qints], np.uint64)
    valid = rng.random(n) > 0.1
    planes = km.planes_from_hilo(qhi, qlo, L.P)

    bulk = L.values_join([np.asarray(p) for p in planes], valid)
    import jax.numpy as jnp
    bs = np.asarray(L.values_batch([jnp.asarray(p) for p in planes],
                                   jnp.asarray(valid)))
    np.testing.assert_array_equal(bulk, bs)

    d = {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}
    want = np.array([d.get(x, 0) if v else 0
                     for x, v in zip(qints, valid)], np.uint32)
    np.testing.assert_array_equal(bulk, want)


def test_values_bulk_sentinel_query(tmp_path):
    """All-ones invalid queries must not pick up a poly-G DB kmer when
    2k is a multiple of 32."""
    k = 16
    polyg = km.string_to_kmer("G" * 16)
    hi = np.array([0], np.uint64)
    lo = np.array([polyg], np.uint64)
    dbp = str(tmp_path / "pg.meryl")
    MerylDB.write(dbp, 16, hi, lo, np.array([9], np.uint32))
    L = ExactLookup(MerylDB.open(dbp))
    qplanes = [np.full(4, 0xFFFFFFFF, np.uint32)]
    valid = np.array([True, False, True, False])
    out = L.values_join(qplanes, valid)
    # poly-G == all-ones key: valid queries find it, invalid get 0
    np.testing.assert_array_equal(out, [9, 0, 9, 0])

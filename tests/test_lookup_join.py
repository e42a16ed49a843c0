"""Differential tests for the routed-join bulk lookup
(lookup._route_join_kernel_impl): gather-free large-batch lookup vs
the binary-search path and a naive dict model, including duplicate
queries (host forward-fill), cell overflow (fallback), invalid masks,
and the all-ones-key corner."""

import jax.numpy as jnp
import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import lookup as lk
from meryl_tpu.db import MerylDB

K = 21


@pytest.fixture(autouse=True)
def small_join(monkeypatch):
    monkeypatch.setattr(lk.ExactLookup, "JOIN_SLAB", 1 << 14)
    monkeypatch.setattr(lk.ExactLookup, "JOIN_R0", 4)
    monkeypatch.setattr(lk.ExactLookup, "JOIN_MIN_Q", 1 << 8)
    monkeypatch.setattr(lk.ExactLookup, "JOIN_MIN_N", 1 << 8)
    monkeypatch.setattr(lk.ExactLookup, "_LDB_TARGET", 1 << 11)


def _table(tmp_path, rng, n=50000, k=K):
    lo = np.unique(rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)
                   if 2 * k < 64 else
                   rng.integers(0, 1 << 63, size=n, dtype=np.uint64))
    hi = np.zeros(len(lo), np.uint64)
    c = rng.integers(1, 1000, size=len(lo)).astype(np.uint32)
    db = MerylDB.write(str(tmp_path / "db.meryl"), k, hi, lo, c)
    return lk.ExactLookup(db), lo, c


def _qplanes(lo, P):
    hi = np.zeros(len(lo), np.uint64)
    return km.planes_from_hilo(hi, lo, P)


def test_join_matches_dict(tmp_path):
    rng = np.random.default_rng(1)
    table, lo, c = _table(tmp_path, rng)
    model = {int(x): int(v) for x, v in zip(lo, c)}
    q = np.concatenate([
        rng.choice(lo, size=3000),                       # hits
        rng.integers(0, 1 << (2 * K), size=3000, dtype=np.uint64),
        np.repeat(rng.choice(lo, size=5), 200),          # duplicates
        np.repeat(rng.integers(0, 1 << (2 * K), size=5,
                               dtype=np.uint64), 150),   # dup misses
    ])
    rng.shuffle(q)
    valid = rng.random(len(q)) < 0.9
    got = table.values_bulk(_qplanes(q, table.P), valid)
    want = np.array([model.get(int(x), 0) if v else 0
                     for x, v in zip(q, valid)], np.uint32)
    assert np.array_equal(got, want)
    assert table._grouped not in (None, "degenerate")  # join path ran


def test_join_matches_bsearch_random(tmp_path):
    rng = np.random.default_rng(2)
    table, lo, c = _table(tmp_path, rng, n=30000)
    q = rng.integers(0, 1 << (2 * K), size=9000, dtype=np.uint64)
    q[::3] = rng.choice(lo, size=len(q[::3]))
    valid = np.ones(len(q), bool)
    qp = _qplanes(q, table.P)
    got = table.values_bulk(qp, valid)
    want = table._values_bulk_bsearch(qp, valid)
    assert np.array_equal(got, want)


def test_join_overflow_fallback(tmp_path):
    """Thousands of copies of a few keys overflow their cells; the
    overflow fallback must still answer every query exactly."""
    rng = np.random.default_rng(3)
    table, lo, c = _table(tmp_path, rng, n=20000)
    model = {int(x): int(v) for x, v in zip(lo, c)}
    hot_hit = lo[7]
    hot_miss = np.uint64(123456789)
    assert int(hot_miss) not in model
    q = np.concatenate([
        np.repeat(hot_hit, 2000),
        np.repeat(hot_miss, 2000),
        rng.choice(lo, size=1000),
    ])
    rng.shuffle(q)
    got = table.values_bulk(_qplanes(q, table.P), np.ones(len(q), bool))
    want = np.array([model.get(int(x), 0) for x in q], np.uint32)
    assert np.array_equal(got, want)


def test_join_allones_key(tmp_path):
    """k=16 (2k == 32): the all-ones kmer is a real key that shares its
    plane pattern with padding."""
    rng = np.random.default_rng(4)
    k = 16
    lo = np.unique(rng.integers(0, 1 << 32, size=20000, dtype=np.uint64))
    lo = np.unique(np.concatenate([lo, [np.uint64((1 << 32) - 1)]]))
    hi = np.zeros(len(lo), np.uint64)
    c = rng.integers(1, 100, size=len(lo)).astype(np.uint32)
    db = MerylDB.write(str(tmp_path / "db16.meryl"), k, hi, lo, c)
    table = lk.ExactLookup(db)
    model = {int(x): int(v) for x, v in zip(lo, c)}
    q = np.concatenate([
        np.repeat(np.uint64((1 << 32) - 1), 500),
        rng.choice(lo, size=2000),
        rng.integers(0, 1 << 32, size=2000, dtype=np.uint64),
    ])
    rng.shuffle(q)
    got = table.values_bulk(_qplanes(q, table.P), np.ones(len(q), bool))
    want = np.array([model.get(int(x), 0) for x in q], np.uint32)
    assert np.array_equal(got, want)


def test_join_min_max_filter(tmp_path):
    """min/max value filtering happens at load; the join must see the
    filtered table."""
    rng = np.random.default_rng(5)
    lo = np.unique(rng.integers(0, 1 << (2 * K), size=20000,
                                dtype=np.uint64))
    hi = np.zeros(len(lo), np.uint64)
    c = rng.integers(1, 10, size=len(lo)).astype(np.uint32)
    db = MerylDB.write(str(tmp_path / "dbf.meryl"), K, hi, lo, c)
    table = lk.ExactLookup(db, min_value=5)
    model = {int(x): int(v) for x, v in zip(lo, c) if v >= 5}
    q = rng.choice(lo, size=4000)
    got = table.values_bulk(_qplanes(q, table.P), np.ones(len(q), bool))
    want = np.array([model.get(int(x), 0) for x in q], np.uint32)
    assert np.array_equal(got, want)


def test_join_exists_mode(tmp_path):
    """exists_only returns 0/1 with identical found-set semantics,
    including duplicates and overflow fallback."""
    rng = np.random.default_rng(9)
    table, lo, c = _table(tmp_path, rng, n=40000)
    model = {int(x) for x in lo}
    q = np.concatenate([
        rng.choice(lo, size=3000),
        rng.integers(0, 1 << (2 * K), size=3000, dtype=np.uint64),
        np.repeat(rng.choice(lo, size=4), 300),     # hit dups
        np.repeat(np.uint64(42), 500),              # miss dups
    ])
    rng.shuffle(q)
    valid = rng.random(len(q)) < 0.95
    got = table.values_bulk(_qplanes(q, table.P), valid,
                            exists_only=True)
    want = np.array([1 if (v and int(x) in model) else 0
                     for x, v in zip(q, valid)], np.uint32)
    assert np.array_equal(got, want)

"""Batched exact k-mer lookup: the merylExactLookup equivalent.

The reference builds an in-RAM table per database and probes one kmer
at a time from worker threads (interface at /root/repo/SURVEY.md §2.3;
call sites /root/reference/src/meryl-lookup/meryl-lookup.C:40-100,
dump.C:123-155, existence.C:81-110).  The TPU-native design instead
keeps the database as device-resident sorted plane arrays plus a
prefix-offset table, and answers *batches* of queries with a vectorized
multiword binary search — one kernel invocation per sequence chunk
instead of one hash probe per kmer.

value(kmer) == 0 means absent, matching the reference contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import kmer as km
from .db import MerylDB
from .ops import multiword as mw

U32 = jnp.uint32


def _prefix_bits_for(n_kmers: int, k: int) -> int:
    """Table of 2^B offsets; aim for ~4 kmers per prefix slot."""
    b = max(1, int(n_kmers).bit_length() - 2)
    return min(b, 2 * k, 22)


def _top_bits_np(hi: np.ndarray, lo: np.ndarray, k: int, b: int) -> np.ndarray:
    """Top b bits of each 2k-bit kmer (host)."""
    shift = 2 * k - b
    hi = np.asarray(hi, np.uint64)     # no copy when already u64
    lo = np.asarray(lo, np.uint64)
    if 2 * k <= 64:
        return (lo >> np.uint64(shift)).astype(np.uint64)
    if shift >= 64:
        return (hi >> np.uint64(shift - 64)).astype(np.uint64)
    nhi = 2 * k - 64
    out = hi << np.uint64(b - nhi)
    out |= lo >> np.uint64(shift)
    return out


def _top_bits_planes(planes, k: int, b: int):
    """Top b bits of each kmer from uint32 planes (device, int32 result).

    b <= 22 so the result fits int32."""
    top_bit = 2 * k - 1
    top_plane = top_bit // 32
    used = 2 * k - 32 * top_plane
    if used >= b:
        v = (planes[top_plane] >> U32(used - b))
        return (v & U32((1 << b) - 1)).astype(jnp.int32)
    need = b - used
    hi = planes[top_plane] & ((U32(1) << U32(used)) - U32(1))
    lo = planes[top_plane - 1] >> U32(32 - need)
    return ((hi.astype(jnp.int32) << need) | lo.astype(jnp.int32))


def _lower_bound(db_planes, offsets, q_planes, k: int, b: int,
                 iters: int):
    """Prefix-bucketed vectorized lower-bound over sorted multiword
    keys (traced helper shared by the value lookup here and the rank
    lookup in tools/position_lookup.py).

    db_planes: P arrays (N,) ascending
    offsets:   (2^b + 1,) int32 start offsets per b-bit prefix
    q_planes:  P arrays (Q,)
    -> (idx, found): clipped lower-bound rank per query, and whether
       the key at idx equals the query (caller ANDs its own validity).
    """
    pref = _top_bits_planes(q_planes, k, b)
    pref = jnp.clip(pref, 0, (1 << b) - 1)
    lo = offsets[pref]
    hi = offsets[pref + 1]
    end = hi
    for _ in range(iters):
        mid = (lo + hi) >> 1
        key = [jnp.take(p, mid, mode="clip") for p in db_planes]
        less = mw.lt(key, q_planes)
        active = lo < hi
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
    n = db_planes[0].shape[0]
    idx = jnp.minimum(lo, n - 1)
    key = [jnp.take(p, idx, mode="clip") for p in db_planes]
    found = mw.eq(key, q_planes) & (lo < end)
    return idx, found


@functools.partial(jax.jit, static_argnames=("k", "b", "iters"))
def _query_kernel(db_planes, db_values, offsets, q_planes, valid,
                  k: int, b: int, iters: int):
    """Value of each query kmer; 0 where absent or invalid."""
    idx, found = _lower_bound(db_planes, offsets, q_planes, k, b, iters)
    return jnp.where(found & valid,
                     jnp.take(db_values, idx, mode="clip"), U32(0))


@jax.jit
def _join_kernel(db_planes, db_values, q_planes, q_valid):
    """Sort-merge join: values of query kmers against the sorted DB.

    Gathers serialize on TPU (~250ms/16M), so instead of binary
    searches this concatenates [db, queries], radix-sorts once (db
    entries sort before their equal queries via stable order), and
    broadcasts each run's leading db value to its queries with a
    first-value segmented scan.  Returns values in the SORTED order
    plus each entry's original query index (host reorders).
    """
    from .ops import segscan

    P = len(db_planes)
    N = db_planes[0].shape[0]
    Q = q_planes[0].shape[0]
    planes = [jnp.concatenate([d, jnp.where(q_valid, q, ~jnp.uint32(0))])
              for d, q in zip(db_planes, q_planes)]
    is_db = jnp.concatenate([jnp.ones((N,), jnp.uint32),
                             jnp.zeros((Q,), jnp.uint32)])
    vals = jnp.concatenate([db_values, jnp.zeros((Q,), jnp.uint32)])
    qidx = jnp.concatenate([
        jnp.full((N,), Q, jnp.uint32),
        jax.lax.broadcasted_iota(jnp.uint32, (Q, 1), 0).reshape(Q)])

    keys = [planes[p] for p in range(P - 1, -1, -1)]
    srt = jax.lax.sort(tuple(keys) + (is_db, vals, qidx),
                       num_keys=P, is_stable=True)
    splanes = [srt[P - 1 - p] for p in range(P)]
    s_isdb, s_vals, s_qidx = srt[P], srt[P + 1], srt[P + 2]

    from .ops.multiword import run_starts
    start = run_starts(splanes)

    # broadcast the run-FIRST (value, is_db) to every run element
    first_val, first_db = segscan.seg_scan(
        lambda a, b: a, (s_vals, s_isdb), start)
    out = jnp.where((s_isdb == 0) & (first_db == 1), first_val, U32(0))
    return out, s_qidx


class ExactLookup:
    """Device-resident exact lookup table for one database.

    Mirrors merylExactLookup: load(db, minV, maxV), value(), exists(),
    nKmers().  Batched query methods take plane lists + validity masks.
    """

    def __init__(self, db: MerylDB, min_value: int = 0,
                 max_value: int = km.VALUE_MAX):
        self.db = db
        self.k = db.k
        self.P = km.num_planes(self.k)
        hi, lo, counts = db.load_all()
        if min_value > 0 or max_value < km.VALUE_MAX:
            keep = (counts >= min_value) & (counts <= max_value)
            hi, lo, counts = hi[keep], lo[keep], counts[keep]
        self._n = len(counts)
        self.B = _prefix_bits_for(max(self._n, 1), self.k)
        pref = _top_bits_np(hi, lo, self.k, self.B)
        offsets = np.searchsorted(
            pref, np.arange((1 << self.B) + 1, dtype=np.uint64)).astype(np.int32)
        self._offsets = jnp.asarray(offsets)
        planes = km.planes_from_hilo(hi, lo, self.P)
        if self._n == 0:  # keep kernels shape-happy
            planes = [np.zeros(1, np.uint32) for _ in range(self.P)]
            counts = np.zeros(1, np.uint32)
        self._planes = [jnp.asarray(p) for p in planes]
        self._values = jnp.asarray(np.ascontiguousarray(counts, np.uint32))
        max_range = int((offsets[1:] - offsets[:-1]).max()) if self._n else 1
        self._iters = max(1, int(max_range).bit_length())

    def n_kmers(self) -> int:
        return self._n

    def estimate_memory_bytes(self) -> int:
        """Device-memory footprint of the loaded table (the reference's
        estimateMemoryUsage reports RAM for its table the same way)."""
        return (self.P * 4 + 4) * max(self._n, 1) + 4 * (1 << self.B)

    def values_batch(self, q_planes, valid):
        """q_planes: P device arrays, valid: bool mask -> uint32 values."""
        return _query_kernel(self._planes, self._values, self._offsets,
                             q_planes, valid, self.k, self.B, self._iters)

    BULK_SLAB = 1 << 16

    def values_bulk(self, q_planes_np, valid_np) -> np.ndarray:
        """Values for a LARGE host-side query batch: fixed-size slabs
        through the prefix-table binary search (measured 4.3 Mq/s on
        v5e vs 1.8 Mq/s for the sort-merge join at 2M queries — the
        join re-sorts the DB per slab and pays host reordering).
        q_planes_np: P numpy arrays; valid_np: bool."""
        Q = len(valid_np)
        out = np.zeros(Q, np.uint32)
        slab = self.BULK_SLAB
        for s in range(0, Q, slab):
            e = min(Q, s + slab)
            n = e - s
            qp = []
            for p in q_planes_np:
                a = np.zeros(slab, np.uint32)
                a[:n] = p[s:e]
                qp.append(jnp.asarray(a))
            vv = np.zeros(slab, bool)
            vv[:n] = valid_np[s:e]
            vals = np.asarray(self.values_batch(qp, jnp.asarray(vv)))
            out[s:e] = vals[:n]
        return out

    def values_join(self, q_planes_np, valid_np) -> np.ndarray:
        """Sort-merge-join variant of values_bulk (one radix sort of
        DB+queries per slab, no gathers).  Faster than the binary
        search on backends where gathers dominate; slower on the v5e
        measurements above — kept as the alternative strategy."""
        Q = len(valid_np)
        out = np.zeros(Q, np.uint32)
        slab = max(self._n, 1 << 22)
        for s in range(0, Q, slab):
            e = min(Q, s + slab)
            qp = [jnp.asarray(p[s:e]) for p in q_planes_np]
            vv = jnp.asarray(valid_np[s:e])
            vals, qidx = _join_kernel(self._planes, self._values, qp, vv)
            vals = np.asarray(vals)
            qidx = np.asarray(qidx)
            m = qidx < (e - s)
            out[s:e][qidx[m]] = vals[m]
        out[~valid_np] = 0
        return out

    # ---- convenience host-side probes (small batches) ----

    def values_np(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        q = km.planes_from_hilo(np.asarray(hi, np.uint64),
                                np.asarray(lo, np.uint64), self.P)
        valid = jnp.ones(len(lo), bool)
        return np.asarray(self.values_batch([jnp.asarray(p) for p in q], valid))

    def value(self, kmer_int: int) -> int:
        hi, lo = km.hilo_from_int(kmer_int)
        return int(self.values_np(np.array([hi], np.uint64),
                                  np.array([lo], np.uint64))[0])

    def exists(self, kmer_int: int) -> bool:
        return self.value(kmer_int) > 0

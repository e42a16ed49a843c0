"""Device-side sort + run-length count of extracted kmers.

Replaces the reference's per-bucket spin-locked insert + std::sort + RLE
(/root/reference/src/meryl/merylCountArray.C:323-365) with one XLA sort
over multiword keys followed by a segmented reduction — the TPU-native
formulation (no locks, no data-dependent shapes).

Invalid entries are not carried as an extra sort key (multi-key sorts
compile and run slower): they are instead forced to the all-ones
sentinel key, which sorts to the tail.  A valid poly-G kmer can collide
with the sentinel when 2k is an exact multiple of 32 (k = 16/32/48/64);
the collision is corrected by subtracting the pre-computed invalid count
from the sentinel run's length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32
SENT = U32(0xFFFFFFFF)


def _sort_planes(planes, payloads=()):
    """Sort multiword keys ascending (plus optional payloads)."""
    P = len(planes)
    keys = [planes[p] for p in range(P - 1, -1, -1)]  # MSB plane first
    ops = lax.sort(tuple(keys) + tuple(payloads), num_keys=P)
    sorted_planes = [ops[P - 1 - p] for p in range(P)]  # back to LSB-first
    return sorted_planes, list(ops[P:])


def _run_starts(planes):
    """Boolean mask of run starts in sorted order."""
    neq = None
    for p in planes:
        d = p != jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, U32), p[:-1]])
        neq = d if neq is None else (neq | d)
    return neq | jnp.zeros_like(neq).at[0].set(True)


def _is_sentinel(planes):
    m = None
    for p in planes:
        e = p == SENT
        m = e if m is None else (m & e)
    return m


def _run_lengths(start, weights, L):
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    seg_sums = jax.ops.segment_sum(weights, seg, num_segments=L)
    return seg_sums[jnp.maximum(seg, 0)]


@jax.jit
def sort_count(planes, validb):
    """Sort kmers and run-length count duplicates.

    planes: list of P uint32 arrays (LSB plane first); validb: bool mask.
    Returns (sorted_planes, counts, start_mask, n_unique): entries where
    start_mask is True are the unique valid kmers in ascending ACTG
    order with their total counts (counts > 0 guaranteed).
    """
    L = planes[0].shape[0]
    n_invalid = jnp.sum((~validb).astype(jnp.int32))
    masked = [jnp.where(validb, p, SENT) for p in planes]
    splanes, _ = _sort_planes(masked)
    start = _run_starts(splanes)
    ones = jnp.ones((L,), jnp.int32)
    counts = _run_lengths(start, ones, L)
    counts = counts - jnp.where(_is_sentinel(splanes), n_invalid, 0)
    start = start & (counts > 0)
    n_unique = jnp.sum(start.astype(jnp.int32))
    return splanes, counts.astype(U32), start, n_unique


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact(planes, counts, start, capacity: int):
    """Scatter run-start entries into the first n slots of fixed-size
    arrays (padded with all-ones sentinel kmers / zero counts)."""
    idx = jnp.cumsum(start.astype(jnp.int32)) - 1
    idx = jnp.where(start, idx, capacity)  # dropped by scatter mode='drop'
    out_planes = [
        jnp.full((capacity,), 0xFFFFFFFF, U32).at[idx].set(p, mode="drop")
        for p in planes
    ]
    out_counts = jnp.zeros((capacity,), U32).at[idx].set(counts, mode="drop")
    return out_planes, out_counts


@functools.partial(jax.jit, static_argnames=("num_values",))
def value_histogram(counts, start, num_values: int):
    """Histogram of run counts: h[v] = #unique kmers with count v
    (counts >= num_values accumulate in the last bin; h[0] forced 0)."""
    v = jnp.where(start, jnp.minimum(counts, U32(num_values - 1)), U32(0))
    ones = jnp.where(start, 1, 0).astype(jnp.int32)
    return jax.ops.segment_sum(ones, v.astype(jnp.int32),
                               num_segments=num_values).at[0].set(0)


@jax.jit
def merge_counted(planes_a, counts_a, planes_b, counts_b):
    """Merge two unique-kmer/count arrays (all-ones sentinel padding with
    zero counts) into one sorted unique array of size len(a)+len(b).
    Returns (planes, counts, start_mask); start & counts>0 marks output."""
    planes = [jnp.concatenate([a, b]) for a, b in zip(planes_a, planes_b)]
    counts = jnp.concatenate([counts_a, counts_b])
    L = counts.shape[0]
    splanes, payl = _sort_planes(planes, (counts,))
    start = _run_starts(splanes)
    out_counts = _run_lengths(start, payl[0].astype(jnp.uint32), L)
    start = start & (out_counts > 0)
    return splanes, out_counts.astype(U32), start

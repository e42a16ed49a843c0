"""Device-side sort + run-length count of extracted kmers.

Replaces the reference's per-bucket spin-locked insert + std::sort + RLE
(/root/reference/src/meryl/merylCountArray.C:323-365) with one XLA sort
over multiword keys followed by a segmented reduction — the TPU-native
formulation (no locks, no data-dependent shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32


def _sort_keys(planes, invalid_u32, payloads=()):
    """Sort by (invalid, msb_plane..lsb_plane); invalid entries go last."""
    P = len(planes)
    keys = [invalid_u32] + [planes[p] for p in range(P - 1, -1, -1)]
    ops = lax.sort(tuple(keys) + tuple(payloads), num_keys=P + 1)
    inv = ops[0]
    sorted_planes = [ops[P - p] for p in range(P)]  # back to LSB-first
    return sorted_planes, inv, list(ops[P + 1:])


def _run_starts(planes, inv):
    """Boolean mask of run starts in sorted order (valid entries only)."""
    neq = None
    for p in planes:
        d = p != jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, U32), p[:-1]])
        neq = d if neq is None else (neq | d)
    first = jnp.zeros_like(neq).at[0].set(True)
    return (neq | first) & (inv == 0)


@functools.partial(jax.jit, static_argnames=())
def _sort_count_impl(planes, validb):
    L = planes[0].shape[0]
    inv = jnp.where(validb, U32(0), U32(1))
    splanes, sinv, _ = _sort_keys(planes, inv)
    start = _run_starts(splanes, sinv)
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    ones = jnp.where(sinv == 0, 1, 0).astype(jnp.int32)
    seg_counts = jax.ops.segment_sum(ones, seg, num_segments=L)
    counts = seg_counts[jnp.maximum(seg, 0)].astype(U32)
    n_unique = jnp.sum(start.astype(jnp.int32))
    return splanes, counts, start, n_unique


def sort_count(planes, validb):
    """Sort kmers and run-length count duplicates.

    Returns (sorted_planes, counts, start_mask, n_unique): entries where
    start_mask is True are the unique kmers (in ascending ACTG order)
    with their total counts.
    """
    return _sort_count_impl(planes, validb)


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
    (v < num_values; counts >= num_values accumulate in the last bin)."""
    v = jnp.where(start, jnp.minimum(counts, U32(num_values - 1)), U32(0))
    seg = v.astype(jnp.int32)
    ones = jnp.where(start, 1, 0).astype(jnp.int32)
    return jax.ops.segment_sum(ones, seg, num_segments=num_values).at[0].set(0)


@functools.partial(jax.jit, static_argnames=())
def merge_counted(planes_a, counts_a, planes_b, counts_b):
    """Merge two unique-kmer/count arrays (sentinel-padded) into one
    sorted unique array of size len(a)+len(b): concat, sort, sum counts
    of equal kmers.  Returns (planes, counts, start_mask)."""
    planes = [jnp.concatenate([a, b]) for a, b in zip(planes_a, planes_b)]
    counts = jnp.concatenate([counts_a, counts_b])
    validb = counts > 0
    L = counts.shape[0]
    inv = jnp.where(validb, U32(0), U32(1))
    splanes, sinv, payl = _sort_keys(planes, inv, (counts,))
    scounts = payl[0]
    start = _run_starts(splanes, sinv)
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    seg_counts = jax.ops.segment_sum(
        jnp.where(sinv == 0, scounts, U32(0)).astype(jnp.uint32), seg, num_segments=L)
    out_counts = seg_counts[jnp.maximum(seg, 0)].astype(U32)
    return splanes, out_counts, start

"""Counting driver: sequence files -> sorted unique (kmer, count) arrays -> DB.

TPU-native replacement for the reference's threaded counter
(/root/reference/src/meryl/merylOp-countThreads.C): instead of
spin-locked prefix buckets + std::sort per bucket, each fixed-size chunk
of bases is encoded, canonicalized, sorted and run-length counted on
device in one fused jitted pipeline; chunk results (already deduplicated
within the chunk) are merged at the end.  Out-of-core behavior (the
reference's batch dumps, merylOp-count.C:577-603) maps to spilling
chunk results to host RAM and merging there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import kmer as km
from .db import MerylDB
from .io.sequence import SequenceChunker
from .ops import count as cnt
from .ops import extract as ext

import os as _os

# bases per device chunk; overridable for small runs / tests where XLA
# compile time on a fresh signature dominates
DEFAULT_CHUNK = int(_os.environ.get("MERYL_TPU_CHUNK", 1 << 22))


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def _chunk_pipeline(codes, k: int, mode: str):
    """codes (L,) uint8 -> (sorted planes, counts, start mask)."""
    planes, valid = ext.extract_kmers(codes, k, mode)
    splanes, counts, start, n_unique = cnt.sort_count(planes, valid)
    return splanes, counts, start, n_unique


def _compact_host(splanes, counts, start):
    start = np.asarray(start)
    idx = np.flatnonzero(start)
    planes_np = [np.asarray(p)[idx] for p in splanes]
    c = np.asarray(counts)[idx]
    hi, lo = km.hilo_from_planes(planes_np)
    return hi, lo, c.astype(np.uint64)


def merge_runs(runs):
    """Merge per-chunk unique (hi, lo, counts-u64) triples into one
    globally sorted unique triple; counts clamped to kmvalu max."""
    if not runs:
        z = np.zeros(0, np.uint64)
        return z, z.copy(), np.zeros(0, np.uint32)
    hi = np.concatenate([r[0] for r in runs])
    lo = np.concatenate([r[1] for r in runs])
    c = np.concatenate([r[2] for r in runs]).astype(np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo, c = hi[order], lo[order], c[order]
    new = np.empty(len(hi), dtype=bool)
    new[0:1] = True
    np.logical_or(hi[1:] != hi[:-1], lo[1:] != lo[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    csum = np.add.reduceat(c, starts) if len(starts) else np.zeros(0, np.uint64)
    counts = np.minimum(csum, km.VALUE_MAX).astype(np.uint32)
    return hi[starts], lo[starts], counts


def count_to_arrays(paths, k: int, mode: str = "canonical", hpc: bool = False,
                    chunk_len: int = DEFAULT_CHUNK, progress=None):
    """Count kmers in sequence files.  Returns sorted (hi, lo, counts)."""
    if not (1 <= k <= km.K_MAX):
        raise ValueError(f"k must be in [1, {km.K_MAX}], got {k}")
    runs = []
    nbases = 0
    for chunk in SequenceChunker(paths, k, chunk_len, hpc=hpc):
        codes = jnp.asarray(chunk)
        splanes, counts, start, _ = _chunk_pipeline(codes, k, mode)
        runs.append(_compact_host(splanes, counts, start))
        nbases += len(chunk)
        if progress:
            progress(nbases)
    return merge_runs(runs)


def count_to_db(paths, out_path: str, k: int, mode: str = "canonical",
                hpc: bool = False, chunk_len: int = DEFAULT_CHUNK) -> MerylDB:
    hi, lo, counts = count_to_arrays(paths, k, mode=mode, hpc=hpc,
                                     chunk_len=chunk_len)
    return MerylDB.write(out_path, k, hi, lo, counts, mode=mode, hpc=hpc)

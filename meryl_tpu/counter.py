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


@functools.partial(jax.jit, static_argnames=("k", "mode", "suffix"))
def _chunk_pipeline(codes, k: int, mode: str, suffix=None):
    """codes (L,) uint8 -> (sorted planes, counts, start mask).

    suffix: optional (bits, length) static pair — only count kmers whose
    last `length` bases encode to `bits` (the reference's count-suffix,
    /root/reference/src/meryl/merylOp-countSimple.C:50-90)."""
    planes, valid = ext.extract_kmers(codes, k, mode)
    if suffix is not None:
        sbits, slen = suffix
        need = 2 * slen
        for p, pl in enumerate(planes):
            bits_here = min(32, need - 32 * p)
            if bits_here <= 0:
                break
            want = jnp.uint32((sbits >> (32 * p)) & ((1 << bits_here) - 1))
            mask = jnp.uint32((1 << bits_here) - 1 if bits_here < 32
                              else 0xFFFFFFFF)
            valid = valid & ((pl & mask) == want)
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
                    chunk_len: int = DEFAULT_CHUNK, progress=None,
                    count_suffix: str | None = None, segment=None):
    """Count kmers in sequence files.  Returns sorted (hi, lo, counts)."""
    if not (1 <= k <= km.K_MAX):
        raise ValueError(f"k must be in [1, {km.K_MAX}], got {k}")
    suffix = None
    if count_suffix:
        if len(count_suffix) > k:
            raise ValueError("count-suffix longer than k")
        suffix = (km.string_to_kmer(count_suffix), len(count_suffix))
    runs = []
    nbases = 0
    for chunk in SequenceChunker(paths, k, chunk_len, hpc=hpc,
                                 segment=segment):
        codes = jnp.asarray(chunk)
        splanes, counts, start, _ = _chunk_pipeline(codes, k, mode, suffix)
        runs.append(_compact_host(splanes, counts, start))
        nbases += len(chunk)
        if progress:
            progress(nbases)
    return merge_runs(runs)


def count_to_db(paths, out_path: str, k: int, mode: str = "canonical",
                hpc: bool = False, chunk_len: int = DEFAULT_CHUNK,
                count_suffix: str | None = None, segment=None,
                progress=None) -> MerylDB:
    hi, lo, counts = count_to_arrays(paths, k, mode=mode, hpc=hpc,
                                     chunk_len=chunk_len,
                                     count_suffix=count_suffix,
                                     segment=segment, progress=progress)
    return MerylDB.write(out_path, k, hi, lo, counts, mode=mode, hpc=hpc)

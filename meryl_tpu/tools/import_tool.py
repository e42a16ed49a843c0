"""meryl-import: build a database from a text kmer/value list.

Mirrors /root/reference/src/meryl-import/meryl-import.C:29-257:
  -kmers FILE  lines 'KMER [value]'; a line '#V' sets the persistent
               default value for subsequent kmers without one
  -output DB   database to create
  -k K         kmer size (shorter inputs crash the reference; here we
               error; longer inputs use the left-most K bases)
  -multiset    keep duplicate kmers as separate entries
  -maxvalue V  accepted (memory hint in the reference; no-op here)
  -forward / -reverse   store the given / reverse-complement kmer
                        instead of the canonical one
"""

from __future__ import annotations

import sys

import numpy as np

from .. import kmer as km
from ..db import MerylDB
from ..io.sequence import open_maybe_compressed

USAGE = """usage: meryl-import -k <kmer-size> -kmers <input-kmers> -output <db.meryl>
  [-multiset] [-maxvalue V] [-forward | -reverse] [-threads T]
"""


def import_kmers(kmers_path: str, k: int, *, multiset: bool = False,
                 orient: str = "canonical"):
    """-> (hi, lo, counts) sorted; duplicates summed unless multiset."""
    ints = []
    vals = []
    default_value = 1
    with open_maybe_compressed(kmers_path) as f:
        for raw in f:
            line = raw.decode() if isinstance(raw, bytes) else raw
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                default_value = int(line[1:])
                continue
            parts = line.split()
            s = parts[0][:k]
            if len(s) < k:
                raise ValueError(f"kmer '{parts[0]}' shorter than k={k}")
            v = int(parts[1]) if len(parts) > 1 else default_value
            x = km.string_to_kmer(s)
            if orient == "canonical":
                x = km.canonical_kmer(x, k)
            elif orient == "reverse":
                x = km.revcomp_kmer(x, k)
            ints.append(x)
            vals.append(v)
    order = sorted(range(len(ints)), key=lambda i: (ints[i], i))
    hi = np.array([ints[i] >> 64 for i in order], np.uint64)
    lo = np.array([ints[i] & ((1 << 64) - 1) for i in order], np.uint64)
    vv = np.array([vals[i] for i in order], np.uint64)
    if multiset or len(vv) == 0:
        return hi, lo, np.minimum(vv, km.VALUE_MAX).astype(np.uint32)
    new = np.ones(len(vv), bool)
    new[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(vv, starts)
    return (hi[starts], lo[starts],
            np.minimum(sums, km.VALUE_MAX).astype(np.uint32))


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    kmers_path = out = None
    k = 0
    multiset = False
    orient = "canonical"
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-kmers":
            i += 1
            kmers_path = argv[i]
        elif a == "-output":
            i += 1
            out = argv[i]
        elif a == "-k":
            i += 1
            k = int(argv[i])
        elif a == "-maxvalue":
            i += 1
        elif a == "-multiset":
            multiset = True
        elif a == "-forward":
            orient = "forward"
        elif a == "-reverse":
            orient = "reverse"
        elif a in ("-threads", "-memory"):
            i += 1
        else:
            sys.stderr.write(f"Unknown option '{a}'.\n{USAGE}")
            return 1
        i += 1
    if not kmers_path or not out or not k:
        sys.stderr.write(USAGE)
        return 1
    hi, lo, counts = import_kmers(kmers_path, k, multiset=multiset,
                                  orient=orient)
    MerylDB.write(out, k, hi, lo, counts, multiset=multiset)
    return 0


if __name__ == "__main__":
    sys.exit(main())

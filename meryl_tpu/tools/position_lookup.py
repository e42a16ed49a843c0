"""position-lookup: map query-sequence kmers to reference positions.

Mirrors /root/reference/src/meryl-lookup/position-lookup.C:25-437:
build a kmer -> [reference positions] table from a reference DB plus
the reference sequence, then for each query sequence report hits:
  -m refdb -s refseq [-hpq FILE] [-mpb FILE] [-qpb FILE] queries...
  -hpq: per query 'nPer<TAB>tCov<TAB>length<TAB>ident' where tCov is
        the number of query kmers found and nPer the total number of
        reference positions those kmers map to
  -mpb: 'pos count' lines — kmer hits painted on reference positions
  -qpb: 'pos count' lines — distinct (kmer, query) pairs painted

Reference positions are global (concatenated over reference sequences).
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from .. import kmer as km
from ..db import MerylDB
from ..io.sequence import iter_sequences
from ..lookup import ExactLookup
from ..ops import extract as ext

CHUNK = 1 << 16


def _canonical_positions(lookup: ExactLookup, codes: np.ndarray):
    """Valid canonical kmers of a sequence -> (positions, table_indices).

    table_index is the rank of the kmer in the lookup's sorted array, or
    -1 when absent (the reference's merylExactLookup::index)."""
    k = lookup.k
    L = len(codes)
    npos = max(0, L - k + 1)
    positions = []
    indices = []
    step = CHUNK - (k - 1)
    pos = 0
    while pos < npos:
        end = min(pos + CHUNK, L)
        chunk = np.full(CHUNK, 255, np.uint8)
        chunk[:end - pos] = codes[pos:end]
        planes, valid = ext.extract_kmers(jnp.asarray(chunk), k, "canonical")
        idx = np.asarray(_index_kernel(
            lookup._planes, lookup._offsets, planes, valid,
            lookup.k, lookup.B, lookup._iters))
        nvalid = min(step, npos - pos)
        loc = np.flatnonzero(idx[:nvalid] >= 0)
        positions.extend((loc + pos).tolist())
        indices.extend(idx[loc].tolist())
        pos += nvalid
    return np.array(positions, np.int64), np.array(indices, np.int64)


import functools
import jax


@functools.partial(jax.jit, static_argnames=("k", "b", "iters"))
def _index_kernel(db_planes, offsets, q_planes, valid, k, b, iters):
    """Rank of each query kmer in the sorted DB arrays; -1 if absent
    (the reference's merylExactLookup::index).  Shares the lower-bound
    search with lookup._query_kernel."""
    from ..lookup import _lower_bound
    idx, found = _lower_bound(db_planes, offsets, q_planes, k, b, iters)
    return jnp.where(found & valid, idx, -1)


class PositionTable:
    """kmer rank -> list of global reference positions."""

    def __init__(self, ref_db: str, ref_seq: str):
        self.lookup = ExactLookup(MerylDB.open(ref_db))
        k = self.lookup.k
        pos_all = []
        idx_all = []
        offset = 0
        for _, seq, _ in iter_sequences(ref_seq):
            codes = km.CODE_LUT[np.frombuffer(seq, np.uint8)]
            p, ix = _canonical_positions(self.lookup, codes)
            pos_all.append(p + offset)
            idx_all.append(ix)
            offset += len(seq)
        pos = np.concatenate(pos_all) if pos_all else np.zeros(0, np.int64)
        idx = np.concatenate(idx_all) if idx_all else np.zeros(0, np.int64)
        order = np.argsort(idx, kind="stable")
        self._pos = pos[order]
        idx = idx[order]
        n = self.lookup._values.shape[0]
        self._start = np.searchsorted(idx, np.arange(n + 1))
        self.ref_len = offset

    def positions_of(self, rank: int) -> np.ndarray:
        return self._pos[self._start[rank]:self._start[rank + 1]]

    def n_occurrences(self, ranks: np.ndarray) -> np.ndarray:
        return self._start[ranks + 1] - self._start[ranks]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    ref_db = ref_seq = hpq = mpb = qpb = None
    inputs = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-m":
            i += 1
            ref_db = argv[i]
        elif a == "-s":
            i += 1
            ref_seq = argv[i]
        elif a == "-hpq":
            i += 1
            hpq = argv[i]
        elif a == "-mpb":
            i += 1
            mpb = argv[i]
        elif a == "-qpb":
            i += 1
            qpb = argv[i]
        else:
            import os
            if os.path.exists(a):
                inputs.append(a)
            else:
                sys.stderr.write(f"unknown option '{a}'\n")
                return 1
        i += 1
    if not ref_db or not ref_seq:
        sys.stderr.write("usage: position-lookup -m refdb -s refseq "
                         "[-hpq F] [-mpb F] [-qpb F] queries...\n")
        return 1

    table = PositionTable(ref_db, ref_seq)
    f_hpq = open(hpq, "w") if hpq else None
    mer_paint = np.zeros(table.ref_len + 1, np.uint32) if mpb else None
    qry_paint = np.zeros(table.ref_len + 1, np.uint32) if qpb else None

    # reads are queried in ~2M-base concatenated batches (0xFF breakers
    # invalidate cross-read windows) — one device dispatch per batch
    # instead of one per read; per-read counts come from bincount over
    # the read each hit position falls in
    for path in inputs:
        it = iter_sequences(path)
        done = False
        while not done:
            batch = []
            nb = 0
            while nb < (1 << 21):
                r = next(it, None)
                if r is None:
                    done = True
                    break
                batch.append(r)
                nb += len(r[1])
            if not batch:
                break
            codes_list = [km.CODE_LUT[np.frombuffer(r[1], np.uint8)]
                          for r in batch]
            n = len(batch)
            buf, offs, _lens = km.concat_codes_with_breakers(codes_list)
            positions, ranks = _canonical_positions(table.lookup, buf)
            read_of = np.searchsorted(offs, positions, "right") - 1
            tcov = np.bincount(read_of, minlength=n)
            occ = table.n_occurrences(ranks) if len(ranks) else \
                np.zeros(0, np.int64)
            nper = np.bincount(read_of, weights=occ,
                               minlength=n).astype(np.int64)
            if f_hpq:
                for i, (name, seq, _) in enumerate(batch):
                    f_hpq.write(f"{int(nper[i])}\t{int(tcov[i])}"
                                f"\t{len(seq)}\t{name}\n")
            if mer_paint is not None:
                for r in ranks:
                    mer_paint[table.positions_of(int(r))] += 1
            if qry_paint is not None:
                pairs = np.unique(np.stack([read_of, ranks], axis=1),
                                  axis=0) if len(ranks) else \
                    np.zeros((0, 2), np.int64)
                for r in pairs[:, 1]:
                    qry_paint[table.positions_of(int(r))] += 1
    if f_hpq:
        f_hpq.close()
    if mer_paint is not None:
        with open(mpb, "w") as f:
            for p in np.flatnonzero(mer_paint):
                f.write(f"{p} {mer_paint[p]}\n")
    if qry_paint is not None:
        with open(qpb, "w") as f:
            for p in np.flatnonzero(qry_paint):
                f.write(f"{p} {qry_paint[p]}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

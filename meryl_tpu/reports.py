"""Text reports: print / histogram / statistics / ploidy.

Output formats match the reference byte-for-byte where the format is
visible in meryl proper:
  print:       "KMER\\tvalue\\n" in ACTG sort order
               (/root/reference/src/meryl/merylOp-nextMer.C:663-678)
  histogram:   "value\\toccurrences\\n"
               (/root/reference/src/meryl/merylOp-histogram.C:39-42)
  statistics:  header + 5-column table
               (/root/reference/src/meryl/merylOp-histogram.C:65-96)
  ploidy:      stderr report + machine line on stdout
               (/root/reference/src/meryl/merylOp-histogram.C:140-156)
"""

from __future__ import annotations

import sys

import numpy as np

from . import kmer as km
from .histogram import MerylHistogram


def print_kmers(hi, lo, counts, k: int, out=None, acgt_order: bool = False):
    """Dump kmers as 'KMER\\tvalue' lines.

    With acgt_order=True each kmer is re-canonicalized so the reported
    strand is minimal in standard ACGT lexicographic order (printACGT;
    output order is then NOT sorted, matching the reference note in
    documentation/source/reference.rst:538-566)."""
    out = out or sys.stdout
    n = len(counts)
    B = 1 << 20
    for b in range(0, n, B):
        hs, ls, cs = hi[b:b + B], lo[b:b + B], counts[b:b + B]
        strs = km.hilo_to_strings(hs, ls, k)
        if acgt_order:
            recs = []
            for s in strs:
                r = km.revcomp_string(s)
                recs.append(s if s <= r else r)
            strs = recs
        out.write("".join(f"{s}\t{c}\n" for s, c in zip(strs, cs.tolist())))


def report_histogram(hist: MerylHistogram, out=None):
    out = out or sys.stdout
    for v, o in zip(hist.values.tolist(), hist.occurrences.tolist()):
        out.write(f"{v}\t{o}\n")


def report_statistics(hist: MerylHistogram, k: int, out=None):
    out = out or sys.stdout
    n_universe = (1 << (2 * k))  # buildLowBitMask(2k)+1
    nd = hist.num_distinct()
    nt = hist.num_total()
    out.write(f"Number of {k}-mers that are:\n")
    out.write(f"  unique   {hist.num_unique():>20}  (exactly one instance of the kmer is in the input)\n")
    out.write(f"  distinct {nd:>20}  (non-redundant kmer sequences in the input)\n")
    out.write(f"  present  {nt:>20}  (...)\n")
    out.write(f"  missing  {n_universe - nd:>20}  (non-redundant kmer sequences not in the input)\n")
    out.write("\n")
    out.write("             number of   cumulative   cumulative     presence\n")
    out.write("              distinct     fraction     fraction   in dataset\n")
    out.write("frequency        kmers     distinct        total       (1e-6)\n")
    out.write("--------- ------------ ------------ ------------ ------------\n")
    s_distinct = 0
    s_total = 0
    for v, o in zip(hist.values.tolist(), hist.occurrences.tolist()):
        s_distinct += o
        s_total += o * v
        out.write("%9d %12d %12.4f %12.4f %12.6f\n" % (
            v, o,
            s_distinct / nd if nd else 0.0,
            s_total / nt if nt else 0.0,
            v / nt * 1e6 if nt else 0.0))


def report_ploidy(hist: MerylHistogram, out=None, err=None):
    out = out or sys.stdout
    err = err or sys.stderr
    hist.compute_ploidy_peaks()
    no = hist.get_noise_trough()
    cs = [hist.get_coverage(n) for n in (1, 2, 3, 4)]
    ps = [hist.get_depth(n) for n in (1, 2, 3, 4)]
    err.write("\n")
    err.write("Noise/genomic trough: %6.3f\n" % no)
    for c, p in zip(cs, ps):
        err.write("%4.2fx coverage peak:   %6.3f\n" % (c, p))
    if not (hasattr(out, "isatty") and out.isatty()):
        out.write("noise-trough\t%.3f\tploidy-peaks\t%.3f\t%.3f\t%.3f\t%.3f\n"
                  % (no, ps[0], ps[1], ps[2], ps[3]))

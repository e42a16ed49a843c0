"""Hand-derived literal fixtures: full expected outputs computed BY
HAND (shown in comments), never by any implementation.

Genuine reference-meryl output is unobtainable in this environment (the
meryl-utility submodule holding the encoder is not checked out, no
meryl binary exists on the system, and there is no network to fetch
one), so these fixtures serve the role VERDICT r1 item 6 asks for at a
scale where a human can verify every line: the canonical mapping
(A=00, C=01, T=10, G=11 integer order; min of forward/revcomp —
/root/reference/src/meryl2/merylSelector.H:87-94), the sorted print
contract, the histogram, statistics, and the union-sum / greater-than /
intersect / subtract value rules (merylOp-nextMer.C:478-641).

Derivation for S1 = ACGTACGGTCA, k=5 (7 windows; value = base-4
integer of the codes, first base most significant):

  window  fwd-codes      fwd  revcomp  rc-val  canonical (min)
  ACGTA   0,1,3,2,0      120  TACGT    542     ACGTA 120
  CGTAC   1,3,2,0,1      481  GTACG    903     CGTAC 481
  GTACG   3,2,0,1,3      903  CGTAC    481     CGTAC 481
  TACGG   2,0,1,3,3      543  CCGTA    376     CCGTA 376
  ACGGT   0,1,3,3,2      126  ACCGT     94     ACCGT  94
  CGGTC   1,3,3,2,1      505  GACCG    791     CGGTC 505
  GGTCA   3,3,2,1,0      996  TGACC    709     TGACC 709

  sorted by value: 94 ACCGT:1, 120 ACGTA:1, 376 CCGTA:1,
                   481 CGTAC:2, 505 CGGTC:1, 709 TGACC:1

S2 = CGTACGTAC, k=5 (5 windows):
  CGTAC 481, GTACG->CGTAC 481, TACGT->ACGTA 120, ACGTA 120, CGTAC 481
  => ACGTA:2, CGTAC:3
"""

import io
import contextlib

from meryl_tpu import cli

K = 5

S1 = "ACGTACGGTCA"
S2 = "CGTACGTAC"

PRINT_S1 = """\
ACCGT\t1
ACGTA\t1
CCGTA\t1
CGTAC\t2
CGGTC\t1
TGACC\t1
"""

HISTOGRAM_S1 = "1\t5\n2\t1\n"

# union-sum: ACCGT 1, ACGTA 1+2, CCGTA 1, CGTAC 2+3, CGGTC 1, TGACC 1
PRINT_UNION_SUM = """\
ACCGT\t1
ACGTA\t3
CCGTA\t1
CGTAC\t5
CGGTC\t1
TGACC\t1
"""

# greater-than 1 over the union-sum result
PRINT_GT1 = "ACGTA\t3\nCGTAC\t5\n"

# intersect: kmers in both inputs, FIRST input's value
PRINT_INTERSECT = "ACGTA\t1\nCGTAC\t2\n"

# subtract: S1 minus sum of others; ACGTA 1-2 and CGTAC 2-3 suppress
PRINT_SUBTRACT = """\
ACCGT\t1
CCGTA\t1
CGGTC\t1
TGACC\t1
"""


def _fa(tmp_path, name, seq):
    p = tmp_path / name
    p.write_text(f">s\n{seq}\n")
    return str(p)


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = cli.main(argv)
    assert rc == 0
    return out.getvalue()


def _dbs(tmp_path):
    fa1 = _fa(tmp_path, "s1.fa", S1)
    fa2 = _fa(tmp_path, "s2.fa", S2)
    d1 = str(tmp_path / "s1.meryl")
    d2 = str(tmp_path / "s2.meryl")
    assert cli.main([f"k={K}", "count", fa1, "output", d1]) == 0
    assert cli.main([f"k={K}", "count", fa2, "output", d2]) == 0
    return d1, d2


def test_hand_print_count(tmp_path):
    d1, _ = _dbs(tmp_path)
    assert _run(["print", d1]) == PRINT_S1


def test_hand_histogram(tmp_path):
    d1, _ = _dbs(tmp_path)
    assert _run(["histogram", d1]) == HISTOGRAM_S1


def test_hand_statistics(tmp_path):
    d1, _ = _dbs(tmp_path)
    text = _run(["statistics", d1])
    # hand counts: 5 kmers with value 1 (unique), 6 distinct, 7 total
    import re
    vals = {}
    for line in text.splitlines():
        m = re.match(r"\s*(unique|distinct|present|missing)\s+(\d+)", line)
        if m:
            vals[m.group(1)] = int(m.group(2))
    assert vals["unique"] == 5
    assert vals["distinct"] == 6
    assert vals["present"] == 7


def test_hand_union_sum(tmp_path):
    d1, d2 = _dbs(tmp_path)
    assert _run(["print", "union-sum", d1, d2]) == PRINT_UNION_SUM


def test_hand_greater_than(tmp_path):
    d1, d2 = _dbs(tmp_path)
    out = _run(["print", "greater-than", "1",
                "[", "union-sum", d1, d2, "]"])
    assert out == PRINT_GT1


def test_hand_intersect(tmp_path):
    d1, d2 = _dbs(tmp_path)
    assert _run(["print", "intersect", d1, d2]) == PRINT_INTERSECT


def test_hand_subtract(tmp_path):
    d1, d2 = _dbs(tmp_path)
    assert _run(["print", "subtract", d1, d2]) == PRINT_SUBTRACT

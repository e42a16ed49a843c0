"""End-to-end Merqury-style genome-QC workflow (docs/workflows.md,
BASELINE.md workload 'histogram + gt/lt filters (Merqury-style)'):
solid read kmers -> assembly error kmers -> completeness -> BED
painting, all through the real CLIs, checked against brute force."""

import contextlib
import io
import random

import pytest

from meryl_tpu import cli, lookup_cli

K = 15


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("merqury")
    rng = random.Random(5)
    genome = "".join(rng.choices("ACGT", k=4000))
    # reads: 3x perfect coverage; tiles overlap by k-1 so every genome
    # window appears in each series (incl. tile boundaries and tail)
    reads = []
    for off in (0, 67, 134):
        p = off
        while p + 200 <= len(genome):
            reads.append(genome[p:p + 200])
            p += 200 - (K - 1)
        reads.append(genome[-200:])
    # assembly: the genome with ONE substituted base mid-way
    pos = 2000
    wrong = {"A": "C", "C": "G", "G": "T", "T": "A"}[genome[pos]]
    assembly = genome[:pos] + wrong + genome[pos + 1:]

    reads_fa = root / "reads.fa"
    reads_fa.write_text("".join(f">r{i}\n{s}\n"
                                for i, s in enumerate(reads)))
    asm_fa = root / "asm.fa"
    asm_fa.write_text(f">asm\n{assembly}\n")
    rdb = str(root / "reads.meryl")
    adb = str(root / "asm.meryl")
    assert cli.main([f"k={K}", "count", str(reads_fa),
                     "output", rdb]) == 0
    assert cli.main([f"k={K}", "count", str(asm_fa),
                     "output", adb]) == 0
    return root, genome, assembly, pos, reads, rdb, adb, asm_fa


def _canon(s):
    rc = s[::-1].translate(str.maketrans("ACGT", "TGCA"))
    order = {"A": 0, "C": 1, "T": 2, "G": 3}
    return s if [order[c] for c in s] <= [order[c] for c in rc] else rc


def _kmers(s):
    return {_canon(s[i:i + K]) for i in range(len(s) - K + 1)}


def _print_kmers(db):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["print", db]) == 0
    return {line.split("\t")[0] for line in buf.getvalue().splitlines()}


def test_solid_and_error_kmers(setup, tmp_path):
    root, genome, assembly, pos, reads, rdb, adb, asm_fa = setup
    # solid read kmers (coverage >= 2 across the 3x tiling)
    solid = str(tmp_path / "solid.meryl")
    assert cli.main(["at-least", "2", rdb, "output", solid]) == 0
    got_solid = _print_kmers(solid)
    from collections import Counter
    cnt = Counter()
    for r in reads:
        for i in range(len(r) - K + 1):
            cnt[_canon(r[i:i + K])] += 1
    want_solid = {k for k, v in cnt.items() if v >= 2}
    assert got_solid == want_solid

    # assembly kmers unsupported by ANY read = base errors
    errs = str(tmp_path / "errs.meryl")
    assert cli.main(["difference", adb, rdb, "output", errs]) == 0
    got_err = _print_kmers(errs)
    # brute force: assembly kmers absent from all read kmers
    rk = set()
    for r in reads:
        rk |= _kmers(r)
    want_err = _kmers(assembly) - rk
    assert got_err == want_err
    # the error kmers are exactly the windows covering the flipped base
    assert 1 <= len(got_err) <= K


def test_completeness_and_bed_painting(setup, tmp_path):
    root, genome, assembly, pos, reads, rdb, adb, asm_fa = setup
    solid = str(tmp_path / "solid.meryl")
    assert cli.main(["at-least", "2", rdb, "output", solid]) == 0
    inter = str(tmp_path / "found.meryl")
    assert cli.main(["intersect", solid, adb, "output", inter]) == 0
    n_found = len(_print_kmers(inter))
    n_solid = len(_print_kmers(solid))
    completeness = n_found / n_solid
    assert 0.97 < completeness < 1.0      # one error base loses <= K kmers

    # BED painting of read support over the assembly: the error
    # region must be a gap in the covered runs
    bed = str(tmp_path / "cov.bed")
    assert lookup_cli.main(["-bed-runs", "-sequence", str(asm_fa),
                            "-mers", rdb, "-output", bed]) == 0
    runs = [tuple(map(int, line.split("\t")[1:3])) for line in open(bed)]
    # the single error base splits read support into exactly two runs
    # broken at the K missing window starts; the reference's end
    # convention (first-unset-start + k, dump.C:346-355) makes the
    # runs meet at pos+1 in base space
    assert len(runs) == 2, runs
    assert runs[0] == (0, pos + 1)
    assert runs[1][0] == pos + 1 and runs[1][1] >= len(genome)
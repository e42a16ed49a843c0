"""value=selected / label=selected cross-assign semantics.

The reference documents these as "the value of the kmer selected by the
label selector" and vice versa (merylAssign.H:33,51); its shipped code
is unfinished (merylOpCompute.C:149-152 "#warning wrong").  We test the
documented intent against hand-computed expectations: the chosen input
is the first present input whose label (resp. value) satisfies the
label- (resp. value-) restricted selector, falling back to first.
"""

import io
import contextlib

import numpy as np

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli

K = 9


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = v2cli.main(argv)
    assert rc == 0, out.getvalue()
    return out.getvalue()


def _parse_show(out):
    got = {}
    for line in out.strip().split("\n"):
        if not line:
            continue
        parts = line.split("\t")
        got[km.string_to_kmer(parts[0])] = (int(parts[1]), int(parts[2]))
    return got


def _mkdbs(tmp_path):
    """Two DBs over the same kmer set: A value=2 label=1, B value=10
    label=2."""
    rng = np.random.default_rng(5)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=800))
    hi, lo, _ = oracle.count_kmers([seq], K)
    n = len(hi)
    pa = str(tmp_path / "a.meryl")
    pb = str(tmp_path / "b.meryl")
    MerylDB.write(pa, K, hi, lo, np.full(n, 2, np.uint32),
                  labels=np.full(n, 1, np.uint64))
    MerylDB.write(pb, K, hi, lo, np.full(n, 10, np.uint32),
                  labels=np.full(n, 2, np.uint64))
    keys = [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]
    return pa, pb, keys


def test_value_selected_by_label_selector(tmp_path):
    pa, pb, keys = _mkdbs(tmp_path)
    out = _run(["union", "assign:value=selected", "assign:label=#2",
                "select:label:==#2", "output:show", pa, pb])
    got = _parse_show(out)
    assert set(got) == set(keys)
    # label selector picks input B (label 2), so value is B's 10, not
    # first's 2
    for kk in keys:
        assert got[kk] == (10, 2)


def test_value_selected_fallback_first(tmp_path):
    pa, pb, keys = _mkdbs(tmp_path)
    # no input label equals 7 -> chosen none -> reference's first-input
    # fallback; output label is set to 7 so the output selector passes
    out = _run(["union", "assign:value=selected", "assign:label=#7",
                "select:label:==#7", "output:show", pa, pb])
    got = _parse_show(out)
    assert set(got) == set(keys)
    for kk in keys:
        assert got[kk] == (2, 7)


def test_label_selected_by_value_selector(tmp_path):
    pa, pb, keys = _mkdbs(tmp_path)
    # value selector >=5 picks input B (value 10); label is B's 2
    out = _run(["union", "assign:value=#9", "assign:label=selected",
                "select:value:>=#5", "output:show", pa, pb])
    got = _parse_show(out)
    assert set(got) == set(keys)
    for kk in keys:
        assert got[kk] == (9, 2)


def test_selected_no_matching_terms_is_first(tmp_path):
    pa, pb, keys = _mkdbs(tmp_path)
    # selector has no label terms: value=selected degrades to first
    out = _run(["union", "assign:value=selected", "assign:label=or",
                "select:value:>=#1", "output:show", pa, pb])
    got = _parse_show(out)
    assert set(got) == set(keys)
    for kk in keys:
        assert got[kk] == (2, 3)

"""meryl2 (value, label) model: engine + parser + CLI differential tests."""

import io
import contextlib

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli
from meryl_tpu.v2.parser import parse_assign, parse_constant, split_class_name

K = 9


def _seq(rng, n):
    return "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("v2dbs")
    rng = np.random.default_rng(11)
    paths, dicts = [], []
    for i, n in enumerate([3000, 2000]):
        hi, lo, c = oracle.count_kmers([_seq(rng, n)], K)
        lab = np.full(len(c), 1 << i, np.uint64)
        p = str(root / f"db{i}.meryl")
        MerylDB.write(p, K, hi, lo, c, labels=lab)
        paths.append(p)
        dicts.append({(int(h) << 64) | int(l): (int(v), 1 << i)
                      for h, l, v in zip(hi, lo, c)})
    return paths, dicts


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


def test_parse_constant():
    assert parse_constant("123") == 123
    assert parse_constant("123d") == 123
    assert parse_constant("abch") == 0xABC
    assert parse_constant("147o") == 0o147
    assert parse_constant("0101b") == 0b0101
    assert parse_constant("2k") == 2000
    assert parse_constant("1mi") == 1 << 20


def test_split_class_name():
    assert split_class_name("o:d=x.meryl") == ("output", "database", "x.meryl")
    assert split_class_name("out:sh") == ("output", "show", "")
    assert split_class_name("a:v=min#4") == ("assign", "value", "min#4")
    assert split_class_name("set:l=or") == ("assign", "label", "or")
    assert split_class_name("s:v:>5") == ("select", "value", ">5")
    assert split_class_name("get:i:all") == ("select", "input", "all")
    assert split_class_name("o:st=f") == ("output", "statistics", "f")
    assert split_class_name("random:word=x") is None


def test_union_label_or(dbs):
    paths, dicts = dbs
    out = _run(["union", "output:show", paths[0], paths[1]])
    got = _parse_show(out)
    keys = set(dicts[0]) | set(dicts[1])
    for kk in keys:
        nin = (kk in dicts[0]) + (kk in dicts[1])
        lab = (1 if kk in dicts[0] else 0) | (2 if kk in dicts[1] else 0)
        assert got[kk] == (nin, lab)
    assert len(got) == len(keys)


def test_intersect_label_and(dbs):
    paths, dicts = dbs
    out = _run(["intersect-sum", "o:show", paths[0], paths[1]])
    got = _parse_show(out)
    keys = set(dicts[0]) & set(dicts[1])
    for kk in keys:
        v = dicts[0][kk][0] + dicts[1][kk][0]
        assert got[kk] == (v, 0)  # 0b01 & 0b10 == 0
    assert len(got) == len(keys)


def test_select_value_and_label(dbs):
    paths, dicts = dbs
    out = _run(["union-sum", "o:show", "select:value:>1", paths[0], paths[1]])
    got = _parse_show(out)
    want = {}
    for kk in set(dicts[0]) | set(dicts[1]):
        v = dicts[0].get(kk, (0, 0))[0] + dicts[1].get(kk, (0, 0))[0]
        if v > 1:
            want[kk] = v
    assert {k: v[0] for k, v in got.items()} == want


def test_select_label_term(dbs):
    paths, dicts = dbs
    # keep only kmers whose OR'd label == 3 (present in both)
    out = _run(["union-sum", "o:show", "select:label:==#3",
                paths[0], paths[1]])
    got = _parse_show(out)
    keys = set(dicts[0]) & set(dicts[1])
    assert set(got) == keys


def test_select_input_count(dbs):
    paths, dicts = dbs
    out = _run(["union", "o:show", "select:input:1", paths[0], paths[1]])
    got = _parse_show(out)
    keys = set(dicts[0]) ^ set(dicts[1])
    assert set(got) == keys


def test_select_bases(dbs):
    paths, dicts = dbs
    out = _run(["union-max", "o:show", "select:bases:gc:ge6",
                paths[0], paths[1]])
    got = _parse_show(out)
    for kk in got:
        s = km.kmer_to_string(kk, K)
        assert s.count("G") + s.count("C") >= 6
    want_n = sum(1 for kk in set(dicts[0]) | set(dicts[1])
                 if km.kmer_to_string(kk, K).count("G") +
                 km.kmer_to_string(kk, K).count("C") >= 6)
    assert len(got) == want_n


def test_not_selector(dbs):
    paths, dicts = dbs
    out = _run(["union", "o:show", "not", "select:input:2",
                paths[0], paths[1]])
    got = _parse_show(out)
    assert set(got) == set(dicts[0]) ^ set(dicts[1])


def test_nested_action_and_assign(dbs):
    paths, dicts = dbs
    out = _run(["intersect", "o:show", "assign:value=add#10",
                paths[0], paths[1]])
    got = _parse_show(out)
    keys = set(dicts[0]) & set(dicts[1])
    for kk in keys:
        assert got[kk][0] == dicts[0][kk][0] + dicts[1][kk][0] + 10


def test_count_with_label(tmp_path):
    rng = np.random.default_rng(4)
    s = _seq(rng, 800)
    fa = tmp_path / "r.fa"
    fa.write_text(f">s\n{s}\n")
    dbp = str(tmp_path / "c.meryl")
    _run(["-k", str(K), "count", "label=#5", str(fa),
          f"output:database={dbp}"])
    db = MerylDB.open(dbp)
    hi, lo, c, lab = db.load_bucket_labels(0)
    assert lab is not None and (lab == 5).all()
    ohi, olo, oc = oracle.count_kmers([s], K)
    ghi, glo, gc = db.load_all()
    assert (ghi == ohi).all() and (glo == olo).all() and (gc == oc).all()


def test_v1_threshold_alias(dbs):
    paths, dicts = dbs
    out = _run(["greater-than", "1", "o:show", paths[0]])
    got = _parse_show(out)
    want = {kk for kk, (v, _) in dicts[0].items() if v > 1}
    assert set(got) == want


def test_pipe(dbs, tmp_path):
    paths, dicts = dbs
    out = _run(["[", "union-sum", "output:pipe=x", paths[0], paths[1], "]",
                "[", "greater-than", "1", "o:show", "input:pipe=x", "]"])
    got = _parse_show(out)
    want = {}
    for kk in set(dicts[0]) | set(dicts[1]):
        v = dicts[0].get(kk, (0, 0))[0] + dicts[1].get(kk, (0, 0))[0]
        if v > 1:
            want[kk] = v
    assert {k: v[0] for k, v in got.items()} == want


def test_count_compress_hpc(tmp_path):
    """v2 'compress' homopolymer-compresses counting inputs."""
    import io
    import contextlib
    seqs = ["AAACCCGGGTTTAAACCCGGG", "ACGTACGTACGTACGTACG"]
    fa = tmp_path / "r.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = v2cli.main(["-k", "5", "compress", "count", str(fa),
                         "output:show"])
    assert rc == 0
    got = {}
    for l in buf.getvalue().strip().split("\n"):
        p = l.split("\t")
        got[p[0]] = int(p[1])
    ohi, olo, oc = oracle.count_kmers(seqs, 5, hpc=True)
    want = {km.kmer_to_string((int(h) << 64) | int(l), 5): int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want


def test_select_distinct_fraction(dbs):
    """value:>=distinct=F resolves via the DB histogram."""
    paths, dicts = dbs
    out = _run(["union-sum", "o:show", "select:value:>=distinct=0.999",
                paths[0]])
    got = _parse_show(out)
    # threshold resolves to the max value in the db; only kmers at the
    # top value survive
    maxv = max(v for v, _ in dicts[0].values())
    want = {kk for kk, (v, _) in dicts[0].items() if v >= maxv}
    assert set(got) == want


def test_quickstart_compat_forms(tmp_path):
    """The reference's quick-start.rst uses 'output=X', bare 'print',
    'print=X' and 'output <path>' — all must parse (quick-start.rst:38,
    61,193; the 'output <path>' compat rule is regex 0x26 in
    merylCommandBuilder-processText.C:156)."""
    import io
    import contextlib

    from meryl_tpu.v2 import cli as v2cli

    fa = tmp_path / "r.fa"
    fa.write_text(">r\n" + "ACGTACGTTTGGCCAACGTG" * 40 + "\n")
    db = str(tmp_path / "a.meryl")
    assert v2cli.main(["-k", "11", "count", str(fa),
                       f"output={db}"]) == 0
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert v2cli.main(["print", db]) == 0
    lines = out.getvalue().splitlines()
    assert lines and all(len(l.split("\t")) == 3 for l in lines)
    dump = str(tmp_path / "d.txt")
    db2 = str(tmp_path / "b.meryl")
    assert v2cli.main([f"print={dump}", "at-least", "2", db,
                       f"output={db2}"]) == 0
    assert sum(1 for _ in open(dump)) > 0     # repeated 20-mer block
    db3 = str(tmp_path / "c.meryl")
    assert v2cli.main(["-k", "11", "count", str(fa), "output",
                       db3]) == 0
    import os
    assert os.path.isdir(db3)


def test_quickstart_histogram_and_k_inference(tmp_path):
    """Bare 'histogram'/'statistics' aliases and counting without -k
    when a sibling DB input pins the kmer size (quick-start.rst:86,146)."""
    import io
    import contextlib
    import os

    from meryl_tpu.v2 import cli as v2cli

    fa = tmp_path / "a.fa"
    fa.write_text(">a\n" + "ACGTACGTTTGGCCAACGTG" * 30 + "\n")
    fb = tmp_path / "b.fa"
    fb.write_text(">b\n" + "TTTTGGGGCCCCAAAATGCA" * 30 + "\n")
    db = str(tmp_path / "a.meryl")
    assert v2cli.main(["-k", "13", "count", str(fa),
                       f"output={db}"]) == 0
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert v2cli.main(["histogram", db]) == 0
    assert all(len(l.split("\t")) == 2
               for l in out.getvalue().splitlines())
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert v2cli.main(["statistics", db]) == 0
    assert "distinct" in out.getvalue()
    # nested count with NO -k: inferred from the sibling DB input
    u = str(tmp_path / "u.meryl")
    b2 = str(tmp_path / "b.meryl")
    assert v2cli.main(["union-sum", f"output={u}",
                       "[count", str(fb), f"output={b2}]", db]) == 0
    assert os.path.isdir(u) and os.path.isdir(b2)
    from meryl_tpu.db import MerylDB
    assert MerylDB.open(b2).k == 13


def test_counting_root_extra_outputs(tmp_path):
    """histogram/statistics/print= on a COUNTING action must produce
    output (previously they parsed but were silently dropped), and a
    dangling bare 'output' with no path must error instead of counting
    into a deleted temp dir."""
    import io
    import contextlib

    from meryl_tpu.v2 import cli as v2cli

    fa = tmp_path / "r.fa"
    fa.write_text(">r\n" + "ACGTACGTTTGGCCAACGTG" * 30 + "\n")
    db = str(tmp_path / "x.meryl")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert v2cli.main(["-k", "11", "count", str(fa),
                           f"output={db}", "histogram"]) == 0
    assert len(buf.getvalue().splitlines()) >= 1
    dump = str(tmp_path / "d.txt")
    db2 = str(tmp_path / "y.meryl")
    assert v2cli.main(["-k", "11", "count", str(fa), f"output={db2}",
                       f"print={dump}"]) == 0
    assert sum(1 for _ in open(dump)) > 0
    assert v2cli.main(["-k", "11", "count", str(fa), "output"]) == 1


def test_bad_memory_flag_is_parse_error(capsys):
    """-m with a non-numeric word must exit 1 with a usage message,
    not raise an uncaught ValueError (advisor round-3 low finding)."""
    from meryl_tpu.v2 import cli as v2cli
    rc = v2cli.main(["-m", "lots", "histogram"])
    assert rc == 1
    assert "memory size" in capsys.readouterr().err
    rc = v2cli.main(["-t", "many", "histogram"])
    assert rc == 1

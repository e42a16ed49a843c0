"""CLI edge coverage: -C dry run, multiple roots, errors, fuzz."""

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle
from meryl_tpu.db import MerylDB

K = 9


def _fasta(tmp_path, name, seqs):
    p = tmp_path / name
    p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    return str(p)


def _seqs(seed, n=2, ln=500):
    rng = np.random.default_rng(seed)
    return ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=ln))
            for _ in range(n)]


def test_configure_only(tmp_path, capsys):
    fa = _fasta(tmp_path, "a.fa", _seqs(1))
    rc = cli.main(["-C", f"k={K}", "count", fa, "output",
                   str(tmp_path / "x.meryl")])
    assert rc == 0
    err = capsys.readouterr().err
    assert "count" in err and "expected_kmers" in err
    assert not (tmp_path / "x.meryl").exists()  # dry run writes nothing


def test_multiple_roots(tmp_path):
    fa = _fasta(tmp_path, "a.fa", _seqs(2))
    fb = _fasta(tmp_path, "b.fa", _seqs(3))
    da = str(tmp_path / "a.meryl")
    dbp = str(tmp_path / "b.meryl")
    rc = cli.main([f"k={K}", "[count", fa, "output", f"{da}]",
                   "[count", fb, "output", f"{dbp}]"])
    assert rc == 0
    assert MerylDB.open(da).stats()["numTotal"] > 0
    assert MerylDB.open(dbp).stats()["numTotal"] > 0


def test_unknown_word_errors(capsys):
    rc = cli.main(["definitely-not-a-thing"])
    assert rc == 1
    assert "Can't interpret" in capsys.readouterr().err


def test_k_mismatch_errors(tmp_path, capsys):
    fa = _fasta(tmp_path, "a.fa", _seqs(1))
    rc = cli.main(["k=9", "k=11", "count", fa, "output",
                   str(tmp_path / "x.meryl")])
    assert rc == 1


def test_count_without_k_errors(tmp_path, capsys):
    fa = _fasta(tmp_path, "a.fa", _seqs(1))
    rc = cli.main(["count", fa, "output", str(tmp_path / "x.meryl")])
    assert rc == 1
    assert "kmer size" in capsys.readouterr().err


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_no_crash(seed, tmp_path, capsys):
    """Random word salads must produce exit code 0/1, never tracebacks."""
    rng = np.random.default_rng(seed)
    vocab = ["count", "union", "[", "]", "output", "print", "k=9", "5",
             "threshold=2", "intersect-min", "]]]", "[union-sum",
             "not-a-file.fa", "distinct=0.5", "-V", "compress"]
    words = [vocab[i] for i in rng.integers(0, len(vocab), size=8)]
    try:
        rc = cli.main(words)
    except SystemExit as e:
        rc = e.code
    assert rc in (0, 1)


def test_subprocess_real_shell(tmp_path):
    """Drive bin/meryl through a real shell with quoted brackets
    (hermetic CPU run: drop any platform-pinning sitecustomize)."""
    import os
    import subprocess
    import sys
    fa = _fasta(tmp_path, "sp.fa", _seqs(9))
    db = tmp_path / "sp.meryl"
    env = dict(os.environ)
    env["MERYL_TPU_CHUNK"] = str(1 << 12)
    env["PYTHONPATH"] = ""          # no sitecustomize platform pins
    env["JAX_PLATFORMS"] = "cpu"
    meryl = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bin", "meryl")
    cmd = (f"{sys.executable} {meryl} k={K} count {fa} output {db} && "
           f"{sys.executable} {meryl} print '[greater-than' 0 '{db}]'")
    r = subprocess.run(["bash", "-c", cmd], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in r.stdout.strip().split("\n") if "\t" in l]
    assert len(lines) > 0


def test_print_to_gz_output(tmp_path):
    """print targets ending .gz/.bz2/.xz are written compressed (the
    reference's compressedFileWriter contract)."""
    import gzip as _gzip

    from meryl_tpu import cli
    from meryl_tpu.io.sequence import open_output

    fa = tmp_path / "r.fa"
    fa.write_text(">s\n" + "ACGTACGTAGGTTACCA" * 8 + "\n")
    db = str(tmp_path / "x.meryl")
    assert cli.main(["k=11", "count", str(fa), "output", db]) == 0
    out_gz = str(tmp_path / "dump.txt.gz")
    out_txt = str(tmp_path / "dump.txt")
    assert cli.main(["print", out_gz, db]) == 0
    assert cli.main(["print", out_txt, db]) == 0
    with open(out_gz, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    assert _gzip.open(out_gz, "rt").read() == open(out_txt).read()
    # bz2/xz too, via the helper directly
    for ext, mod in (("bz2", "bz2"), ("xz", "lzma")):
        p = str(tmp_path / f"o.{ext}")
        with open_output(p) as f:
            f.write("hello\n")
        import importlib
        assert importlib.import_module(mod).open(p, "rt").read() == \
            "hello\n"

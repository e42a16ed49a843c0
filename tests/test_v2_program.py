"""meryl2 -f program-text loading: quotes, escapes, comments."""

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli
from meryl_tpu.v2.parser import load_program_text


def test_load_program_text(tmp_path):
    f = tmp_path / "prog.meryl"
    f.write_text(
        "# full-line comment\n"
        "union-sum o:show  # trailing comment\n"
        "'one word' \"it's here\"\n"
        "two\\ words plain\n")
    words = load_program_text(str(f))
    assert words == ["union-sum", "o:show", "one word", "it's here",
                     "two words", "plain"]


def test_program_file_execution(tmp_path, capsys):
    rng = np.random.default_rng(30)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=1200))
    hi, lo, c = oracle.count_kmers([seq], 9)
    db = str(tmp_path / "a.meryl")
    MerylDB.write(db, 9, hi, lo, c)
    prog = tmp_path / "prog.txt"
    prog.write_text(f"# compute union-sum and show\nunion-sum o:show {db}\n")
    assert v2cli.main(["-f", str(prog)]) == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == len(c)

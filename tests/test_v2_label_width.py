"""meryl2 -l label width: stored labels are masked and packed to the
configured width (VERDICT r1 missing #6; reference kmer::setLabelSize)."""

import io
import contextlib
import os

import numpy as np

from meryl_tpu import kmer as km
from meryl_tpu.db import MerylDB, NUM_FILES, bucket_name
from meryl_tpu.v2 import cli as v2cli

K = 9


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = v2cli.main(argv)
    assert rc == 0, out.getvalue()
    return out.getvalue()


def _fa(tmp_path):
    rng = np.random.default_rng(2)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=1500))
    p = tmp_path / "r.fa"
    p.write_text(f">s\n{seq}\n")
    return str(p)


def _db_bytes(path):
    return sum(os.path.getsize(os.path.join(path, bucket_name(ff)))
               for ff in range(NUM_FILES))


def test_label_width_masks_and_packs(tmp_path):
    fa = _fa(tmp_path)
    d8 = str(tmp_path / "w8.meryl")
    d64 = str(tmp_path / "w64.meryl")
    # label constant 0x1FF = 511; at -l 8 it must store as 511 & 255 = 255
    _run(["-k", str(K), "-l", "8", "count", fa, "label=#1ffh",
          f"output:db={d8}"])
    _run(["-k", str(K), "count", fa, "label=#1ffh",
          f"output:db={d64}"])

    dbo = MerylDB.open(d8)
    assert dbo.meta["labelBits"] == 8
    _, _, _, lab8 = dbo.load_bucket_labels(0)
    assert lab8 is not None and (lab8 == 255).all()
    _, _, _, lab64 = MerylDB.open(d64).load_bucket_labels(0)
    assert (lab64 == 0x1FF).all()

    # width selection affects DB size: 8-bit labels pack into 1/8 the
    # label bytes of the 64-bit default
    assert _db_bytes(d8) < _db_bytes(d64)


def test_label_width_through_merge(tmp_path):
    fa = _fa(tmp_path)
    d = str(tmp_path / "a.meryl")
    _run(["-k", str(K), "count", fa, "label=#f0fh", f"output:db={d}"])
    out_db = str(tmp_path / "m.meryl")
    # union with shift-left 4 at -l 12: (0xf0f << 4) & 0xfff = 0x0f0
    _run(["-k", str(K), "-l", "12", "union",
          "assign:label=shift-left#4", f"output:db={out_db}", d])
    dbo = MerylDB.open(out_db)
    assert dbo.meta["labelBits"] == 12
    _, _, _, lab = dbo.load_bucket_labels(0)
    assert lab is not None and (lab == 0x0F0).all()


def test_label_width_rejects_bad(tmp_path):
    fa = _fa(tmp_path)
    out = io.StringIO()
    with contextlib.redirect_stderr(out):
        rc = v2cli.main(["-k", str(K), "-l", "99", "count", fa,
                         "output:show"])
    assert rc != 0


def test_label_width_zero_roundtrip(tmp_path):
    """-l 0 stores no labels at all (regression: width-0 labels were
    written as uint8 but read back as width 64, misaligning buckets)."""
    import numpy as np
    from meryl_tpu.db import MerylDB

    lo = np.array([5, 9], np.uint64)
    hi = np.zeros(2, np.uint64)
    c = np.array([1, 2], np.uint32)
    lab = np.array([3, 7], np.uint64)
    db = MerylDB.write(str(tmp_path / "z.meryl"), 9, hi, lo, c,
                       labels=lab, label_bits=0)
    hi2, lo2, c2 = MerylDB.open(db.path).load_all()
    assert (lo2 == lo).all() and (c2 == c).all()
    for ff in range(64):
        _, _, _, labels = MerylDB.open(db.path).load_bucket_labels(ff)
        assert labels is None

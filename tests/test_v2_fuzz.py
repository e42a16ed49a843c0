"""Randomized meryl2 COMPOSITION fuzz: random (assign:value x
assign:label x select:input x select:value/label with and/or/not)
programs over three small labeled DBs, differentially checked against
a naive per-kmer dict model.  The per-feature differential tests pin
each rule alone; this pins their interaction (assign computed first,
selectors applied to the OUTPUT value/label, input-presence terms,
sum-of-products with negation)."""

import contextlib
import io
import random

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli

K = 9
NDB = 3
M64 = (1 << 64) - 1
VMAX = (1 << 32) - 1


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(77)
    paths, dicts = [], []
    for i, n in enumerate([1500, 1100, 900]):
        hi, lo, _ = oracle.count_kmers(
            ["".join(km.ALPHABET[x] for x in rng.integers(0, 4, size=n))],
            K)
        c = rng.integers(1, 50, size=len(lo)).astype(np.uint32)
        lab = rng.integers(0, 1 << 20, size=len(lo)).astype(np.uint64)
        p = str(root / f"F{i}.meryl")
        MerylDB.write(p, K, hi, lo, c, labels=lab)
        paths.append(p)
        dicts.append({int(l): (int(v), int(b))
                      for l, v, b in zip(lo, c, lab)})
    return paths, dicts


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = v2cli.main(argv)
    assert rc == 0, out.getvalue()
    got = {}
    for line in out.getvalue().strip().splitlines():
        if line:
            s, v, l = line.split("\t")
            got[km.string_to_kmer(s)] = (int(v), int(l))
    return got


VALUE_RULES = ["first", "min", "max", "add", "sub", "count"]
LABEL_RULES = ["first", "or", "and", "xor"]
INPUT_SELS = ["any", "all", "first", "@2", "2"]
RELS = [(">", lambda a, b: a > b), ("<", lambda a, b: a < b),
        (">=", lambda a, b: a >= b), ("<=", lambda a, b: a <= b),
        ("==", lambda a, b: a == b), ("!=", lambda a, b: a != b)]


def _naive_value(rule, const, vals):
    if rule == "first":
        return vals[0]
    if rule == "min":
        return min(vals + ([const] if const is not None else []))
    if rule == "max":
        return max(vals + ([const] if const is not None else []))
    if rule == "add":
        return min(VMAX, sum(vals) + (const or 0))
    if rule == "sub":
        return max(0, vals[0] - sum(vals[1:]) - (const or 0))
    if rule == "count":
        return len(vals)        # constant unused (engine follows
        # the reference's _actLen, merylOpCompute.C)
    raise AssertionError(rule)


def _naive_label(rule, const, labs):
    if rule == "first":
        return labs[0]
    if rule == "or":
        r = const or 0
        for x in labs:
            r |= x
        return r
    if rule == "and":
        r = M64 if const is None else const
        for x in labs:
            r &= x
        return r
    if rule == "xor":
        r = const or 0
        for x in labs:
            r ^= x
        return r
    raise AssertionError(rule)


def _input_pass(sel, pres):
    if sel == "any":
        return any(pres)
    if sel == "all":
        return all(pres)
    if sel == "first":
        return pres[0]
    if sel == "@2":
        return pres[1]
    if sel == "2":
        return sum(pres) == 2
    raise AssertionError(sel)


def test_v2_composition_fuzz(dbs):
    paths, dicts = dbs
    rng = random.Random(101)
    for trial in range(20):
        vr = rng.choice(VALUE_RULES)
        vc = rng.choice([None, rng.randrange(0, 60)])
        if vr in ("first", "count"):
            vc = None                    # no constant for these
        lr = rng.choice(LABEL_RULES)
        lc = rng.choice([None, rng.randrange(0, 1 << 16)])
        if lr == "first":
            lc = None
        isel = rng.choice(INPUT_SELS)
        args = []
        vspec = vr if vc is None else f"{vr}#{vc}"
        lspec = lr if lc is None else f"{lr}#{lc:x}h"
        args += [f"assign:value={vspec}", f"assign:label={lspec}",
                 f"select:input:{isel}"]
        # optional value/label term on the OUTPUT, and/or-composed
        terms = []
        if rng.random() < 0.8:
            rel, fn = rng.choice(RELS)
            c = rng.randrange(0, 80)
            neg = rng.random() < 0.3
            conn = rng.choice(["and", "or"])
            w = []
            w.append(conn)
            if neg:
                w.append("not")
            w.append(f"select:value:{rel}{c}")
            args += w
            terms.append(("value", fn, c, neg, conn))
        if rng.random() < 0.5:
            rel, fn = rng.choice(RELS)
            c = rng.randrange(0, 1 << 18)
            neg = rng.random() < 0.3
            conn = rng.choice(["and", "or"])
            w = [conn]
            if neg:
                w.append("not")
            w.append(f"select:label:{rel}{c}")
            args += w
            terms.append(("label", fn, c, neg, conn))
        args += ["o:show"] + paths
        got = _run(args)

        want = {}
        allk = set()
        for d in dicts:
            allk |= d.keys()
        for kk in allk:
            pres = [kk in d for d in dicts]
            vals = [d[kk][0] for d in dicts if kk in d]
            labs = [d[kk][1] for d in dicts if kk in d]
            ov = _naive_value(vr, vc, vals)
            ol = _naive_label(lr, lc, labs)
            # sum of products: 'and' extends the current product,
            # 'or' starts a new one (reference.rst:388-391)
            products = [[_input_pass(isel, pres)]]
            for qty, fn, c, neg, conn in terms:
                t = fn(ov if qty == "value" else ol, c)
                if neg:
                    t = not t
                if conn == "and":
                    products[-1].append(t)
                else:
                    products.append([t])
            ok = any(all(p) for p in products)
            if ok and ov > 0:            # zero-value kmers suppressed
                want[kk] = (ov, ol)
        assert got == want, (trial, vspec, lspec, isel, terms,
                             len(got), len(want))


def test_allones_kmer_shares_padding_run(tmp_path):
    """k=16: the all-ones kmer (poly-G forward) is a REAL key equal to
    the sentinel padding pattern; stable sort puts the real entries at
    the run front so the bounded-window reductions must still see them
    all (regression for the round-4 windowed compute stage)."""
    from meryl_tpu.v2 import cli as v2

    fa = tmp_path / "g.fa"
    fa.write_text(">r\n" + "G" * 48 + "\nACGTACGTACGTACGTACGT\n")
    fb = tmp_path / "h.fa"
    fb.write_text(">r\n" + "G" * 40 + "\n")
    oa = tmp_path / "a.meryl"
    ob = tmp_path / "b.meryl"
    v2.main(["count-forward", "k=16", str(fa), "output:database=" + str(oa)])
    v2.main(["count-forward", "k=16", str(fb), "output:database=" + str(ob)])
    out = tmp_path / "u.meryl"
    v2.main(["union-sum", str(oa), str(ob), "output:database=" + str(out)])
    from meryl_tpu.db import MerylDB
    hi, lo, c = MerylDB.open(str(out)).load_all()
    d = {int(x): int(v) for x, v in zip(lo, c)}
    allones = (1 << 32) - 1
    # 33 poly-G windows in a + 25 in b
    assert d[allones] == 33 + 25


def test_rowpacked_action_matches_flat(tmp_path, monkeypatch):
    """Force the round-4 row-batched action layout on a small input
    and compare against the flat layout byte-for-byte (values AND
    labels) across a label-carrying union."""
    import numpy as np

    from meryl_tpu.db import MerylDB
    from meryl_tpu.v2 import cli as v2

    rng = np.random.default_rng(9)
    paths = []
    for i in range(3):
        n = 4000 + 700 * i
        lo = np.unique(rng.integers(0, 1 << 42, size=n,
                                    dtype=np.uint64))
        hi = np.zeros(len(lo), np.uint64)
        c = rng.integers(1, 50, size=len(lo)).astype(np.uint32)
        lab = rng.integers(0, 1 << 63, size=len(lo), dtype=np.uint64)
        p = str(tmp_path / f"i{i}.meryl")
        MerylDB.write(p, 21, hi, lo, c, labels=lab)
        paths.append(p)

    def run(out):
        assert v2.main(["union-sum", *paths,
                        "output:database=" + out]) == 0
        db = MerylDB.open(out)
        labs = np.concatenate(
            [db.load_bucket_labels(ff)[3] for ff in range(64)
             if db.load_bucket_labels(ff)[3] is not None])
        return db.load_all(), labs

    monkeypatch.setattr(v2.Evaluator, "ROWPACK_MIN", 1 << 60)
    flat = run(str(tmp_path / "flat.meryl"))
    monkeypatch.setattr(v2.Evaluator, "ROWPACK_MIN", 1)
    packed = run(str(tmp_path / "packed.meryl"))
    for a, b in zip(flat[0], packed[0]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(flat[1], packed[1])

"""Differential tests for every meryl2 label-assign rule."""

import io
import contextlib

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli

K = 9


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("lab")
    rng = np.random.default_rng(13)
    paths, dicts = [], []
    for i, n in enumerate([2200, 1600]):
        hi, lo, c = oracle.count_kmers(
            ["".join(km.ALPHABET[x] for x in rng.integers(0, 4, size=n))], K)
        lab = rng.integers(0, 1 << 16, size=len(c)).astype(np.uint64)
        lab |= np.uint64(1) << np.uint64(40)  # exercise the high half
        p = str(root / f"L{i}.meryl")
        MerylDB.write(p, K, hi, lo, c, labels=lab)
        paths.append(p)
        dicts.append({(int(h) << 64) | int(l): (int(v), int(b))
                      for h, l, v, b in zip(hi, lo, c, lab)})
    return paths, dicts


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = v2cli.main(argv)
    assert rc == 0, out.getvalue()
    got = {}
    for line in out.getvalue().strip().split("\n"):
        if line:
            s, v, l = line.split("\t")
            got[km.string_to_kmer(s)] = (int(v), int(l))
    return got


M64 = (1 << 64) - 1


def _naive_label(rule, const, labs):
    """labs: per-present-input labels in input order."""
    if rule == "first":
        return labs[0]
    if rule == "and":
        r = M64 if const is None else const
        for x in labs:
            r &= x
        if const is not None:
            r &= const
        return r
    if rule == "or":
        r = 0
        for x in labs:
            r |= x
        return r | (const or 0)
    if rule == "xor":
        r = 0
        for x in labs:
            r ^= x
        return r ^ (const or 0)
    if rule == "min":
        return None  # value-linked; handled separately
    if rule == "lightest":
        return min(labs, key=lambda x: (bin(x).count("1"),
                                        labs.index(x)))
    if rule == "heaviest":
        return max(labs, key=lambda x: (bin(x).count("1"),
                                        -labs.index(x)))
    if rule == "invert":
        return (~labs[0]) & M64
    if rule == "shift-left":
        return (labs[0] << const) & M64
    if rule == "shift-right":
        return labs[0] >> const
    if rule == "rotate-left":
        c = const % 64
        return ((labs[0] << c) | (labs[0] >> (64 - c))) & M64 \
            if c else labs[0]
    if rule == "rotate-right":
        c = const % 64
        return ((labs[0] >> c) | (labs[0] << (64 - c))) & M64 \
            if c else labs[0]
    if rule == "difference":
        r = labs[0]
        for x in labs[1:]:
            r &= ~x
        return r & M64
    raise ValueError(rule)


@pytest.mark.parametrize("rule,const", [
    ("and", None), ("or", 0xF0), ("xor", 0xFF), ("difference", None),
    ("lightest", None), ("heaviest", None),
])
def test_multi_input_label_rules(dbs, rule, const):
    paths, dicts = dbs
    spec = rule if const is None else f"{rule}#{const:x}h"
    got = _run(["union-sum", f"assign:label={spec}", "o:show",
                paths[0], paths[1]])
    for kk, (v, l) in got.items():
        labs = [d[kk][1] for d in dicts if kk in d]
        want = _naive_label(rule, const, labs)
        assert l == want, (km.kmer_to_string(kk, K), rule, l, want)


@pytest.mark.parametrize("rule,const", [
    ("invert", None), ("shift-left", 5), ("shift-right", 9),
    ("rotate-left", 13), ("rotate-right", 37),
])
def test_single_input_label_rules(dbs, rule, const):
    paths, dicts = dbs
    spec = rule if const is None else f"{rule}#{const}"
    got = _run(["union-sum", f"assign:label={spec}", "o:show", paths[0]])
    for kk, (v, l) in got.items():
        want = _naive_label(rule, const, [dicts[0][kk][1]])
        assert l == want, (km.kmer_to_string(kk, K), rule, l, want)


def test_label_of_min_value(dbs):
    """label=min: the label of the kmer with the minimum value."""
    paths, dicts = dbs
    got = _run(["union-min", "o:show", paths[0], paths[1]])
    for kk, (v, l) in got.items():
        entries = [d[kk] for d in dicts if kk in d]
        minv = min(e[0] for e in entries)
        assert v == minv
        want_labels = [e[1] for e in entries if e[0] == minv]
        assert l == want_labels[0]


@pytest.mark.parametrize("rule", ["mul", "div", "divzero", "mod"])
def test_multi_input_value_arith(dbs, rule):
    """value=mul/div/divzero/mod over two inputs (first op rest)."""
    paths, dicts = dbs
    got = _run(["union", f"assign:value={rule}", "o:show",
                paths[0], paths[1]])
    expect_keys = set()
    for kk in set(dicts[0]) | set(dicts[1]):
        entries = [d[kk][0] for d in dicts if kk in d]
        # naive models of the reference's SEQUENTIAL semantics
        # (merylOpCompute.C:196-273), incl. the default constants
        # mul=1, div=1, divzero=1, mod=0 (isAssign.C:86-90)
        if rule == "mul":
            v = 1
            for x in entries:
                v = min(v * x, 0xFFFFFFFF)
        elif rule == "div":
            v = entries[0]
            for x in entries[1:]:
                v = v // x if x else 0
        elif rule == "divzero":
            v = entries[0]
            for x in entries[1:] + [1]:
                if x == 0:
                    v = 0
                elif v < x:
                    v = 1
                else:
                    q, r = divmod(v, x)
                    v = q + (1 if 2 * r >= x else 0)
        elif rule == "mod":
            q, r = entries[0], 0
            for x in entries[1:]:
                if x:
                    r += q % x
                    q //= x
                else:
                    r += q
                    q = 0
            v = (r + q) & 0xFFFFFFFF  # constant 0 dumps leftover q
        if v:
            expect_keys.add(kk)
            assert got[kk][0] == v, (km.kmer_to_string(kk, K), rule,
                                     got[kk][0], v)
    assert set(got) == expect_keys


def test_value_arith_three_inputs_sequential(tmp_path):
    """div/mod over THREE inputs follow the reference's SEQUENTIAL
    chain (merylOpCompute.C:206-273), not division by the sum of the
    rest (review regression)."""
    vals_by_input = [(100, 2, 5), (60, 7, 3)]
    kmers = ["AAAAAAAAC", "AAAAAAAAG"]
    paths = []
    for i in range(3):
        hi = np.zeros(2, np.uint64)
        lo, c = [], []
        for kk, vv in zip(kmers, vals_by_input):
            lo.append(km.string_to_kmer(kk))
            c.append(vv[i])
        order = np.argsort(lo)
        p = str(tmp_path / f"s{i}.meryl")
        MerylDB.write(p, K, hi, np.array(lo, np.uint64)[order],
                      np.array(c, np.uint32)[order])
        paths.append(p)

    got = _run(["union", "assign:value=div", "o:show"] + paths)
    for kk, (a, b, c3) in zip(kmers, vals_by_input):
        want = a // b // c3  # sequential, NOT a // (b + c3)
        assert got[km.string_to_kmer(kk)][0] == want

    got = _run(["union", "assign:value=mod", "o:show"] + paths)
    for kk, (a, b, c3) in zip(kmers, vals_by_input):
        q, r = a, 0
        for x in (b, c3):
            r += q % x
            q //= x
        want = r + q  # constant default 0 dumps leftover quotient
        assert got[km.string_to_kmer(kk)][0] == want


def test_value_add_mul_saturate(tmp_path):
    """v2 add/mul clamp at kmvalumax instead of wrapping
    (merylOpCompute.C:171-203); a wrapped 0 would delete the kmer."""
    kk = "AAAAAAAAC"
    lo = np.array([km.string_to_kmer(kk)], np.uint64)
    hi = np.zeros(1, np.uint64)
    pa = str(tmp_path / "a.meryl")
    pb = str(tmp_path / "b.meryl")
    MerylDB.write(pa, K, hi, lo, np.array([0xFFFFFFFE], np.uint32))
    MerylDB.write(pb, K, hi, lo, np.array([16], np.uint32))

    got = _run(["union", "assign:value=add", "o:show", pa, pb])
    assert got[km.string_to_kmer(kk)][0] == 0xFFFFFFFF

    got = _run(["union", "assign:value=mul", "o:show", pa, pb])
    assert got[km.string_to_kmer(kk)][0] == 0xFFFFFFFF

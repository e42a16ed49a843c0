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
        first = entries[0]
        rest = sum(entries[1:])
        if rule == "mul":
            v = first
            for x in entries[1:]:
                v = (v * x) & 0xFFFFFFFF
        elif rule == "div":
            v = first // max(rest, 1)
        elif rule == "divzero":
            v = max(first // max(rest, 1), 1)
        elif rule == "mod":
            v = first % max(rest, 1)
        if v:
            expect_keys.add(kk)
            assert got[kk][0] == v, (km.kmer_to_string(kk, K), rule,
                                     got[kk][0], v)
    assert set(got) == expect_keys

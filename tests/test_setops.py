"""Differential tests: set/arithmetic operations vs a naive python model.

Mirrors the reference's test-operations.pl approach (recompute ops with
an independent naive merge over text dumps and compare line-by-line,
/root/reference/src/tests/test-operations.pl:66-200)."""

import io

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.optree import DBInput, OpNode, execute_root
from meryl_tpu import cli

K = 9


def _random_seq(rng, n):
    return "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dbs")
    rng = np.random.default_rng(42)
    paths, dicts = [], []
    for i, n in enumerate([4000, 3000, 2000]):
        seqs = [_random_seq(rng, n), _random_seq(rng, n // 2)]
        hi, lo, c = oracle.count_kmers(seqs, K)
        p = str(root / f"db{i}.meryl")
        MerylDB.write(p, K, hi, lo, c)
        paths.append(p)
        dicts.append({(int(h) << 64) | int(l): int(v)
                      for h, l, v in zip(hi, lo, c)})
    return paths, dicts


def _run_op(op, paths, threshold=None, n_inputs=2):
    node = OpNode(op=op, inputs=[DBInput(p) for p in paths[:n_inputs]],
                  threshold=threshold)
    out = io.StringIO()
    from meryl_tpu.optree import BucketEvaluator
    ev = BucketEvaluator(K)
    got = {}
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            got[(int(h) << 64) | int(l)] = int(v)
    return got


def _naive(op, dicts, threshold=None):
    a, b = dicts[0], dicts[1] if len(dicts) > 1 else {}
    keys = set()
    for d in dicts:
        keys |= set(d)
    out = {}
    for kk in keys:
        vals = [d[kk] for d in dicts if kk in d]
        nin = len(vals)
        first = vals[0]
        if op == "union":
            v = nin
        elif op == "union-min":
            v = min(vals)
        elif op == "union-max":
            v = max(vals)
        elif op == "union-sum":
            v = sum(vals)
        elif op == "intersect":
            v = first if nin == len(dicts) else 0
        elif op == "intersect-min":
            v = min(vals) if nin == len(dicts) else 0
        elif op == "intersect-max":
            v = max(vals) if nin == len(dicts) else 0
        elif op == "intersect-sum":
            v = sum(vals) if nin == len(dicts) else 0
        elif op == "subtract":
            if kk in dicts[0]:
                rest = sum(d.get(kk, 0) for d in dicts[1:])
                v = dicts[0][kk] - rest if dicts[0][kk] > rest else 0
            else:
                v = 0
        elif op == "difference":
            v = dicts[0][kk] if (kk in dicts[0] and nin == 1) else 0
        elif op == "symmetric-difference":
            v = first if nin == 1 else 0
        elif op == "less-than":
            v = first if first < threshold else 0
        elif op == "greater-than":
            v = first if first > threshold else 0
        elif op == "at-least":
            v = first if first >= threshold else 0
        elif op == "at-most":
            v = first if first <= threshold else 0
        elif op == "equal-to":
            v = first if first == threshold else 0
        elif op == "not-equal-to":
            v = first if first != threshold else 0
        elif op == "increase":
            v = (first + threshold) & 0xFFFFFFFF
        elif op == "decrease":
            v = first - threshold if first >= threshold else 0
        elif op == "multiply":
            v = (first * threshold) & 0xFFFFFFFF
        elif op == "divide":
            v = first // threshold if threshold else 0
        elif op == "divide-round":
            if threshold == 0:
                v = 0
            elif first < threshold:
                v = 1
            else:
                import math
                v = int(math.floor(first / threshold + 0.5))
        elif op == "modulo":
            v = first % threshold if threshold else 0
        else:
            raise ValueError(op)
        if v:
            out[kk] = v
    return out


MERGE = ["union", "union-min", "union-max", "union-sum",
         "intersect", "intersect-min", "intersect-max", "intersect-sum",
         "subtract", "difference", "symmetric-difference"]


@pytest.mark.parametrize("op", MERGE)
def test_merge_ops_two_inputs(dbs, op):
    paths, dicts = dbs
    assert _run_op(op, paths) == _naive(op, dicts[:2])


@pytest.mark.parametrize("op", ["union-sum", "intersect-min", "subtract",
                                "difference", "symmetric-difference"])
def test_merge_ops_three_inputs(dbs, op):
    paths, dicts = dbs
    assert _run_op(op, paths, n_inputs=3) == _naive(op, dicts)


@pytest.mark.parametrize("op,thr", [
    ("less-than", 2), ("greater-than", 1), ("at-least", 2), ("at-most", 1),
    ("equal-to", 2), ("not-equal-to", 1),
    ("increase", 3), ("decrease", 1), ("multiply", 5),
    ("divide", 2), ("divide-round", 2), ("modulo", 3),
])
def test_filter_math_ops(dbs, op, thr):
    paths, dicts = dbs
    assert _run_op(op, paths, threshold=thr, n_inputs=1) == \
        _naive(op, dicts[:1], threshold=thr)


def test_nested_tree(dbs):
    """[union-sum a b] intersected with c, via nested OpNodes."""
    paths, dicts = dbs
    inner = OpNode(op="union-sum", inputs=[DBInput(paths[0]), DBInput(paths[1])])
    node = OpNode(op="intersect-min", inputs=[inner, DBInput(paths[2])])
    from meryl_tpu.optree import BucketEvaluator
    ev = BucketEvaluator(K)
    got = {}
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            got[(int(h) << 64) | int(l)] = int(v)
    us = _naive("union-sum", dicts[:2])
    want = _naive("intersect-min", [us, dicts[2]])
    assert got == want


def test_union_sum_six_inputs(tmp_path):
    """Set ops with many inputs (wider than any existing test)."""
    rng = np.random.default_rng(55)
    paths, dicts = [], []
    for i in range(6):
        seqs = ["".join(km.ALPHABET[c]
                        for c in rng.integers(0, 4, size=600))]
        hi, lo, c = oracle.count_kmers(seqs, K)
        p = str(tmp_path / f"s{i}.meryl")
        MerylDB.write(p, K, hi, lo, c)
        paths.append(p)
        dicts.append({(int(h) << 64) | int(l): int(v)
                      for h, l, v in zip(hi, lo, c)})
    got = _run_op("union-sum", paths, n_inputs=6)
    assert got == _naive("union-sum", dicts)
    got = _run_op("intersect", paths, n_inputs=6)
    assert got == _naive("intersect", dicts)

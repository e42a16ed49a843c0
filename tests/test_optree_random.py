"""Randomized nested op-tree differential testing.

Builds random action trees (depth <= 3) over small databases and
compares the bucket evaluator against a naive recursive dict model —
the nested-evaluation analog of the reference's test-operations.pl.
"""

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.optree import BucketEvaluator, DBInput, OpNode

K = 9

MERGE_OPS = ["union", "union-min", "union-max", "union-sum",
             "intersect", "intersect-min", "intersect-max",
             "intersect-sum", "subtract", "difference",
             "symmetric-difference"]
UNARY_OPS = [("less-than", 3), ("greater-than", 1), ("at-least", 2),
             ("at-most", 2), ("equal-to", 2), ("not-equal-to", 1),
             ("increase", 2), ("decrease", 1), ("multiply", 3),
             ("divide", 2), ("modulo", 2)]


def naive_eval(node, dbs):
    """Recursive dict-model evaluation of an OpNode tree."""
    ins = []
    for inp in node.inputs:
        if isinstance(inp, DBInput):
            ins.append(dbs[inp.path])
        else:
            ins.append(naive_eval(inp, dbs))
    op = node.op
    t = node.threshold or 0
    if op == "passthrough":
        return dict(ins[0])
    keys = set()
    for d in ins:
        keys |= set(d)
    out = {}
    for kk in keys:
        vals = [d[kk] for d in ins if kk in d]
        nin = len(vals)
        first = vals[0]
        in0 = kk in ins[0]
        v = 0
        if op == "union":
            v = nin
        elif op == "union-min":
            v = min(vals)
        elif op == "union-max":
            v = max(vals)
        elif op == "union-sum":
            v = sum(vals) & 0xFFFFFFFF
        elif op == "intersect":
            v = first if nin == len(ins) else 0
        elif op == "intersect-min":
            v = min(vals) if nin == len(ins) else 0
        elif op == "intersect-max":
            v = max(vals) if nin == len(ins) else 0
        elif op == "intersect-sum":
            v = (sum(vals) & 0xFFFFFFFF) if nin == len(ins) else 0
        elif op == "subtract":
            if in0:
                rest = sum(d.get(kk, 0) for d in ins[1:])
                v = ins[0][kk] - rest if ins[0][kk] > rest else 0
        elif op == "difference":
            v = ins[0][kk] if (in0 and nin == 1) else 0
        elif op == "symmetric-difference":
            v = first if nin == 1 else 0
        elif op == "less-than":
            v = first if first < t else 0
        elif op == "greater-than":
            v = first if first > t else 0
        elif op == "at-least":
            v = first if first >= t else 0
        elif op == "at-most":
            v = first if first <= t else 0
        elif op == "equal-to":
            v = first if first == t else 0
        elif op == "not-equal-to":
            v = first if first != t else 0
        elif op == "increase":
            v = (first + t) & 0xFFFFFFFF
        elif op == "decrease":
            v = first - t if first >= t else 0
        elif op == "multiply":
            v = (first * t) & 0xFFFFFFFF
        elif op == "divide":
            v = first // t if t else 0
        elif op == "modulo":
            v = first % t if t else 0
        else:
            raise ValueError(op)
        if v:
            out[kk] = v
    return out


def random_tree(rng, paths, depth):
    """Random OpNode tree; leaves are DBs."""
    def leaf():
        return DBInput(str(rng.choice(paths)))

    def build(d):
        if d == 0 or rng.random() < 0.3:
            # unary over a leaf or subtree
            op, t = UNARY_OPS[rng.integers(0, len(UNARY_OPS))]
            inner = leaf() if d == 0 else build(d - 1)
            return OpNode(op=op, inputs=[inner], threshold=t)
        op = MERGE_OPS[rng.integers(0, len(MERGE_OPS))]
        n = int(rng.integers(2, 4))
        kids = []
        for _ in range(n):
            if d > 0 and rng.random() < 0.4:
                kids.append(build(d - 1))
            else:
                kids.append(leaf())
        return OpNode(op=op, inputs=kids)

    return build(depth)


@pytest.fixture(scope="module")
def dbset(tmp_path_factory):
    root = tmp_path_factory.mktemp("rnd")
    rng = np.random.default_rng(101)
    paths = []
    dbs = {}
    for i in range(3):
        seqs = ["".join(km.ALPHABET[c]
                        for c in rng.integers(0, 4, size=1200))]
        hi, lo, c = oracle.count_kmers(seqs, K)
        p = str(root / f"r{i}.meryl")
        MerylDB.write(p, K, hi, lo, c)
        paths.append(p)
        dbs[p] = {(int(h) << 64) | int(l): int(v)
                  for h, l, v in zip(hi, lo, c)}
    return paths, dbs


@pytest.mark.parametrize("seed", range(12))
def test_random_trees(dbset, seed):
    paths, dbs = dbset
    rng = np.random.default_rng(seed)
    node = random_tree(rng, paths, depth=2)
    want = naive_eval(node, dbs)
    ev = BucketEvaluator(K)
    got = {}
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            got[(int(h) << 64) | int(l)] = int(v)
    assert got == want

"""k > 32 (3-plane) coverage for set operations and exact lookup —
multiword compare/sort paths differ from the 1-2 plane cases."""

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.lookup import ExactLookup
from meryl_tpu.optree import BucketEvaluator, DBInput, OpNode

K = 33


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("mw")
    rng = np.random.default_rng(42)
    paths, dicts = [], []
    for i, n in enumerate([2000, 1500]):
        seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))]
        hi, lo, c = oracle.count_kmers(seqs, K)
        p = str(root / f"m{i}.meryl")
        MerylDB.write(p, K, hi, lo, c)
        paths.append(p)
        dicts.append({(int(h) << 64) | int(l): int(v)
                      for h, l, v in zip(hi, lo, c)})
    return paths, dicts


@pytest.mark.parametrize("op", ["union-sum", "intersect-min", "subtract",
                                "difference"])
def test_k33_setops(dbs, op):
    paths, dicts = dbs
    node = OpNode(op=op, inputs=[DBInput(p) for p in paths])
    ev = BucketEvaluator(K)
    got = {}
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            got[(int(h) << 64) | int(l)] = int(v)
    a, b = dicts
    want = {}
    for kk in set(a) | set(b):
        va, vb = a.get(kk), b.get(kk)
        if op == "union-sum":
            want[kk] = (va or 0) + (vb or 0)
        elif op == "intersect-min":
            if va and vb:
                want[kk] = min(va, vb)
        elif op == "subtract":
            if va and (va > (vb or 0)):
                want[kk] = va - (vb or 0)
        elif op == "difference":
            if va and not vb:
                want[kk] = va
    assert got == want


def test_k33_lookup(dbs):
    paths, dicts = dbs
    L = ExactLookup(MerylDB.open(paths[0]))
    d = dicts[0]
    keys = sorted(d)
    hi = np.array([x >> 64 for x in keys], np.uint64)
    lo = np.array([x & ((1 << 64) - 1) for x in keys], np.uint64)
    vals = L.values_np(hi, lo)
    assert (vals == np.array([d[x] for x in keys], np.uint32)).all()
    # bulk join path too
    planes = km.planes_from_hilo(hi, lo, L.P)
    bulk = L.values_join([np.asarray(p) for p in planes],
                         np.ones(len(keys), bool))
    assert (bulk == vals).all()


def test_k64_full_width(tmp_path):
    """k=64 (full 128-bit payload, P=4): count + lookup + union-sum."""
    k = 64
    rng = np.random.default_rng(9)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=800))]
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    p = str(tmp_path / "k64.meryl")
    MerylDB.write(p, k, ohi, olo, oc)
    L = ExactLookup(MerylDB.open(p))
    vals = L.values_np(ohi, olo)
    assert (vals == oc).all()
    node = OpNode(op="union-sum", inputs=[DBInput(p), DBInput(p)])
    ev = BucketEvaluator(k)
    got = {}
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            got[(int(h) << 64) | int(l)] = int(v)
    want = {(int(h) << 64) | int(l): 2 * int(c)
            for h, l, c in zip(ohi, olo, oc)}
    assert got == want

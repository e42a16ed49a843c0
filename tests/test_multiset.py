"""Multiset DB semantics: per-instance set operations.

Reference: meryl-import -multiset keeps duplicate kmers as separate
entries, and the merge emits one entry per instance
(/root/reference/src/meryl/merylOp-nextMer.C:296-385): union-family ops
repeatedly pick the single smallest (kmer, value) instance (:313-317).
The reference's non-union multiset code is unfinished ("THIS IS WRONG"
:287); for intersect/subtract/difference we implement the semantics its
comments describe (instances matched across inputs by per-kmer value
rank; non-multiset inputs are wildcards) and test against the naive
per-instance model below.
"""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu.db import MerylDB
from meryl_tpu.optree import (BucketEvaluator, DBInput, OpNode,
                              node_output_multiset)
from meryl_tpu.tools import import_tool

K = 9

UNION_OPS = ("union", "union-min", "union-max", "union-sum")
MATCH_OPS = ("intersect", "intersect-min", "intersect-max",
             "intersect-sum", "subtract", "difference",
             "symmetric-difference")


def naive_multiset(op, inputs, ms_flags):
    """Naive per-instance model.  inputs: list of dict[kmer -> list of
    values] (instance lists; non-multiset inputs have single-value
    lists).  Returns list of (kmer, value) in output order."""
    m = len(inputs)
    out = []
    if op in UNION_OPS:
        inst = [(kk, v) for d in inputs for kk, vs in d.items() for v in vs]
        inst.sort()
        for kk, v in inst:
            out.append((kk, 1 if op == "union" else v))
        return out
    kmers = sorted(set().union(*[set(d) for d in inputs]))
    for kk in kmers:
        pres = [i for i in range(m) if kk in inputs[i]]
        ranks = 1
        for i in pres:
            if ms_flags[i]:
                ranks = max(ranks, len(inputs[i][kk]))
        for j in range(ranks):
            active = []  # (input idx, value), input order
            for i in range(m):
                if kk not in inputs[i]:
                    continue
                vs = sorted(inputs[i][kk])
                if ms_flags[i]:
                    if j < len(vs):
                        active.append((i, vs[j]))
                else:  # wildcard: present at every rank of its kmer
                    active.append((i, vs[0]))
            if not active:
                continue
            act = len(active)
            vals = [v for _, v in active]
            first_idx, v_first = active[0]
            v = 0
            if op == "intersect" and act == m:
                v = v_first
            elif op == "intersect-min" and act == m:
                v = min(vals)
            elif op == "intersect-max" and act == m:
                v = max(vals)
            elif op == "intersect-sum" and act == m:
                v = sum(vals)
            elif op == "subtract":
                rest = sum(vals) - v_first
                if first_idx == 0 and v_first > rest:
                    v = v_first - rest
            elif op == "difference":
                if first_idx == 0 and pres == [0]:
                    v = v_first
            elif op == "symmetric-difference":
                if len(pres) == 1:
                    v = v_first
            if v > 0:
                out.append((kk, v))
    return out


def _import_db(tmp_path, name, entries, multiset):
    """entries: list of (kmer string, value)."""
    kf = tmp_path / f"{name}.txt"
    kf.write_text("".join(f"{s} {v}\n" for s, v in entries))
    p = str(tmp_path / f"{name}.meryl")
    args = ["-k", str(K), "-kmers", str(kf), "-output", p, "-forward"]
    if multiset:
        args.append("-multiset")
    import_tool.main(args)
    return p


def _eval_all(node):
    ev = BucketEvaluator(K)
    out = []
    for ff in range(64):
        hi, lo, c = ev.eval_bucket(node, ff)
        for h, l, v in zip(hi, lo, c):
            out.append(((int(h) << 64) | int(l), int(v)))
    return out


def _rand_entries(rng, kmers, n_inst, vmax=20):
    entries = []
    for s in kmers:
        for _ in range(rng.integers(1, n_inst + 1)):
            entries.append((s, int(rng.integers(1, vmax))))
    return entries


@pytest.fixture()
def ms_db(tmp_path):
    return _import_db(tmp_path, "ms",
                      [("AAAAAAAAC", 4), ("AAAAAAAAC", 7),
                       ("AAAAAAAAG", 2)], True)


def test_multiset_print_keeps_instances(ms_db):
    db = MerylDB.open(ms_db)
    assert db.multiset
    hi, lo, c = db.load_all()
    strs = km.hilo_to_strings(hi, lo, K)
    assert list(strs).count("AAAAAAAAC") == 2
    assert sorted(c[strs == "AAAAAAAAC"].tolist()) == [4, 7]


def test_multiset_union_sum_per_instance(ms_db, tmp_path):
    """union-sum emits one entry per instance, sorted by (kmer, value)."""
    p2 = _import_db(tmp_path, "b", [("AAAAAAAAC", 1)], False)
    node = OpNode(op="union-sum", inputs=[DBInput(ms_db), DBInput(p2)])
    assert node_output_multiset(node)
    got = _eval_all(node)
    c = km.string_to_kmer("AAAAAAAAC")
    g = km.string_to_kmer("AAAAAAAAG")
    want = sorted([(c, 1), (c, 4), (c, 7), (g, 2)])
    assert got == want


def test_multiset_union_value_is_one(ms_db):
    node = OpNode(op="union", inputs=[DBInput(ms_db)])
    got = _eval_all(node)
    assert [v for _, v in got] == [1, 1, 1]


def test_multiset_intersect_wildcard(ms_db, tmp_path):
    """A non-multiset input matches every instance rank of its kmer
    with its single value (merylOp-nextMer.C:291-293 intent)."""
    p2 = _import_db(tmp_path, "c", [("AAAAAAAAC", 9)], False)
    node = OpNode(op="intersect", inputs=[DBInput(ms_db), DBInput(p2)])
    got = _eval_all(node)
    c = km.string_to_kmer("AAAAAAAAC")
    # both ms instances match the wildcard; value = first input's
    assert got == [(c, 4), (c, 7)]


def test_multiset_differential_random(tmp_path):
    rng = np.random.default_rng(23)
    pool = ["".join(km.ALPHABET[b] for b in rng.integers(0, 4, size=K))
            for _ in range(24)]
    pool = sorted(set(pool))
    sets = []
    for i in range(3):
        pick = [s for s in pool if rng.random() < 0.6]
        sets.append(pick)
    ms_flags = (True, True, False)
    paths, models = [], []
    for i, pick in enumerate(sets):
        if ms_flags[i]:
            entries = _rand_entries(rng, pick, 3)
        else:
            entries = [(s, int(rng.integers(1, 20))) for s in pick]
        paths.append(_import_db(tmp_path, f"in{i}", entries, ms_flags[i]))
        d = {}
        for s, v in entries:
            d.setdefault(km.string_to_kmer(s), []).append(v)
        models.append(d)

    for op in UNION_OPS + MATCH_OPS:
        node = OpNode(op=op, inputs=[DBInput(p) for p in paths])
        got = _eval_all(node)
        want = naive_multiset(op, models, ms_flags)
        # compare per-kmer value multisets (engine emits match-family
        # entries in rank order, the model in the same order)
        def group(lst):
            d = {}
            for kk, v in lst:
                d.setdefault(kk, []).append(v)
            return {kk: sorted(vs) for kk, vs in d.items()}
        assert group(got) == group(want), op


def test_multiset_output_db_flag(ms_db, tmp_path):
    from meryl_tpu.optree import execute_root
    node = OpNode(op="union-sum", inputs=[DBInput(ms_db)],
                  output_path=str(tmp_path / "out.meryl"))
    db = execute_root(node, K)
    assert db.multiset
    hi, lo, c = db.load_all()
    assert len(c) == 3  # instances preserved through the op + DB


def test_compare_multiset_per_instance(tmp_path):
    """compare of multiset DBs matches instances by value rank instead
    of collapsing each kmer to one dict entry (review regression: DBs
    differing only in instance counts compared equal)."""
    import io

    from meryl_tpu.optree import execute_compare

    kf_a = tmp_path / "a.txt"
    kf_a.write_text("AAAAAAAAC 5\nAAAAAAAAC 7\n")
    kf_b = tmp_path / "b.txt"
    kf_b.write_text("AAAAAAAAC 7\n")
    pa, pb = str(tmp_path / "a.meryl"), str(tmp_path / "b.meryl")
    for kf, p in [(kf_a, pa), (kf_b, pb)]:
        assert import_tool.main(["-k", str(K), "-kmers", str(kf),
                                 "-output", p, "-forward",
                                 "-multiset"]) == 0
    node = OpNode(op="compare", inputs=[DBInput(pa), DBInput(pb)])
    out = io.StringIO()
    same = execute_compare(node, K, out=out)
    assert not same
    assert "only in input 0" in out.getvalue()
    # identical multisets still compare equal
    node2 = OpNode(op="compare", inputs=[DBInput(pa), DBInput(pa)])
    out2 = io.StringIO()
    assert execute_compare(node2, K, out=out2)
    assert out2.getvalue() == ""

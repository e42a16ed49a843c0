"""Unit tests for the sort-centric count kernels and segmented scans."""

import numpy as np
import jax.numpy as jnp
import pytest

from meryl_tpu.ops import count as cnt
from meryl_tpu.ops import segscan


def _np(planes):
    return [np.asarray(p) for p in planes]


def test_sort_count_sparse():
    keys = jnp.asarray(np.array([5, 3, 5, 3, 3, 7, 9, 9], np.uint32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0], bool))
    sp, c, start, n = cnt.sort_count([keys], valid)
    n = int(n)
    assert n == 4
    start = np.asarray(start)
    idx = np.flatnonzero(start)
    assert np.asarray(sp[0])[idx].tolist() == [3, 5, 7, 9]
    assert np.asarray(c)[idx].tolist() == [3, 2, 1, 1]


def test_sort_count_basic():
    keys = jnp.asarray(np.array([5, 3, 5, 3, 3, 7, 9, 9], np.uint32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0], bool))
    up, c, n = cnt.sort_count_compacted([keys], valid)
    n = int(n)
    assert n == 4
    assert np.asarray(up[0])[:n].tolist() == [3, 5, 7, 9]
    assert np.asarray(c)[:n].tolist() == [3, 2, 1, 1]
    assert (np.asarray(c)[n:] == 0).all()
    assert (np.asarray(up[0])[n:] == 0xFFFFFFFF).all()


def test_sort_count_all_invalid():
    keys = jnp.asarray(np.zeros(16, np.uint32))
    valid = jnp.zeros(16, bool)
    up, c, n = cnt.sort_count_compacted([keys], valid)
    assert int(n) == 0
    assert (np.asarray(c) == 0).all()


def test_sort_count_sentinel_collision():
    # a real all-ones key colliding with invalid-entry sentinels
    keys = jnp.asarray(np.array([0xFFFFFFFF, 1, 0xFFFFFFFF, 2], np.uint32))
    valid = jnp.asarray(np.array([True, True, False, True]))
    up, c, n = cnt.sort_count_compacted([keys], valid)
    n = int(n)
    assert n == 3
    assert np.asarray(up[0])[:n].tolist() == [1, 2, 0xFFFFFFFF]
    assert np.asarray(c)[:n].tolist() == [1, 1, 1]


def test_merge_counted():
    a = jnp.asarray(np.array([2, 5, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32))
    ca = jnp.asarray(np.array([1, 2, 0, 0], np.uint32))
    b = jnp.asarray(np.array([2, 9, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32))
    cb = jnp.asarray(np.array([7, 4, 0, 0], np.uint32))
    up, c, n = cnt.merge_counted([a], ca, [b], cb)
    n = int(n)
    assert n == 3
    assert np.asarray(up[0])[:n].tolist() == [2, 5, 9]
    assert np.asarray(c)[:n].tolist() == [8, 2, 4]


def test_merge_many():
    runs = []
    for vals, cs in [([1, 4], [2, 3]), ([1, 9], [5, 1]), ([4], [7])]:
        pad = 4 - len(vals)
        runs.append((
            [jnp.asarray(np.array(vals + [0xFFFFFFFF] * pad, np.uint32))],
            jnp.asarray(np.array(cs + [0] * pad, np.uint32))))
    up, c, n = cnt.merge_many([r[0] for r in runs], [r[1] for r in runs])
    n = int(n)
    assert n == 3
    assert np.asarray(up[0])[:n].tolist() == [1, 4, 9]
    assert np.asarray(c)[:n].tolist() == [7, 10, 1]


def test_value_histogram():
    counts = jnp.asarray(np.array([1, 1, 2, 5, 0, 0, 100], np.uint32))
    h = np.asarray(cnt.value_histogram(counts, 8))
    assert h[0] == 0 and h[1] == 2 and h[2] == 1 and h[5] == 1
    assert h[7] == 1  # >= num_values clamps to last bin


@pytest.mark.parametrize("op,expect", [
    (jnp.add, [3, 3, 3, 7, 12, 12, 12]),
    (jnp.minimum, [1, 1, 1, 7, 3, 3, 3]),
    (jnp.maximum, [2, 2, 2, 7, 5, 5, 5]),
])
def test_seg_all(op, expect):
    vals = jnp.asarray(np.array([1, 2, 0, 7, 3, 4, 5], np.int32))
    start = jnp.asarray(np.array([1, 0, 0, 1, 1, 0, 0], bool))
    if op is jnp.minimum:
        vals = jnp.asarray(np.array([1, 2, 1, 7, 3, 4, 5], np.int32))
        expect = [1, 1, 1, 7, 3, 3, 3]
    if op is jnp.add:
        vals = jnp.asarray(np.array([1, 2, 0, 7, 3, 4, 5], np.int32))
    out = np.asarray(segscan.seg_all(op, vals, start))
    assert out.tolist() == expect


def test_seg_scan_reverse():
    vals = jnp.asarray(np.array([1, 2, 3, 10, 20], np.int32))
    start = jnp.asarray(np.array([1, 0, 0, 1, 0], bool))
    fwd = np.asarray(segscan.seg_scan(jnp.add, vals, start))
    assert fwd.tolist() == [1, 3, 6, 10, 30]
    bwd = np.asarray(segscan.seg_scan(jnp.add, vals, start, reverse=True))
    assert bwd.tolist() == [6, 5, 3, 30, 20]

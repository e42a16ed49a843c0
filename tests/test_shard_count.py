"""Multi-chip sharded counting must reproduce the single-stream oracle.

Exercises the full SPMD step (extract -> local sort/count -> all-to-all
on 6-bit prefix -> owner merge -> psum histogram) on a virtual 8-device
CPU mesh (see conftest.py).
"""

import numpy as np
import jax
from jax.sharding import Mesh

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.parallel import shard_count as sc


def _run(k, n_dev, chunk_len, seed=3):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n_dev * chunk_len).astype(np.uint8)
    step = sc.make_sharded_count_step(mesh, k, chunk_len=chunk_len)
    planes, counts, hist = step(codes)
    planes = [np.asarray(p).reshape(-1) for p in planes]
    counts = np.asarray(counts).reshape(-1)
    keep = counts > 0
    hi, lo = km.hilo_from_planes([p[keep] for p in planes])
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts[keep])}

    # oracle: each device's shard is an independent sequence (no halo in
    # the SPMD step — shard boundaries are sequence boundaries)
    seqs = []
    for d in range(n_dev):
        s = codes[d * chunk_len:(d + 1) * chunk_len]
        seqs.append("".join(km.ALPHABET[c] for c in s))
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    want = {(int(h) << 64) | int(l): int(c) for h, l, c in zip(ohi, olo, oc)}
    return got, want, np.asarray(hist)


def test_sharded_count_k15_matches_oracle():
    got, want, hist = _run(15, 8, 512)
    assert got == want
    vals, occ = np.unique(list(want.values()), return_counts=True)
    for v, o in zip(vals, occ):
        if v < len(hist):
            assert hist[v] == o


def test_sharded_count_k31_matches_oracle():
    got, want, _ = _run(31, 8, 256)
    assert got == want


def test_sharded_count_k33_threeplane_matches_oracle():
    got, want, _ = _run(33, 4, 256)
    assert got == want


def test_sharded_count_k16_sentinel_boundary():
    # 2k == 32: poly-G kmer collides with the sort sentinel
    got, want, _ = _run(16, 2, 128, seed=11)
    assert got == want

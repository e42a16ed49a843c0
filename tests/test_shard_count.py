"""Routed SPMD sharded counting must reproduce the single-stream
oracle, and its integer row map must be bit-identical between device
and host (the property the owner split of hatch extras rests on).

Exercises the full route-first step (extract -> key-range bucket
routing -> tiled all-to-all of contiguous owner blocks -> row-batched
owner merge) on a virtual 8-device CPU mesh (see conftest.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.ops import accum
from meryl_tpu.parallel import shard_count as sc


def _oracle_map(seqs, k):
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    return {(int(h) << 64) | int(l): int(c)
            for h, l, c in zip(ohi, olo, oc)}


def _run(k, n_dev, chunk_len, seed=3, codes=None, **kw):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    if codes is None:
        rng = np.random.default_rng(seed)
        codes = rng.integers(0, 4, size=n_dev * chunk_len).astype(
            np.uint8)
    counter = sc.ShardedCounter(mesh, k, chunk_len=chunk_len, **kw)
    counter.add_codes(codes)
    hi, lo, counts = counter.finalize()
    got = {(int(h) << 64) | int(l): int(c)
           for h, l, c in zip(hi, lo, counts)}
    # finalize() output must be globally sorted unique
    keys = [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    seqs = []
    for d in range(n_dev):
        s = codes[d * chunk_len:(d + 1) * chunk_len]
        seqs.append("".join(km.ALPHABET[c] if c < 4 else "N"
                            for c in s))
    return got, _oracle_map(seqs, k), counter


def test_row_map_device_host_identical():
    """The exact integer equal-mass map must agree bit-for-bit between
    jnp (what the SPMD step routes with) and np (what the host splits
    hatch extras with) — for every bits width, canonical and linear,
    power-of-two and general B."""
    rng = np.random.default_rng(0)
    for bits in (2, 5, 11, 14, 16):
        pref = rng.integers(0, 1 << bits, size=4096).astype(np.uint32)
        pref[:4] = [0, 1, (1 << bits) - 1, (1 << bits) // 2]
        for B in (1, 2, 8, 24, 96, 2048):
            for canon in (True, False):
                host = accum.row_from_prefix_int(pref, bits, B, canon,
                                                 xp=np)
                dev = np.asarray(accum.row_from_prefix_int(
                    jnp.asarray(pref), bits, B, canon))
                assert (host == dev).all(), (bits, B, canon)
                assert host.min() >= 0 and host.max() < B
                # monotone non-decreasing in prefix
                order = np.argsort(pref, kind="stable")
                assert (np.diff(host[order]) >= 0).all()


def test_row_map_matches_ideal_formula():
    """Spot-check the u32 tricks against exact Python big-int math."""
    for bits in (4, 11, 16):
        t = 1 << bits
        for B in (8, 24, 2048):
            for p in [0, 1, t // 3, t // 2, t - 2, t - 1]:
                num = p * (2 * t - p)  # = t^2 - (t-p)^2
                num32 = num << (32 - 2 * bits)
                want = min((num32 * B) >> 32, B - 1)
                if B & (B - 1) == 0:
                    # the pow2 shift path must agree with the general
                    want2 = min(num32 >> (32 - (B - 1).bit_length()),
                                B - 1)
                    assert want == want2
                got = int(accum.row_from_prefix_int(
                    np.array([p], np.uint32), bits, B, True, xp=np)[0])
                if B & (B - 1) == 0:
                    assert got == want, (bits, B, p)
                else:
                    # the 16/16 split truncates sub-2^-16 terms: the
                    # computable map may differ from ideal by at most
                    # one row, deterministically
                    assert abs(got - want) <= 1, (bits, B, p)


def test_plan_shard_route_geometry():
    g = sc.plan_shard_route(1 << 20, 21, 8)
    assert g["B"] % 8 == 0 and g["B"] <= 2048
    assert g["R0"] * g["L0"] == 1 << 20
    assert g["Wc"] == g["R0"] * g["c"]
    assert g["bits"] == 16
    # tiny k: key space caps the rows
    g = sc.plan_shard_route(4096, 4, 8)
    assert g["B"] == 8 and g["bits"] == 8
    # non-power-of-two device counts still tile
    g = sc.plan_shard_route(4096, 21, 6)
    assert g["B"] % 6 == 0


def test_sharded_count_k15_matches_oracle():
    got, want, _ = _run(15, 8, 512)
    assert got == want


def test_sharded_count_k31_matches_oracle():
    got, want, _ = _run(31, 8, 256)
    assert got == want


def test_sharded_count_k33_threeplane_matches_oracle():
    got, want, _ = _run(33, 4, 256)
    assert got == want


def test_sharded_count_k16_sentinel_boundary():
    # 2k == 32: poly-G kmer collides with the sort sentinel; feed a
    # poly-G run so the all-ones scalar path is exercised through the
    # collective stats
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=2 * 128).astype(np.uint8)
    codes[20:60] = 3  # poly-G: canonical all-ones kmer at k=16
    got, want, _ = _run(16, 2, 128, codes=codes)
    assert got == want


def test_sharded_count_separators_and_empty_shard():
    """Separator codes inside shards; one device entirely separators
    (the multihost keep-alive shape)."""
    rng = np.random.default_rng(5)
    n_dev, chunk = 4, 256
    codes = rng.integers(0, 4, size=n_dev * chunk).astype(np.uint8)
    codes[rng.integers(0, len(codes), size=30)] = 255
    codes[:chunk] = 255  # device 0: nothing but separators
    got, want, _ = _run(11, n_dev, chunk, codes=codes)
    assert got == want


def test_sharded_count_capture_hatch():
    """Composition skew that overflows cells but NOT the capture
    region: a short repeat motif makes a handful of kmers carry the
    whole chunk — they blow their fixed-capacity cells and must come
    back exactly through the capture extras."""
    n_dev, chunk, k = 2, 256, 13
    motif = np.array([0, 1, 2, 3, 0, 0, 1, 3], np.uint8)
    codes = np.tile(motif, n_dev * chunk // len(motif))
    got, want, counter = _run(k, n_dev, chunk, codes=codes)
    assert got == want


def test_sharded_count_bad_source_recount():
    """Adversarial skew (poly-A) that overflows the capture region
    itself: the source's whole chunk contribution must be masked out
    of the staged grid and recounted host-side — exactly."""
    n_dev, chunk, k = 2, 2048, 13
    rng = np.random.default_rng(9)
    codes = np.concatenate([
        np.zeros(chunk, np.uint8),                      # poly-A: bad
        rng.integers(0, 4, size=chunk).astype(np.uint8)  # good
    ])
    got, want, counter = _run(k, n_dev, chunk, codes=codes)
    assert got == want
    assert counter._mask is not None, "mask path not exercised"


def test_sharded_count_multi_k_sweep():
    for k in (5, 9, 21, 32, 48):
        got, want, _ = _run(k, 4, 192, seed=k)
        assert got == want, f"k={k}"

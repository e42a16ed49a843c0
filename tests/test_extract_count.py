"""Differential tests: device extract+count pipeline vs the trivial oracle."""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.counter import count_to_arrays, merge_runs, _chunk_pipeline, _finish_chunk
from meryl_tpu.io.sequence import SEP


def random_seq(rng, n, with_n=False):
    bases = "ACGT" + ("N" if with_n else "")
    p = [0.3, 0.2, 0.2, 0.3] if not with_n else [0.28, 0.19, 0.19, 0.28, 0.06]
    return "".join(rng.choice(list(bases), size=n, p=p))


def run_pipeline_on_seqs(seqs, k, mode="canonical"):
    """Feed sequences through the device pipeline as one chunk."""
    import jax.numpy as jnp
    codes_parts = []
    for s in seqs:
        codes_parts.append(km.encode_bases(s))
        codes_parts.append(np.full(1, SEP, np.uint8))
    codes = np.concatenate(codes_parts)
    (run,) = _finish_chunk(_chunk_pipeline(jnp.asarray(codes), k, mode))
    return run


@pytest.mark.parametrize("k", [4, 15, 16, 17, 21, 31, 32, 33, 48, 63, 64])
def test_single_chunk_vs_oracle(k):
    rng = np.random.default_rng(k)
    seqs = [random_seq(rng, 300), random_seq(rng, 150, with_n=True),
            "ACGT" * 40, "A" * 100]
    hi, lo, c = run_pipeline_on_seqs(seqs, k)
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    np.testing.assert_array_equal(hi, ohi)
    np.testing.assert_array_equal(lo, olo)
    np.testing.assert_array_equal(c.astype(np.uint32), oc)


@pytest.mark.parametrize("mode", ["forward", "reverse"])
def test_modes_vs_oracle(mode):
    rng = np.random.default_rng(7)
    seqs = [random_seq(rng, 500, with_n=True)]
    hi, lo, c = run_pipeline_on_seqs(seqs, 21, mode)
    ohi, olo, oc = oracle.count_kmers(seqs, 21, mode)
    np.testing.assert_array_equal(lo, olo)
    np.testing.assert_array_equal(c.astype(np.uint32), oc)


def test_chunked_counting_matches_oracle(tmp_path):
    """Chunk boundaries (halo logic) must not lose or duplicate kmers."""
    rng = np.random.default_rng(3)
    seqs = [random_seq(rng, rng.integers(30, 400), with_n=True) for _ in range(50)]
    fa = tmp_path / "reads.fasta"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n")
            for j in range(0, len(s), 60):  # multi-line fasta
                f.write(s[j:j + 60] + "\n")
    k = 21
    hi, lo, c = count_to_arrays(str(fa), k, chunk_len=257)  # tiny chunks
    ohi, olo, oc = oracle.count_kmers(seqs, k)
    np.testing.assert_array_equal(hi, ohi)
    np.testing.assert_array_equal(lo, olo)
    np.testing.assert_array_equal(c, oc)


def test_hpc_counting(tmp_path):
    rng = np.random.default_rng(5)
    seqs = ["AAACCCGGGTTTAAA", random_seq(rng, 200), "AATTTTGGCCCCAAAA"]
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")
    hi, lo, c = count_to_arrays(str(fa), 5, hpc=True, chunk_len=64)
    ohi, olo, oc = oracle.count_kmers(seqs, 5, hpc=True)
    np.testing.assert_array_equal(lo, olo)
    np.testing.assert_array_equal(c, oc)


def test_fastq_and_gzip(tmp_path):
    import gzip
    rng = np.random.default_rng(9)
    seqs = [random_seq(rng, 100) for _ in range(20)]
    fq = tmp_path / "reads.fastq.gz"
    with gzip.open(fq, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@q{i}\n{s}\n+\n{'I' * len(s)}\n")
    hi, lo, c = count_to_arrays(str(fq), 17, chunk_len=1000)
    ohi, olo, oc = oracle.count_kmers(seqs, 17)
    np.testing.assert_array_equal(lo, olo)
    np.testing.assert_array_equal(c, oc)


def test_merge_runs_sums_counts():
    h1 = np.array([0, 0, 1], np.uint64)
    l1 = np.array([5, 9, 2], np.uint64)
    c1 = np.array([2, 3, 4], np.uint64)
    h2 = np.array([0, 1], np.uint64)
    l2 = np.array([9, 2], np.uint64)
    c2 = np.array([10, 1], np.uint64)
    hi, lo, c = merge_runs([(h1, l1, c1), (h2, l2, c2)])
    np.testing.assert_array_equal(hi, [0, 0, 1])
    np.testing.assert_array_equal(lo, [5, 9, 2])
    np.testing.assert_array_equal(c, [2, 13, 5])


def test_value_clamp():
    hi = np.array([0], np.uint64)
    lo = np.array([1], np.uint64)
    c = np.array([2**33], np.uint64)
    _, _, out = merge_runs([(hi, lo, c)])
    assert out[0] == km.VALUE_MAX

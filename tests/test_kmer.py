import numpy as np
import pytest

from meryl_tpu import kmer as km


def test_encoding_order():
    # A=00 C=01 T=10 G=11 -- the meryl sort order A < C < T < G
    assert km.string_to_kmer("A") == 0
    assert km.string_to_kmer("C") == 1
    assert km.string_to_kmer("T") == 2
    assert km.string_to_kmer("G") == 3
    assert km.string_to_kmer("AC") == 0b0001
    assert km.string_to_kmer("GA") == 0b1100


def test_roundtrip():
    for s in ["ACGT", "AAAA", "GGGG", "ACTGACTGACTGACTGACTGA",
              "T" * 64, "ACGT" * 16]:
        v = km.string_to_kmer(s)
        assert km.kmer_to_string(v, len(s)) == s


def test_revcomp():
    assert km.kmer_to_string(km.revcomp_kmer(km.string_to_kmer("ACGT"), 4), 4) == "ACGT"
    assert km.kmer_to_string(km.revcomp_kmer(km.string_to_kmer("AAAA"), 4), 4) == "TTTT"
    assert km.kmer_to_string(km.revcomp_kmer(km.string_to_kmer("AACG"), 4), 4) == "CGTT"
    s = "ACTGGTCAAC"
    assert km.kmer_to_string(km.revcomp_kmer(km.string_to_kmer(s), 10), 10) == km.revcomp_string(s)


def test_canonical_uses_actg_order():
    # fmer=TA (0b1000=8), rmer=TA -- palindrome in this encoding? rc(TA)=TA
    # Use CG: rc(CG) = CG. Use AT: rc(AT)= AT. Try AG: rc = CT.
    # AG = 0b0011 = 3 ; CT = 0b0110 = 6 -> canonical AG
    v = km.string_to_kmer("AG")
    assert km.canonical_kmer(v, 2) == v
    # TT: rc = AA = 0 < TT -> canonical AA
    assert km.canonical_kmer(km.string_to_kmer("TT"), 2) == km.string_to_kmer("AA")
    # GT vs rc(GT)=AC: GT=0b1110, AC=0b0001 -> AC
    assert km.canonical_kmer(km.string_to_kmer("GT"), 2) == km.string_to_kmer("AC")


def test_hilo_planes_roundtrip():
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 2**63, 100, dtype=np.uint64)
    lo = rng.integers(0, 2**63, 100, dtype=np.uint64)
    for P in (1, 2, 3, 4):
        mask_hi = np.uint64(0) if P <= 2 else (np.uint64(2**(32*(P-2)) - 1) if P < 4 else np.uint64(0xFFFFFFFFFFFFFFFF))
        mask_lo = np.uint64(2**(32*min(P, 2)) - 1) if P < 2 else np.uint64(0xFFFFFFFFFFFFFFFF)
        h = hi & mask_hi
        l = lo & mask_lo
        planes = km.planes_from_hilo(h, l, P)
        h2, l2 = km.hilo_from_planes(planes)
        np.testing.assert_array_equal(h2, h)
        np.testing.assert_array_equal(l2, l)


def test_prefix6():
    # k=21: kmer has 42 bits; prefix = bits [36, 42)
    v = km.string_to_kmer("GGG" + "A" * 18)  # top 6 bits = 0b111111
    hi, lo = km.hilo_from_int(v)
    p = km.prefix6_from_hilo(np.array([hi], np.uint64), np.array([lo], np.uint64), 21)
    assert p[0] == 63
    # k=33: 66 bits, top 6 bits span hi (2 bits) and lo (4 bits)
    v = km.string_to_kmer("GCT" + "A" * 30)  # codes 11 01 10 -> 0b110110 = 54
    hi, lo = km.hilo_from_int(v)
    p = km.prefix6_from_hilo(np.array([hi], np.uint64), np.array([lo], np.uint64), 33)
    assert p[0] == 54
    # k=64: 128 bits, prefix fully in hi
    v = km.string_to_kmer("TGA" + "C" * 61)  # 10 11 00 -> 0b101100 = 44
    hi, lo = km.hilo_from_int(v)
    p = km.prefix6_from_hilo(np.array([hi], np.uint64), np.array([lo], np.uint64), 64)
    assert p[0] == 44


def test_hilo_to_strings():
    strs = ["ACTGACTGACTGACTGACTGA", "AAAAAAAAAAAAAAAAAAAAA", "GGGGGGGGGGTTTTTTTTTTT"]
    hi, lo = km.kmer_strings_to_hilo(strs)
    out = km.hilo_to_strings(hi, lo, 21)
    assert list(out) == strs
    # k > 32 path
    strs = ["ACTG" * 16, "G" * 64]
    hi, lo = km.kmer_strings_to_hilo(strs)
    out = km.hilo_to_strings(hi, lo, 64)
    assert list(out) == strs


def test_recanonicalize_acgt():
    # Under meryl order GT -> canonical AC. Under ACGT order AC is still min.
    v = km.canonical_kmer(km.string_to_kmer("GT"), 2)
    assert km.kmer_to_string(km.recanonicalize_acgt(v, 2), 2) == "AC"
    # TA vs rc TA: palindrome-ish; CT vs AG: meryl canonical = AG (3 < 6);
    # ACGT canonical of {CT, AG} is AG too.
    v = km.canonical_kmer(km.string_to_kmer("CT"), 2)
    assert km.kmer_to_string(km.recanonicalize_acgt(v, 2), 2) == "AG"
    # GA vs rc(GA)=TC: meryl: GA=0b1100=12, TC=0b1001=9 -> TC canonical.
    # ACGT order: min("GA","TC") = "GA" -> printACGT reports GA.
    v = km.canonical_kmer(km.string_to_kmer("GA"), 2)
    assert km.kmer_to_string(v, 2) == "TC"
    assert km.kmer_to_string(km.recanonicalize_acgt(v, 2), 2) == "GA"

"""Host-side k-mer codec for the TPU-native meryl engine.

Encoding contract (required for decoded parity with reference meryl):
  2-bit codes  A=00, C=01, T=10, G=11  -- i.e. sort order A < C < T < G.
  A k-mer of length k is the 2k-bit integer with the FIRST base in the
  MOST significant bits (reference: kmerTiny::addR right-append; sort
  order defined in /root/reference/src/meryl2/merylSelector.H:87-94 and
  documentation/source/reference.rst:538-566).
  Complement of a code is code ^ 0b10 (A<->T, C<->G).
  Canonical k-mer = min(fmer, rmer) under this integer order
  (/root/reference/src/meryl/merylOp-countThreads.C:246).

k is limited to 64 (128-bit payload, reference `kmdata`); values are
uint32 (`kmvalu`, reference documentation/source/reference.rst:48-50).

Host representation of kmer arrays: a pair of uint64 numpy arrays
(hi, lo) where kmer = hi << 64 | lo.  Device representation: P = ceil(2k/32)
uint32 "planes", plane p = bits [32p, 32p+32).
"""

from __future__ import annotations

import numpy as np

K_MAX = 64
VALUE_MAX = 0xFFFFFFFF  # kmvalu max

ALPHABET = "ACTG"  # index by 2-bit code

# char -> 2-bit code; 255 = invalid (breaks kmers, like reference kmerIterator)
CODE_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(ALPHABET):
    CODE_LUT[ord(_c)] = _i
    CODE_LUT[ord(_c.lower())] = _i

# code complement: A<->T (00<->10), C<->G (01<->11)  == code ^ 2
COMP = np.array([2, 3, 0, 1], dtype=np.uint8)


def num_planes(k: int) -> int:
    """Number of 32-bit device planes for a k-mer of size k."""
    return max(1, (2 * k + 31) // 32)


def encode_bases(seq) -> np.ndarray:
    """ASCII bytes/str -> uint8 code array (255 where not ACGTacgt)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    buf = np.frombuffer(bytes(seq), dtype=np.uint8)
    return CODE_LUT[buf]


def string_to_kmer(s: str) -> int:
    """k-mer string -> 2k-bit integer (python int)."""
    v = 0
    for ch in s:
        c = int(CODE_LUT[ord(ch)])
        if c == 255:
            raise ValueError(f"invalid base {ch!r}")
        v = (v << 2) | c
    return v


def kmer_to_string(v: int, k: int) -> str:
    """2k-bit integer -> k-mer string (first base from MSBs)."""
    out = []
    for i in range(k):
        out.append(ALPHABET[(v >> (2 * (k - 1 - i))) & 3])
    return "".join(out)


def revcomp_kmer(v: int, k: int) -> int:
    """Reverse complement of a 2k-bit kmer integer."""
    r = 0
    for _ in range(k):
        r = (r << 2) | ((v & 3) ^ 2)
        v >>= 2
    return r


def revcomp_string(s: str) -> str:
    m = {"A": "T", "C": "G", "G": "C", "T": "A",
         "a": "t", "c": "g", "g": "c", "t": "a"}
    return "".join(m[c] for c in reversed(s))


def canonical_kmer(v: int, k: int) -> int:
    r = revcomp_kmer(v, k)
    return v if v < r else r


def recanonicalize_acgt(v: int, k: int) -> int:
    """Return the strand of kmer v that is canonical under ACGT (standard
    lexicographic) order rather than meryl's ACTG order.  Used by
    `printACGT` (reference merylOp-nextMer.C:666-669,
    kmer::recanonicalizeACGTorder)."""
    s = kmer_to_string(v, k)
    r = revcomp_string(s)
    return string_to_kmer(min(s, r))


def hilo_from_int(v: int) -> tuple[int, int]:
    return (v >> 64) & 0xFFFFFFFFFFFFFFFF, v & 0xFFFFFFFFFFFFFFFF


def int_from_hilo(hi: int, lo: int) -> int:
    return (int(hi) << 64) | int(lo)


def planes_from_hilo(hi: np.ndarray, lo: np.ndarray, nplanes: int):
    """(hi, lo) uint64 arrays -> list of uint32 plane arrays, LSB plane first."""
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    planes = []
    for p in range(nplanes):
        if p < 2:
            planes.append(((lo >> np.uint64(32 * p)) & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        else:
            planes.append(((hi >> np.uint64(32 * (p - 2))) & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return planes


def hilo_from_planes(planes) -> tuple[np.ndarray, np.ndarray]:
    """List of uint32 plane arrays (LSB first) -> (hi, lo) uint64 arrays."""
    n = len(planes[0])
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    for p, pl in enumerate(planes):
        pl = np.asarray(pl, dtype=np.uint64)
        if p < 2:
            lo |= pl << np.uint64(32 * p)
        else:
            hi |= pl << np.uint64(32 * (p - 2))
    return hi, lo


def prefix6_from_hilo(hi: np.ndarray, lo: np.ndarray, k: int) -> np.ndarray:
    """Top 6 bits of the 2k-bit kmer = DB file id (0..63).

    Matches the reference's 64-way file partitioning (reference
    documentation/source/reference.rst:71-81)."""
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    shift = 2 * k - 6
    if shift < 0:
        # k <= 2: fewer than 6 kmer bits; spread the whole kmer over
        # the 6-bit file space (any monotone map works — writer and
        # readers share this function)
        return ((lo << np.uint64(-shift)) & np.uint64(63)).astype(
            np.uint32)
    if shift >= 64:
        return ((hi >> np.uint64(shift - 64)) & np.uint64(63)).astype(np.uint32)
    # kmer spans hi:lo boundary only when 2k > 64; for 2k <= 64 all in lo
    if 2 * k <= 64:
        return ((lo >> np.uint64(shift)) & np.uint64(63)).astype(np.uint32)
    # 64 < 2k < 70: top bits split between hi and lo
    nhi = 2 * k - 64          # bits of kmer in hi
    need_lo = 6 - nhi         # bits to take from top of lo
    top = (hi & ((np.uint64(1) << np.uint64(nhi)) - np.uint64(1))) << np.uint64(need_lo)
    top |= lo >> np.uint64(64 - need_lo)
    return (top & np.uint64(63)).astype(np.uint32)


def kmer_strings_to_hilo(strings) -> tuple[np.ndarray, np.ndarray]:
    hi = np.empty(len(strings), dtype=np.uint64)
    lo = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        v = string_to_kmer(s)
        hi[i], lo[i] = (v >> 64) & 0xFFFFFFFFFFFFFFFF, v & 0xFFFFFFFFFFFFFFFF
    return hi, lo


def hilo_to_strings(hi: np.ndarray, lo: np.ndarray, k: int):
    """Vectorized decode of (hi, lo) kmer arrays into ACTG strings."""
    n = len(lo)
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    codes = np.empty((n, k), dtype=np.uint8)
    # shifts are even and the hi/lo boundary is at bit 64 (even), so a 2-bit
    # code never spans the boundary.
    for i in range(k):
        shift = 2 * (k - 1 - i)
        if shift >= 64:
            c = (hi >> np.uint64(shift - 64)) & np.uint64(3)
        else:
            c = (lo >> np.uint64(shift)) & np.uint64(3)
        codes[:, i] = c.astype(np.uint8)
    lut = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)
    chars = lut[codes]
    return chars.view(f"S{k}").ravel().astype(str)

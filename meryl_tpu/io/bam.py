"""BAM ingestion (no external dependencies).

The reference vendors htslib for BAM/CRAM decoding
(/root/reference/src/utility — src/main.mk:92-140).  Here BAM is decoded
directly: BGZF is a multi-member gzip stream (python's gzip module
handles member concatenation transparently) and BAM alignment records
are a fixed little-endian layout with 4-bit packed bases.

CRAM's reference-based codec stack lives in io.cram (dependency-free
CRAM 3.0).

All records (including secondary/supplementary alignments) are yielded
as stored; canonical counting is strand-insensitive so the alignment
orientation does not affect counts.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterator, Tuple

import numpy as np

# 4-bit base codes: =ACMGRSVTWYHKDBN
SEQ16 = b"=ACMGRSVTWYHKDBN"
_SEQ16_LUT = np.frombuffer(SEQ16, dtype=np.uint8)


def is_bam(path: str) -> bool:
    try:
        with gzip.open(path, "rb") as f:
            return f.read(4) == b"BAM\x01"
    except Exception:
        return False


def iter_bam(path: str) -> Iterator[Tuple[str, bytes, bytes | None]]:
    """Yield (name, bases, quals|None) per alignment record."""
    with gzip.open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack("<i", f.read(4))
        f.read(l_text)  # SAM header text
        (n_ref,) = struct.unpack("<i", f.read(4))
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", f.read(4))
            f.read(l_name + 4)  # name + l_ref
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            (block_size,) = struct.unpack("<i", hdr)
            rec = f.read(block_size)
            if len(rec) < block_size:
                break
            l_read_name = rec[8]
            (n_cigar_op,) = struct.unpack_from("<H", rec, 12)
            (l_seq,) = struct.unpack_from("<i", rec, 16)
            off = 32
            name = rec[off:off + l_read_name - 1].decode("ascii", "replace")
            off += l_read_name
            off += 4 * n_cigar_op
            nbytes = (l_seq + 1) // 2
            packed = rec[off:off + nbytes]
            off += nbytes
            qual = rec[off:off + l_seq]
            # vectorized 4-bit unpack (high nibble first): the same
            # numpy-LUT style as kmer.CODE_LUT — a per-base Python loop
            # dominates ingest time on real BAMs
            pk = np.frombuffer(packed, dtype=np.uint8)
            nib = np.empty(2 * len(pk), np.uint8)
            nib[0::2] = pk >> 4
            nib[1::2] = pk & 0xF
            bases = _SEQ16_LUT[nib[:l_seq]].tobytes()
            if l_seq and qual and qual[0] == 0xFF:
                qual = None  # quality absent (0xFF fill per BAM spec)
            elif qual:
                # Phred+33, clamped to printable range (a bogus stored
                # value > 222 must not abort the whole file)
                qual = (np.minimum(
                    np.frombuffer(qual, np.uint8).astype(np.uint16) + 33,
                    255).astype(np.uint8)).tobytes()
            else:
                qual = None
            yield name, bases, qual

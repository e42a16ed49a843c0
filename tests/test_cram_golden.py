"""Golden CRAM corpus: checked-in streams written by the repo's
encoders at a pinned version (scripts/gen_cram_golden.py), with
byte-exact recorded hashes for both the stream and its decode.

This closes the loop the mutation fuzz cannot: the fuzz matrix
(test_codec_fuzz.py) proves bounded failure on corrupted streams, and
the round-trip tests prove encoder/decoder self-consistency *today* —
but a future edit that changed both sides of a codec coherently (a
silent wire-format reinterpretation) would pass every round-trip.
Pinned bytes with pinned decodes fail loudly instead.

SCOPE (advisor r4): this corpus pins against future DRIFT, not against
EXTERNAL conformance — every stream here was written by this repo's
own encoders, so a spec misinterpretation present at pin time would be
baked in.  External anchoring needs an htslib-written stream
(samtools/pysam), neither of which exists in this zero-egress image;
when one becomes available, add it beside the self-generated set and
pin its decode only (its bytes are the foreign writer's business).

Reference anchor: the golden-md5 end-to-end scheme,
/root/reference/src/tests/meryl-lookup-test.sh:101-215.
"""

import hashlib
import json
import os

import pytest

from meryl_tpu.io import cram

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures",
                      "cram_golden")


def _manifest():
    with open(os.path.join(FIXDIR, "manifest.json")) as f:
        return json.load(f)


MANIFEST = _manifest()


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_fixture_bytes_pinned(name):
    """The checked-in stream itself is byte-stable: regenerating
    fixtures with a drifted encoder cannot slip through."""
    with open(os.path.join(FIXDIR, name + ".cram"), "rb") as f:
        blob = f.read()
    ent = MANIFEST[name]
    assert len(blob) == ent["bytes"]
    assert hashlib.sha256(blob).hexdigest() == ent["file_sha256"]


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_fixture_decodes_to_pinned_content(name):
    """Decoding the pinned bytes yields the pinned content."""
    ent = MANIFEST[name]
    path = os.path.join(FIXDIR, name + ".cram")
    got = list(cram.iter_cram(path, want_quals=ent["with_quals"]))
    assert len(got) == ent["n_reads"]
    h = hashlib.sha256()
    for rname, seq, qual in got:
        nm = rname if ent["with_names"] else ""
        q = qual.decode() if (ent["with_quals"] and qual is not None) \
            else ""
        h.update(f"{nm}\t{seq.decode()}\t{q}\n".encode())
    assert h.hexdigest() == ent["decoded_sha256"], (
        f"{name}: decoded content drifted from the golden record")


def test_corpus_covers_every_codec():
    """The corpus spans every block-compression method the reader
    supports (raw, gzip, rANS 4x8 o0/o1, rANS Nx16 o0/o1/transforms,
    arith o0/o1, fqzcomp, tok3)."""
    need = {"raw_m0", "gzip_m1", "rans4x8_o0", "rans4x8_o1",
            "ransnx16_o0", "ransnx16_o1_32way",
            "ransnx16_stripe_pack_rle", "arith_o0", "arith_o1_rle",
            "fqzcomp_quals", "tok3_names"}
    assert need <= set(MANIFEST)

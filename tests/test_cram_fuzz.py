"""CRAM decoder fuzz: random reads through random per-series codec
methods, and random mapped feature strings checked against an
independent inline reconstruction model (writer, decoder, and model
triangulate each other's reading of the spec)."""

import random

import numpy as np
import pytest

from meryl_tpu.io import cram

from tests import cram_writer as cw

METHODS = [0, 1, 4, 41, 5, 51, 52, 6, 61]


@pytest.mark.parametrize("trial", range(6))
def test_unmapped_fuzz(tmp_path, trial):
    rng = random.Random(100 + trial)
    reads = [(f"n{i}.{rng.randrange(999)}",
              "".join(rng.choices("ACGTN", weights=[8, 8, 8, 8, 1],
                                  k=rng.choice([0, 1, 2, 50, 151]))))
             for i in range(rng.choice([1, 7, 120]))]
    series_methods = {k: rng.choice(METHODS)
                      for k in ("BF", "CF", "RL", "AP", "RG", "RN",
                                "TL", "BA")}
    with_names = rng.random() < 0.7
    p = str(tmp_path / f"f{trial}.cram")
    cw.write_unmapped_cram(p, reads, method=rng.choice(METHODS),
                           with_names=with_names,
                           series_methods=series_methods)
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    if with_names:
        assert got == reads, series_methods
    else:
        assert [s for _, s in got] == [s for _, s in reads]
    # bulk codes path agrees with the record path
    from meryl_tpu.kmer import CODE_LUT
    codes = np.concatenate(list(cram.iter_cram_codes(p))) \
        if reads else np.zeros(0, np.uint8)
    want = []
    for _, s in reads:
        want.extend(int(CODE_LUT[b]) for b in s.encode())
        want.append(0xFF)
    assert np.array_equal(codes, np.array(want, np.uint8))


def _expected_mapped(ref, pos1, rl, feats):
    """Independent model: apply CRAM read features to a reference
    window (spec semantics re-derived, not copied from the decoder)."""
    out = []
    rpos = pos1 - 1        # 0-based ref cursor
    read_pos = 0           # 0-based read cursor (1-based in wire fmt)
    prev = 0
    for code, gap, payload in feats:
        p = prev + gap     # 1-based read position of the feature
        prev = p
        copy = (p - 1) - read_pos
        out.append(ref[rpos:rpos + copy])
        rpos += copy
        read_pos += copy
        if code == "X":
            # identity-permutation subst matrix (0x1B rows): code i ->
            # i-th base of "ACGTN" minus the ref base
            refb = ref[rpos]
            others = [b for b in "ACGTN" if b != refb]
            out.append(others[payload])
            rpos += 1
            read_pos += 1
        elif code == "I":
            out.append(payload)
            read_pos += len(payload)
        elif code == "S":
            out.append(payload)
            read_pos += len(payload)
        elif code == "b":
            out.append(payload)
            rpos += len(payload)
            read_pos += len(payload)
        elif code == "i":
            out.append(payload)
            read_pos += 1
        elif code == "D":
            rpos += payload
        else:
            raise AssertionError(code)
    out.append(ref[rpos:rpos + (rl - read_pos)])
    return "".join(out)


@pytest.mark.parametrize("trial", range(6))
def test_mapped_fuzz(tmp_path, trial, monkeypatch):
    rng = random.Random(200 + trial)
    ref = "".join(rng.choices("ACGT", k=400))
    reads = []
    for i in range(25):
        rl = rng.randrange(20, 60)
        pos1 = rng.randrange(1, len(ref) - 2 * rl)
        feats = []
        # wire FP gaps are feature-position deltas (p_i = p_{i-1} +
        # gap_i, 1-based); keep features non-overlapping: the next
        # gap must clear the previous payload's read-width
        p = 0
        min_gap = 1
        while p <= rl - 8 and rng.random() < 0.75:
            gap = rng.randrange(min_gap, min_gap + 4)
            np_ = p + gap
            code = rng.choice(["X", "I", "D", "b", "i"])
            if code == "X":
                payload = rng.randrange(0, 4)
                width = 1
            elif code == "I":
                payload = "".join(rng.choices("ACGT",
                                              k=rng.randrange(1, 4)))
                width = len(payload)
            elif code == "b":
                payload = "".join(rng.choices("ACGT",
                                              k=rng.randrange(1, 4)))
                width = len(payload)
            elif code == "i":
                payload = rng.choice("ACGT")
                width = 1
            else:
                payload = rng.randrange(1, 5)
                width = 0
            if np_ + max(width, 1) > rl:
                break
            feats.append((code, gap, payload))
            p = np_
            min_gap = max(1, width)
        reads.append((f"m{i}", pos1, rl, feats))
    p = str(tmp_path / f"m{trial}.cram")
    cw.write_mapped_cram(p, "chr1", ref, reads,
                         method=rng.choice([0, 1, 4, 5]))
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">chr1\n{ref}\n")
    monkeypatch.setenv("MERYL_TPU_CRAM_REF", str(ref_fa))
    got = {n: s.decode() for n, s, _ in cram.iter_cram(p)}
    for name, pos1, rl, feats in reads:
        want = _expected_mapped(ref, pos1, rl, feats)
        assert got[name] == want, (trial, name, feats)

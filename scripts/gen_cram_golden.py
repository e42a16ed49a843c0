"""Generate the golden CRAM corpus (tests/fixtures/cram_golden/).

One stream per 3.0/3.1 codec x flag combination, written by the
repo's own encoders (tests/cram_writer.py) at a PINNED point in time:
the binaries are checked in and tests/test_cram_golden.py asserts that
(a) the checked-in bytes still decode to the recorded content and
(b) the checked-in bytes themselves match the recorded hashes — so a
future codec edit that silently changes wire-format interpretation
(either direction) fails loudly instead of drifting.

Run ONLY to extend the corpus with new cases; regenerating existing
fixtures defeats their purpose (the manifest will flag any byte
change).  Reference anchor for the golden-stream scheme:
/root/reference/src/tests/meryl-lookup-test.sh:101-215 (md5-pinned
end-to-end outputs).

Usage: python scripts/gen_cram_golden.py [--force]
"""

import hashlib
import json
import os
import random
import sys

sys.path.insert(0, "/root/repo")

from tests import cram_writer as cw  # noqa: E402

OUT = "/root/repo/tests/fixtures/cram_golden"


def make_reads(n, rlen, seed, names="plain"):
    r = random.Random(seed)
    reads = []
    for i in range(n):
        seq = "".join(r.choices("ACGT", k=rlen))
        if names == "tok":
            name = f"inst:7:{100 + i % 3}:{2000 + i}:{3000 + 7 * i}"
        else:
            name = f"read.{seed}.{i}"
        reads.append((name, seq))
    return reads


def make_quals(reads, seed):
    r = random.Random(seed + 1)
    return ["".join(chr(33 + r.randrange(0, 60)) for _ in s)
            for _, s in reads]


# (fixture name, writer kwargs factory)
CASES = [
    ("raw_m0", dict(method=0)),
    ("gzip_m1", dict(method=1)),
    ("rans4x8_o0", dict(method=4)),
    ("rans4x8_o1", dict(method=41)),
    ("ransnx16_o0", dict(method=5)),
    ("ransnx16_o1_32way", dict(method=51)),
    ("ransnx16_stripe_pack_rle", dict(method=52)),
    ("arith_o0", dict(method=6)),
    ("arith_o1_rle", dict(method=61)),
    ("fqzcomp_quals", dict(method=5, quals=True,
                           series_methods={"QS": 7})),
    ("tok3_names", dict(method=5, names="tok",
                        series_methods={"RN": 8})),
    ("quals_arith", dict(method=4, quals=True,
                         series_methods={"QS": 6})),
    ("multi_container", dict(method=1, reads_per_container=16)),
    ("huffman_const_flags", dict(method=4, huffman_bf=True)),
    ("no_names", dict(method=4, with_names=False)),
]


def gen_case(name, spec, force):
    path = os.path.join(OUT, name + ".cram")
    if os.path.exists(path) and not force:
        return None
    n, rlen = 48, 101
    seed = abs(hash(name)) % 100000
    # hash() is salted per process; pin the seed from the name bytes
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:2],
                          "big")
    reads = make_reads(n, rlen, seed, spec.get("names", "plain"))
    quals = make_quals(reads, seed) if spec.get("quals") else None
    kw = {}
    if spec.get("series_methods"):
        kw["series_methods"] = spec["series_methods"]
    if spec.get("reads_per_container"):
        kw["reads_per_container"] = spec["reads_per_container"]
    if spec.get("huffman_bf"):
        kw["codec_overrides"] = {
            "BF": cw.encoding_huffman_single(4)}
    cw.write_unmapped_cram(path, reads, method=spec["method"],
                           with_names=spec.get("with_names", True),
                           quals=quals, **kw)
    return path, reads, quals, spec.get("with_names", True)


def decoded_digest(reads, quals, with_names):
    h = hashlib.sha256()
    for i, (name, seq) in enumerate(reads):
        q = quals[i] if quals else ""
        nm = name if with_names else ""
        h.update(f"{nm}\t{seq}\t{q}\n".encode())
    return h.hexdigest()


def main():
    force = "--force" in sys.argv
    os.makedirs(OUT, exist_ok=True)
    mpath = os.path.join(OUT, "manifest.json")
    manifest = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    for name, spec in CASES:
        got = gen_case(name, spec, force)
        if got is None:
            print(f"  keep {name} (exists; --force to overwrite)")
            continue
        path, reads, quals, with_names = got
        with open(path, "rb") as f:
            blob = f.read()
        manifest[name] = {
            "file_sha256": hashlib.sha256(blob).hexdigest(),
            "decoded_sha256": decoded_digest(reads, quals, with_names),
            "n_reads": len(reads),
            "read_len": len(reads[0][1]),
            "with_names": with_names,
            "with_quals": bool(quals),
            "bytes": len(blob),
        }
        print(f"  wrote {name}: {len(blob)} bytes")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"manifest: {len(manifest)} fixtures")


if __name__ == "__main__":
    main()

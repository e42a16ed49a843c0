"""Test-only CRAM 3.0 encoder.

Written independently against the CRAM 3.0 specification (not against
meryl_tpu/io/cram.py) so encoder and decoder cross-check each other's
reading of the spec.  Produces single-slice containers with EXTERNAL /
BYTE_ARRAY_STOP encodings — the layout htslib emits for typical files —
with selectable block compression (raw / gzip / rANS-4x8 order 0/1).
"""

import struct
import zlib

RANS_BYTE_L = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF])
    return bytes([0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
                  (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    v &= (1 << 64) - 1
    if v < 0x80:
        return bytes([v])
    out = []
    n = 0
    t = v
    while t >= (0x80 >> n) and n < 8:
        n += 1
        t >>= 8
        if n == 8:
            break
    # simple general form: pick fewest extra bytes e such that
    # v < 2^(7*(e+1) - e)  -> brute force
    for extra in range(1, 9):
        if extra < 8:
            maxv = 1 << (7 - extra + 8 * extra)
        else:
            maxv = 1 << 64
        if v < maxv:
            body = (v & ((1 << (8 * extra)) - 1)).to_bytes(extra, "big")
            if extra < 8:
                first = ((0xFF << (8 - extra)) & 0xFF) | (v >> (8 * extra))
                return bytes([first]) + body
            return bytes([0xFF]) + body
    raise ValueError(v)
    del out, n


# ------------------------------------------------------------ rANS 4x8

def _norm_freqs(data: bytes):
    freq = [0] * 256
    for b in data:
        freq[b] += 1
    total = len(data)
    norm = [0] * 256
    # largest remainder to TOTFREQ with present symbols >= 1
    acc = 0
    rema = []
    for s in range(256):
        if not freq[s]:
            continue
        exact = freq[s] * TOTFREQ / total
        f = max(1, int(exact))
        norm[s] = f
        acc += f
        rema.append((exact - f, s))
    # fix rounding drift
    rema.sort(reverse=True)
    i = 0
    while acc < TOTFREQ and rema:
        _, s = rema[i % len(rema)]
        norm[s] += 1
        acc += 1
        i += 1
    i = 0
    while acc > TOTFREQ:
        _, s = rema[i % len(rema)]
        if norm[s] > 1:
            norm[s] -= 1
            acc -= 1
        i += 1
    return norm


def _write_freqs(norm) -> bytes:
    out = bytearray()
    rle = 0
    for j in range(256):
        if not norm[j]:
            continue
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j and norm[j - 1]:
                r = j + 1
                while r < 256 and norm[r]:
                    r += 1
                rle = r - j - 1
                out.append(rle)
        f = norm[j]
        if f < 128:
            out.append(f)
        else:
            out.append(0x80 | (f >> 8))
            out.append(f & 0xFF)
    out.append(0)
    return bytes(out)


def _cum(norm):
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + norm[s]
    return cum


def rans_encode_o0(data: bytes) -> bytes:
    if not data:
        return b"\x00" + struct.pack("<II", 0, 0)
    norm = _norm_freqs(data)
    cum = _cum(norm)
    table = _write_freqs(norm)
    R = [RANS_BYTE_L] * 4
    emitted = bytearray()
    for i in range(len(data) - 1, -1, -1):
        k = i & 3
        s = data[i]
        f = norm[s]
        x = R[k]
        x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        R[k] = ((x // f) << TF_SHIFT) + cum[s] + (x % f)
    states = struct.pack("<4I", *R)
    body = table + states + bytes(reversed(emitted))
    return b"\x00" + struct.pack("<II", len(body), len(data)) + body


def rans_encode_o1(data: bytes) -> bytes:
    n = len(data)
    if n < 4:
        return rans_encode_o0(data)
    isz4 = n >> 2
    # per-context frequency tables over the interleaved quarters
    freq = {}

    def bump(ctx, s):
        f = freq.setdefault(ctx, [0] * 256)
        f[s] += 1

    for k in range(4):
        start = k * isz4
        end = start + isz4 if k < 3 else n
        ctx = 0
        for i in range(start, end):
            bump(ctx, data[i])
            ctx = data[i]
    norm = {}
    cums = {}
    for ctx, f in freq.items():
        total = sum(f)
        nf = [0] * 256
        acc = 0
        rema = []
        for s in range(256):
            if not f[s]:
                continue
            exact = f[s] * TOTFREQ / total
            x = max(1, int(exact))
            nf[s] = x
            acc += x
            rema.append((exact - x, s))
        rema.sort(reverse=True)
        i = 0
        while acc < TOTFREQ and rema:
            _, s = rema[i % len(rema)]
            nf[s] += 1
            acc += 1
            i += 1
        i = 0
        while acc > TOTFREQ:
            _, s = rema[i % len(rema)]
            if nf[s] > 1:
                nf[s] -= 1
                acc -= 1
            i += 1
        norm[ctx] = nf
        cums[ctx] = _cum(nf)

    # context table: same outer RLE structure as order-0 symbols
    out = bytearray()
    ctxs = sorted(norm)
    rle = 0
    for idx, ctx in enumerate(ctxs):
        if rle:
            rle -= 1
        else:
            out.append(ctx)
            if ctx and (ctx - 1) in norm:
                r = ctx + 1
                cnt = 0
                while (r + cnt) in norm:
                    cnt += 1
                rle = cnt
                out.append(rle)
        out += _write_freqs(norm[ctx])

    out.append(0)

    R = [RANS_BYTE_L] * 4
    emitted = bytearray()
    # encode streams in reverse; stream 3 owns the tail
    segs = []
    for k in range(4):
        start = k * isz4
        end = start + isz4 if k < 3 else n
        segs.append((start, end))

    # interleave exactly as the decoder consumes: it decodes position
    # j of every stream round-robin (k=0..3), then the tail from
    # stream 3.  Encoding must push symbols in the exact reverse of
    # decode order.
    order = []
    for j in range(isz4):
        for k in range(4):
            order.append((k, segs[k][0] + j))
    for i in range(4 * isz4, n):
        order.append((3, i))

    for k, i in reversed(order):
        s = data[i]
        start = segs[k][0]
        ctx = data[i - 1] if i > start else 0
        f = norm[ctx][s]
        x = R[k]
        x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        R[k] = ((x // f) << TF_SHIFT) + cums[ctx][s] + (x % f)
    body = bytes(out) + struct.pack("<4I", *R) + bytes(reversed(emitted))
    return b"\x01" + struct.pack("<II", len(body), n) + body


# -------------------------------------------------------------- blocks

def block(method: int, ctype: int, content_id: int, raw: bytes) -> bytes:
    if method == 0:
        comp = raw
    elif method == 1:
        comp = zlib.compress(raw)
    elif method == 4:
        comp = rans_encode_o0(raw)
    elif method == 41:  # test alias: rANS order-1
        method = 4
        comp = rans_encode_o1(raw)
    elif method == 5:   # rANS-Nx16 order-0
        from meryl_tpu.io import rans_nx16
        method = 5
        comp = rans_nx16.encode(raw)
    elif method == 51:  # test alias: rANS-Nx16 order-1, 32-way
        from meryl_tpu.io import rans_nx16
        method = 5
        f = rans_nx16.ORDER1 | rans_nx16.X32 if len(raw) >= 32 else 0
        comp = rans_nx16.encode(raw, f)
    elif method == 52:  # test alias: rANS-Nx16 stripe+pack/rle mix
        from meryl_tpu.io import rans_nx16
        method = 5
        if 0 < len(set(raw)) <= 16:
            f = rans_nx16.PACK | rans_nx16.RLE
        else:
            f = rans_nx16.STRIPE | rans_nx16.NOSZ
        comp = rans_nx16.encode(raw, f)
    elif method == 6:   # adaptive arithmetic order-0
        from meryl_tpu.io import arith
        comp = arith.encode(raw)
    elif method == 61:  # test alias: arith order-1 + RLE
        from meryl_tpu.io import arith, rans_nx16
        method = 6
        comp = arith.encode(raw, arith.ORDER1 | rans_nx16.RLE)
    elif method == 7:   # fqzcomp (whole payload as one record)
        from meryl_tpu.io import fqzcomp
        comp = fqzcomp.encode([raw]) if raw else b""
    elif method == 8:   # tok3 name tokenizer (separator-terminated)
        from meryl_tpu.io import tok3
        comp = tok3.encode(raw)
    elif method == 96:  # test alias: fqzcomp id, unparseable stream
        method = 7
        comp = b"\x05\x00" + b"\xff" * 8
    elif method == 97:  # test alias: unsupported method id, opaque payload
        method = 9
        comp = b"\xde\xad" + raw[:2]
    elif method == 98:  # test alias: claims gzip, holds garbage
        method = 1
        comp = b"\x13\x37corrupt" + raw[:3]
    else:
        raise ValueError(method)
    out = bytes([method, ctype]) + itf8(content_id) + \
        itf8(len(comp)) + itf8(len(raw)) + comp
    return out + struct.pack("<I", zlib.crc32(out))


def encoding_external(cid: int) -> bytes:
    params = itf8(cid)
    return itf8(1) + itf8(len(params)) + params


def encoding_byte_array_stop(stop: int, cid: int) -> bytes:
    params = bytes([stop]) + itf8(cid)
    return itf8(5) + itf8(len(params)) + params


def encoding_huffman_single(value: int) -> bytes:
    params = itf8(1) + itf8(value) + itf8(1) + itf8(0)
    return itf8(3) + itf8(len(params)) + params


# ids for external blocks, one per data series
IDS = {"BF": 1, "CF": 2, "RL": 3, "AP": 4, "RG": 5, "RN": 6, "TL": 7,
       "BA": 8, "FN": 9, "FC": 10, "FP": 11, "BS": 12, "DL": 13,
       "IN": 14, "SC": 15, "BB": 16, "MQ": 17, "QS": 18, "NF": 19}
STOP = {"RN": ord("\n"), "IN": 0, "SC": 0, "BB": 0}


def compression_header(read_names=True, ap_delta=False, ref_required=True,
                       series=("BF", "CF", "RL", "AP", "RG", "RN", "TL"),
                       codec_overrides=None):
    pres = bytearray()
    nkeys = 0
    for key, val in ((b"RN", read_names), (b"AP", ap_delta),
                     (b"RR", ref_required)):
        pres += key + bytes([1 if val else 0])
        nkeys += 1
    pres += b"SM" + bytes([0x1B] * 5)  # code i -> i-th other base (abc order)
    nkeys += 1
    pres += b"TD" + itf8(1) + b"\x00"  # one empty tag line
    nkeys += 1
    pm = itf8(nkeys) + bytes(pres)

    ds = bytearray()
    nds = 0
    for key in series:
        ds += key.encode()
        if codec_overrides and key in codec_overrides:
            ds += codec_overrides[key]
        elif key in STOP:
            ds += encoding_byte_array_stop(STOP[key], IDS[key])
        else:
            ds += encoding_external(IDS[key])
        nds += 1
    dsm = itf8(nds) + bytes(ds)
    tm = itf8(0)
    body = itf8(len(pm)) + pm + itf8(len(dsm)) + dsm + \
        itf8(len(tm)) + tm
    # note: spec writes map size then the map (whose first field is its
    # own key count); sizes here are of the remainder
    return bytes(body)


def slice_header(ref_id, start, span, nrec, content_ids,
                 embedded_ref_id=-1):
    b = itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec) + \
        ltf8(0) + itf8(len(content_ids) + 1) + \
        itf8(len(content_ids)) + b"".join(itf8(c) for c in content_ids) + \
        itf8(embedded_ref_id) + b"\x00" * 16
    return b


def container(blocks: list, ref_id=-1, start=0, span=0, nrec=0, nbases=0,
              landmarks=(0,)):
    body = b"".join(blocks)
    hdr = itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec) + \
        ltf8(0) + ltf8(nbases) + itf8(len(blocks)) + \
        itf8(len(landmarks)) + b"".join(itf8(x) for x in landmarks)
    hdr = struct.pack("<i", len(body)) + hdr + struct.pack("<I", 0)
    return hdr + body


EOF_CONTAINER = bytes.fromhex(
    "0f000000ffffffff0fe0454f460000000001000"
    "5bdd94f0001000606010001000100ee63014b")


def file_definition() -> bytes:
    return b"CRAM" + bytes([3, 0]) + b"testfile".ljust(20, b"\x00")


def sam_header_container(ref_names_lens) -> bytes:
    text = b"@HD\tVN:1.6\n"
    for name, ln in ref_names_lens:
        text += b"@SQ\tSN:" + name.encode() + b"\tLN:" + \
            str(ln).encode() + b"\n"
    raw = struct.pack("<i", len(text)) + text
    blk = block(0, 0, 0, raw)
    return container([blk], nrec=0, ref_id=0)


def write_unmapped_cram(path, reads, method=0, with_names=True,
                        series_methods=None, quals=None,
                        codec_overrides=None, reads_per_container=None):
    """reads: list of (name, seq str).  series_methods overrides the
    block compression method per data series, e.g. {"RN": 97}.
    quals: optional list of Phred+33 strings (or None per read);
    stored raw (minus 33) with the CF quality flag set.
    codec_overrides maps a series key to raw encoding bytes (e.g.
    encoding_huffman_single) — that series then gets no external
    block.  reads_per_container splits the reads over multiple
    containers (htslib's default layout: ~10k records per container)."""
    if reads_per_container is not None:
        conts = []
        for a in range(0, len(reads), reads_per_container):
            conts.append(_unmapped_container(
                reads[a:a + reads_per_container], method, with_names,
                series_methods,
                quals[a:a + reads_per_container] if quals else None,
                codec_overrides))
        with open(path, "wb") as f:
            f.write(file_definition())
            f.write(sam_header_container([("ref", 1000)]))
            for c in conts:
                f.write(c)
            f.write(EOF_CONTAINER)
        return
    with open(path, "wb") as f:
        f.write(file_definition())
        f.write(sam_header_container([("ref", 1000)]))
        f.write(_unmapped_container(reads, method, with_names,
                                    series_methods, quals,
                                    codec_overrides))
        f.write(EOF_CONTAINER)


def _unmapped_container(reads, method, with_names, series_methods,
                        quals, codec_overrides) -> bytes:
    streams = {k: bytearray() for k in IDS}
    for idx, (name, seq) in enumerate(reads):
        q = quals[idx] if quals else None
        streams["BF"] += itf8(0x4)       # unmapped
        streams["CF"] += itf8(1 if q else 0)
        streams["RL"] += itf8(len(seq))
        streams["AP"] += itf8(0)
        streams["RG"] += itf8(-1)
        if with_names:
            streams["RN"] += name.encode() + b"\n"
        streams["TL"] += itf8(0)
        streams["BA"] += seq.encode()
        if q:
            streams["QS"] += bytes(ord(c) - 33 for c in q)
    series = ["BF", "CF", "RL", "AP", "RG", "TL", "BA"]
    if quals and any(quals):
        series.append("QS")
    if with_names:
        series.insert(5, "RN")
    ch = compression_header(read_names=with_names, series=tuple(series),
                            codec_overrides=codec_overrides)
    ch_blk = block(method if method != 4 else 1, 1, 0, ch)
    used = [k for k in series if streams[k]
            and not (codec_overrides and k in codec_overrides)]
    content_ids = [IDS[k] for k in used]
    sh = slice_header(-1, 0, 0, len(reads), content_ids)
    blocks = [block(0, 2, 0, sh), block(0, 5, 0, b"")]  # header + core
    for k in used:
        m = (series_methods or {}).get(k, method)
        blocks.append(block(m, 4, IDS[k], bytes(streams[k])))
    return container([ch_blk] + blocks, ref_id=-1, nrec=len(reads),
                     landmarks=(len(ch_blk),))


def write_mapped_cram(path, ref_name, ref_seq, reads, method=0,
                      ap_delta=False):
    """reads: list of (name, pos1, read_len, features); features are
    (code, gap, payload):
      ('X', gap, subst_code)  ('I', gap, 'ACG')  ('S', gap, 'TT')
      ('D', gap, dlen)        ('b', gap, 'ACGT')  ('i', gap, 'A')
    """
    streams = {k: bytearray() for k in IDS}
    # AP delta: first record's delta is from the slice alignment start
    last_ap = min(r[1] for r in reads)
    for name, pos1, rl, feats in reads:
        streams["BF"] += itf8(0)
        streams["CF"] += itf8(0)
        streams["RL"] += itf8(rl)
        if ap_delta:
            streams["AP"] += itf8(pos1 - last_ap)
            last_ap = pos1
        else:
            streams["AP"] += itf8(pos1)
        streams["RG"] += itf8(-1)
        streams["RN"] += name.encode() + b"\n"
        streams["TL"] += itf8(0)
        streams["FN"] += itf8(len(feats))
        for code, gap, payload in feats:
            streams["FC"] += bytes([ord(code)])
            streams["FP"] += itf8(gap)
            if code == "X":
                streams["BS"] += bytes([payload])
            elif code == "I":
                streams["IN"] += payload.encode() + b"\x00"
            elif code == "S":
                streams["SC"] += payload.encode() + b"\x00"
            elif code == "b":
                streams["BB"] += payload.encode() + b"\x00"
            elif code == "i":
                streams["BA"] += payload.encode()
            elif code == "D":
                streams["DL"] += itf8(payload)
            else:
                raise ValueError(code)
        streams["MQ"] += itf8(60)
    series = ["BF", "CF", "RL", "AP", "RG", "RN", "TL", "FN", "FC",
              "FP", "BS", "DL", "IN", "SC", "BB", "BA", "MQ"]
    ch = compression_header(read_names=True, ap_delta=ap_delta,
                            series=tuple(series))
    ch_blk = block(0, 1, 0, ch)
    used = [k for k in series if streams[k]]
    content_ids = [IDS[k] for k in used]
    start = min(r[1] for r in reads)
    span = max(r[1] + r[2] for r in reads) - start + 16
    sh = slice_header(0, start, span, len(reads), content_ids)
    blocks = [block(0, 2, 0, sh), block(0, 5, 0, b"")]
    for k in used:
        blocks.append(block(method, 4, IDS[k], bytes(streams[k])))
    cont = container([ch_blk] + blocks, ref_id=0, start=start, span=span,
                     nrec=len(reads), landmarks=(len(ch_blk),))
    with open(path, "wb") as f:
        f.write(file_definition())
        f.write(sam_header_container([(ref_name, len(ref_seq))]))
        f.write(cont)
        f.write(EOF_CONTAINER)

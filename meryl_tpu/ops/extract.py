"""Device-side canonical k-mer extraction.

Turns a fixed-length chunk of 2-bit base codes into per-position
(fmer, rmer, canonical) multiword kmers plus a validity mask, entirely
with vectorized ops (no scans): windows of length k are built by a
binary-doubling combine, O(log k) multiword shift/or steps.

Shifts are pure `lax.slice`s over progressively shrinking buffers (the
input is padded once by k-1+ codes): slices fuse into their consumers,
whereas the previous concatenate-based shifts materialized a buffer per
shift and broke XLA fusion (~2x the HBM passes).

Semantics matched to the reference:
  * canonical = min(fmer, rmer) in the A=00,C=01,T=10,G=11 integer order
    (/root/reference/src/meryl/merylOp-countThreads.C:244-256)
  * any non-ACGT code invalidates every window containing it — this is
    how both sequence breaks and N bases are handled (reference
    kmerIterator; merylOp-countThreads.C:196-226)
  * count-forward / count-reverse variants keep the forward / reverse
    mer instead (merylOp.H:33-35)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import multiword as mw
from ..kmer import num_planes

U32 = jnp.uint32
INVALID_CODE = 255
_PAD = 64  # >= k-1 for k <= 64


def _shift_planes(planes, m: int, out_len: int):
    """Slice-based shift: result[i] = planes[i+m], length out_len."""
    return [lax.slice(p, (m,), (m + out_len,)) for p in planes]


def _trim(planes, out_len: int):
    return [lax.slice(p, (0,), (out_len,)) for p in planes]


def _build_windows(base_f, base_r, base_v, k: int, L: int):
    """Binary-doubling build of length-k windows over padded buffers.

    base_*: arrays of length L + _PAD; every combine shrinks the
    working length by the shift amount (slices, no copies), ending at
    exactly L + _PAD - (k-1) >= L entries.
    """
    bits = bin(k)[2:]  # MSB first
    accf, accr, accv, alen = base_f, base_r, base_v, 1
    cur = L + _PAD

    def combine_f(acc, acc_len, other, other_len, out_len):
        """window(a+b)[i] = window_a[i] << 2b | window_b[i+a]."""
        return mw.bor(mw.shl(_trim(acc, out_len), 2 * other_len),
                      _shift_planes(other, acc_len, out_len))

    def combine_r(acc, acc_len, other, other_len, out_len):
        """rc(a+b)[i] = rc_b[i+a] << 2a | rc_a[i]."""
        return mw.bor(mw.shl(_shift_planes(other, acc_len, out_len),
                             2 * acc_len),
                      _trim(acc, out_len))

    for b in bits[1:]:
        # double: acc_len -> 2*acc_len
        nxt = cur - alen
        accf = combine_f(accf, alen, accf, alen, nxt)
        accr = combine_r(accr, alen, accr, alen, nxt)
        accv = lax.slice(accv, (0,), (nxt,)) & \
            lax.slice(accv, (alen,), (alen + nxt,))
        cur = nxt
        alen *= 2
        if b == "1":
            nxt = cur - 1
            accf = combine_f(accf, alen, base_f, 1, nxt)
            accr = combine_r(accr, alen, base_r, 1, nxt)
            accv = lax.slice(accv, (0,), (nxt,)) & \
                lax.slice(base_v, (alen,), (alen + nxt,))
            cur = nxt
            alen += 1
    assert alen == k and cur == L + _PAD - (k - 1)
    return _trim(accf, L), _trim(accr, L), lax.slice(accv, (0,), (L,))


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def extract_kmers(codes, k: int, mode: str = "canonical"):
    """codes: (L,) uint8/uint32 base codes (0..3, INVALID_CODE elsewhere).

    Returns (planes, valid) where planes is a list of P uint32 arrays of
    length L (window starting at each position; windows running past the
    end are invalid) and valid is a bool array of length L.
    """
    codes = codes.astype(U32)
    L = codes.shape[0]
    P = num_planes(k)

    padded = jnp.concatenate(
        [codes, jnp.full((_PAD,), INVALID_CODE, U32)])
    is_valid = (padded <= U32(3)).astype(U32)
    c = jnp.where(padded <= U32(3), padded, U32(0))
    zero = jnp.zeros((L + _PAD,), U32)
    base_f = [c] + [zero] * (P - 1)
    base_r = [c ^ U32(2)] + [zero] * (P - 1)

    fmer, rmer, valid = _build_windows(base_f, base_r, is_valid, k, L)

    # windows that run off the end of the chunk are invalid (the pad is
    # INVALID_CODE, so `valid` already covers this; pos_ok is belt and
    # braces for the L-k+1..L-1 tail)
    pos_ok = jnp.arange(L, dtype=jnp.int32) <= jnp.int32(L - k)
    validb = (valid == U32(1)) & pos_ok

    if mode == "canonical":
        use_f = mw.lt(fmer, rmer)
        out = mw.select(use_f, fmer, rmer)
    elif mode == "forward":
        out = fmer
    elif mode == "reverse":
        out = rmer
    elif mode == "both":
        # forward and reverse-complement mers per position (the lookup
        # tools query both to support non-canonical DBs, reference
        # dump.C:93-127)
        return fmer, rmer, validb
    else:
        raise ValueError(mode)
    return out, validb

"""Device-side canonical k-mer extraction.

Turns a fixed-length chunk of 2-bit base codes into per-position
(fmer, rmer, canonical) multiword kmers plus a validity mask, entirely
with vectorized ops (no scans): windows of length k are built by a
binary-doubling combine, O(log k) multiword shift/or steps.

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

from . import multiword as mw
from ..kmer import num_planes

U32 = jnp.uint32
INVALID_CODE = 255


def _shift_pos(arr, m: int, fill):
    """arr shifted so index i holds arr[i+m]; tail filled with `fill`."""
    if m == 0:
        return arr
    return jnp.concatenate([arr[m:], jnp.full((m,), fill, arr.dtype)])


def _shift_planes(planes, m: int):
    return [_shift_pos(p, m, U32(0)) for p in planes]


def _combine_f(acc, acc_len, other, other_len):
    """Forward-mer combine: window(a+b)[i] = window_a[i] << 2b | window_b[i+a]."""
    return mw.bor(mw.shl(acc, 2 * other_len), _shift_planes(other, acc_len))


def _combine_r(acc, acc_len, other, other_len):
    """Revcomp-mer combine: rc(a+b)[i] = rc_b[i+a] << 2a | rc_a[i]."""
    return mw.bor(mw.shl(_shift_planes(other, acc_len), 2 * acc_len), acc)


def _build_windows(base_f, base_r, base_v, k: int):
    """Binary-doubling build of length-k windows.

    base_f/base_r: P-plane lists for single-base forward / complement codes.
    base_v: uint32 1=valid single-base mask.
    Returns (fmer_planes, rmer_planes, valid_u32) for windows of length k.
    """
    bits = bin(k)[2:]  # MSB first
    accf, accr, accv, alen = base_f, base_r, base_v, 1
    for b in bits[1:]:
        # double: acc_len -> 2*acc_len
        accf = _combine_f(accf, alen, accf, alen)
        accr = _combine_r(accr, alen, accr, alen)
        accv = accv & _shift_pos(accv, alen, U32(0))
        alen *= 2
        if b == "1":
            accf = _combine_f(accf, alen, base_f, 1)
            accr = _combine_r(accr, alen, base_r, 1)
            accv = accv & _shift_pos(base_v, alen, U32(0))
            alen += 1
    assert alen == k
    return accf, accr, accv


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

    is_valid = (codes <= U32(3)).astype(U32)
    c = jnp.where(codes <= U32(3), codes, U32(0))
    zero = jnp.zeros((L,), U32)
    base_f = [c] + [zero] * (P - 1)
    base_r = [c ^ U32(2)] + [zero] * (P - 1)

    fmer, rmer, valid = _build_windows(base_f, base_r, is_valid, k)

    # windows that run off the end of the chunk are invalid
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

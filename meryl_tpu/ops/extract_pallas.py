"""Pallas TPU kernel: fused canonical k-mer extraction.

Equivalent of ops/extract.py's XLA path as one Pallas kernel: each grid
step loads a block of 2-bit base codes plus a k-1 halo into VMEM,
builds the forward and reverse-complement rolling kmers with the same
O(log k) binary-doubling combine, selects the canonical strand, and
writes the kmer planes + validity for its block — one HBM round trip
instead of XLA's many fused-pass boundaries.

Shifts are lane rotations (pltpu.roll) on (1, N)-shaped VMEM blocks;
the halo rides in as a second, non-overlapping input (overlapping
BlockSpecs are not expressible in block units).

Enable on the counting path with MERYL_TPU_PALLAS=1 (falls back to the
XLA path if the kernel fails to compile on the local toolchain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kmer import num_planes

U32 = jnp.uint32
BLOCK = 1 << 13          # codes per grid step (VMEM budget: ~12 u32
#                          intermediates per element must fit in 16MB)
HALO = 128               # >= k-1 for k <= 64, lane-aligned


def _shift_left(x, m: int):
    """x (1, N): result[i] = x[i+m] for i < N-m (tail wraps; callers
    only read positions whose shifts stay inside the array)."""
    if m == 0:
        return x
    n = x.shape[1]
    return pltpu.roll(x, n - m, axis=1)  # left-shift by m == roll by N-m


def _kernel(codes_ref, halo_ref, *out_refs, k, P, block):
    plane_refs = list(out_refs[:P])
    valid_ref = out_refs[P]

    c = jnp.concatenate([codes_ref[:], halo_ref[:]], axis=1).astype(U32)
    is_valid = (c <= U32(3)).astype(U32)
    cc = jnp.where(c <= U32(3), c, U32(0))

    zero = jnp.zeros_like(cc)
    base_f = [cc] + [zero] * (P - 1)
    base_r = [cc ^ U32(2)] + [zero] * (P - 1)
    accf, accr, accv, alen = base_f, base_r, is_valid, 1

    def mw_shl(planes, bits):
        if bits == 0:
            return list(planes)
        word, sub = bits // 32, bits % 32
        out = []
        for p in range(P):
            src = p - word
            if src < 0:
                out.append(jnp.zeros_like(planes[0]))
                continue
            v = planes[src] << U32(sub) if sub else planes[src]
            if sub and src - 1 >= 0:
                v = v | (planes[src - 1] >> U32(32 - sub))
            out.append(v)
        return out

    def combine_f(a, a_len, b, b_len):
        sh = [_shift_left(p, a_len) for p in b]
        return [x | y for x, y in zip(mw_shl(a, 2 * b_len), sh)]

    def combine_r(a, a_len, b, b_len):
        sh = [_shift_left(p, a_len) for p in b]
        return [x | y for x, y in zip(mw_shl(sh, 2 * a_len), a)]

    for bit in bin(k)[3:]:  # MSB-first, skipping the leading 1
        accf = combine_f(accf, alen, accf, alen)
        accr = combine_r(accr, alen, accr, alen)
        accv = accv & _shift_left(accv, alen)
        alen *= 2
        if bit == "1":
            accf = combine_f(accf, alen, base_f, 1)
            accr = combine_r(accr, alen, base_r, 1)
            accv = accv & _shift_left(is_valid, alen)
            alen += 1

    # canonical = min(fmer, rmer) under the multiword integer order
    less = None
    eq = None
    for p in range(P - 1, -1, -1):
        l_p = accf[p] < accr[p]
        e_p = accf[p] == accr[p]
        if less is None:
            less, eq = l_p, e_p
        else:
            less = less | (eq & l_p)
            eq = eq & e_p
    use_f = less | eq

    for p in range(P):
        plane_refs[p][:] = jnp.where(use_f, accf[p], accr[p])[:, :block]
    valid_ref[:] = (accv == U32(1))[:, :block]


@functools.partial(jax.jit,
                   static_argnames=("k", "block", "interpret"))
def extract_kmers_pallas(codes, k: int, block: int = BLOCK,
                         interpret: bool = False):
    """codes: (L,) uint8/int32, L a multiple of `block`.

    Returns (planes, valid) with the same contract as
    ops.extract.extract_kmers in canonical mode."""
    L = codes.shape[0]
    if L % block:
        raise ValueError(f"L={L} not a multiple of block={block}")
    P = num_planes(k)
    c = codes.astype(jnp.int32)
    rows = c.reshape(L // block, block)
    # halo[i] = first HALO codes of block i+1 (255-padded for the last)
    halos = jnp.concatenate(
        [rows[1:, :HALO],
         jnp.full((1, HALO), 255, jnp.int32)], axis=0)
    n_blocks = L // block
    flat = rows.reshape(1, L)
    halos_flat = halos.reshape(1, n_blocks * HALO)

    kern = functools.partial(_kernel, k=k, P=P, block=block)
    out_shapes = ([jax.ShapeDtypeStruct((1, L), jnp.uint32)
                   for _ in range(P)] +
                  [jax.ShapeDtypeStruct((1, L), jnp.bool_)])
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HALO), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, block), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * (P + 1),
        out_shape=out_shapes,
        interpret=interpret,
    )(flat, halos_flat)
    planes = [o.reshape(L) for o in outs[:P]]
    validb = outs[P].reshape(L)
    pos_ok = jnp.arange(L, dtype=jnp.int32) <= jnp.int32(L - k)
    return planes, validb & pos_ok

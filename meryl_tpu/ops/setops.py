"""Device-side k-mer set/arithmetic operations.

TPU-native replacement for the reference's lazy N-way streaming merge
(/root/reference/src/meryl/merylOp-nextMer.C:418-683): instead of a
per-kmer pull loop cloned 64x under OpenMP, each DB bucket is evaluated
as one batched kernel — concatenate the (sorted, unique) inputs, sort,
and compute every op's value with segment reductions.  Zero value means
"suppress this kmer" exactly as in the reference (merylOp-nextMer.C:643).

Value semantics (merylOp-nextMer.C:478-641):
  union               number of inputs containing the kmer (_actLen)
  union-min/max/sum   min/max/sum of values over inputs that have it
  intersect           value of the FIRST input (only if in all inputs)
  intersect-min/max/sum
  subtract            in input 1: v1 - sum(others) if positive else 0
                      (sequential-clamp semantics reduce to this)
  difference          v1 if the kmer is ONLY in input 1
  symmetric-difference  its value if in exactly one input
  less-than/greater-than/at-least/at-most/equal-to/not-equal-to  T
  increase/decrease/multiply/divide/divide-round/modulo          C
  (arithmetic wraps at 2^32 like the reference's uint32 kmvalu)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32
SENT = U32(0xFFFFFFFF)
BIG_ID = jnp.int32(0x7FFFFFFF)

MERGE_OPS = frozenset([
    "union", "union-min", "union-max", "union-sum",
    "intersect", "intersect-min", "intersect-max", "intersect-sum",
    "subtract", "difference", "symmetric-difference", "passthrough",
])
FILTER_OPS = frozenset([
    "less-than", "greater-than", "at-least", "at-most",
    "equal-to", "not-equal-to",
])
MATH_OPS = frozenset([
    "increase", "decrease", "multiply", "divide", "divide-round", "modulo",
])


def _sort_with_payload(planes, payloads):
    P = len(planes)
    keys = [planes[p] for p in range(P - 1, -1, -1)]  # MSB plane first
    ops = jax.lax.sort(tuple(keys) + tuple(payloads),
                       num_keys=P, is_stable=True)
    return [ops[P - 1 - p] for p in range(P)], list(ops[P:])


def _run_starts(planes):
    neq = None
    for p in planes:
        d = p != jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, U32), p[:-1]])
        neq = d if neq is None else (neq | d)
    return neq | jnp.zeros_like(neq).at[0].set(True)


def _apply_value_rule(op: str, m: int, act_len, v_first, first_idx,
                      v_min, v_max, v_sum, threshold):
    """Per-unique-kmer output value; 0 = suppress."""
    t = threshold.astype(U32)
    zero = jnp.zeros_like(v_sum)
    if op == "union":
        return act_len.astype(U32)
    if op == "union-min":
        return v_min
    if op == "union-max":
        return v_max
    if op == "union-sum":
        return v_sum
    if op == "passthrough":
        return v_first
    if op.startswith("intersect"):
        allin = act_len == m
        base = {"intersect": v_first, "intersect-min": v_min,
                "intersect-max": v_max, "intersect-sum": v_sum}[op]
        return jnp.where(allin, base, zero)
    if op == "subtract":
        rest = v_sum - v_first
        ok = (first_idx == 0) & (v_first > rest)
        return jnp.where(ok, v_first - rest, zero)
    if op == "difference":
        return jnp.where((act_len == 1) & (first_idx == 0), v_first, zero)
    if op == "symmetric-difference":
        return jnp.where(act_len == 1, v_first, zero)
    # single-input value filters / arithmetic (applied to v_first)
    v = v_first
    if op == "less-than":
        return jnp.where(v < t, v, zero)
    if op == "greater-than":
        return jnp.where(v > t, v, zero)
    if op == "at-least":
        return jnp.where(v >= t, v, zero)
    if op == "at-most":
        return jnp.where(v <= t, v, zero)
    if op == "equal-to":
        return jnp.where(v == t, v, zero)
    if op == "not-equal-to":
        return jnp.where(v != t, v, zero)
    if op == "increase":
        return v + t
    if op == "decrease":
        return jnp.where(v < t, zero, v - t)
    if op == "multiply":
        return v * t
    if op == "divide":
        return jnp.where(t == 0, zero, v // jnp.maximum(t, U32(1)))
    if op == "divide-round":
        td = jnp.maximum(t, U32(1))
        q = v // td
        r = v - q * td
        half = (td >> U32(1)) + (td & U32(1))  # ceil(t/2); round half up
        q = q + jnp.where(r >= half, U32(1), U32(0))
        q = jnp.where(v < td, U32(1), q)
        return jnp.where(t == 0, zero, q)
    if op == "modulo":
        return jnp.where(t == 0, zero, v % jnp.maximum(t, U32(1)))
    raise ValueError(f"unknown operation {op!r}")


@jax.jit
def _merge_sort_stage(planes, values, input_ids):
    """Stable multiword sort with payloads; the program ends at the
    sort to keep XLA:TPU's fast sort path (see ops/count.py)."""
    splanes, (val, ids) = _sort_with_payload(planes, (values, input_ids))
    return splanes, val, ids


def merge_op(planes, values, input_ids, op: str, m: int, threshold):
    """Evaluate one set operation over concatenated input buckets.

    planes:    P uint32 arrays, all inputs concatenated (padding entries
               carry the all-ones sentinel key and value 0)
    values:    uint32 (0 marks padding)
    input_ids: int32 input index per entry (0-based)
    op, m:     operation name and number of inputs
    threshold: uint32 scalar (threshold or math constant)

    Returns (sorted_planes, out_values, keep_mask): entries where
    keep_mask is True are the surviving kmers, ascending, value > 0.

    Host-orchestrated in two device programs (sort | compute)."""
    splanes, val, ids = _merge_sort_stage(planes, values, input_ids)
    return _merge_compute_stage(splanes, val, ids, op, m, threshold)


@functools.partial(jax.jit, static_argnames=("op", "m"))
def _merge_compute_stage(splanes, val, ids, op: str, m: int, threshold):
    from . import segscan

    start = _run_starts(splanes)

    present = val > U32(0)
    ones = jnp.where(present, 1, 0).astype(jnp.int32)
    # scatter-free per-run reductions (see ops/segscan.py): sums, mins
    # and maxes each share one fused forward+backward segmented scan
    act_len, v_sum = segscan.seg_sum_all(
        (ones, jnp.where(present, val, U32(0))), start)
    # rank within run among present entries (stable sort preserves the
    # input-then-position order, so rank 0 is the first instance of the
    # lowest-indexed present input — exact even for multiset inputs)
    prefix = jnp.cumsum(ones) - ones
    v_min, first_idx, rank_base = segscan.seg_min_all(
        (jnp.where(present, val, SENT),
         jnp.where(present, ids, BIG_ID),
         prefix), start)
    is_first = present & (prefix == rank_base)
    v_max, v_first = segscan.seg_max_all(
        (jnp.where(present, val, U32(0)),
         jnp.where(is_first, val, U32(0))), start)

    out = _apply_value_rule(op, m, act_len, v_first, first_idx,
                            v_min, v_max, v_sum, threshold)
    keep = start & (out > U32(0)) & (act_len > 0)
    return splanes, out.astype(U32), keep

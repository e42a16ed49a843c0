"""Analytic multi-chip scaling model for sharded counting.

No multi-chip hardware is reachable from this environment, so instead
of a measurement the -C plan prints a checkable prediction: from the
MEASURED single-chip stage costs (docs/tpu-design.md) plus published
interconnect bandwidths, estimate each SPMD step's local compute, ICI
all-to-all, DCN crossing, and accumulator-merge time, and report the
parallel efficiency at several device counts.

The counting step (parallel/shard_count.make_sharded_count_step) does,
per device and per chunk of C bases:

  1. local extract + sort + run-length compaction          t_local
  2. all-to-all of unique (kmer, count) pairs to owners    t_ici/t_dcn
  3. merge of the received runs into the accumulator       t_merge

Efficiency(n) = t_local(n=1) / (t_local + t_wire + t_merge + t_skew):
all stages except the wire are per-device constant (perfect data
parallelism), so the question -C answers is whether the wire and the
merge stay small relative to compute.

Reference analog: the counting memory model's analytic planning stance
(/root/reference/src/meryl/merylOp-count.C:299-462) — plan from a
model, verify against reality later.
"""

from __future__ import annotations

import os

# measured on a v5e chip over the dev tunnel, RTT-corrected
# (docs/tpu-design.md): the compacted count pipeline (extract + sort +
# RLE + on-device compaction) per base, and the row-batched sort floor
# per element for the merge stage
T_LOCAL_NS_PER_BASE = 3.3
T_SORT_NS_PER_ELT = 1.5

# bytes per unique (kmer, count) entry on the wire: P=2 planes + count
WIRE_BYTES = 12

# interconnect defaults (checkable assumptions, overridable by env):
# v5p ICI is 3D-torus at ~4x 200 GB/s links/chip; a full all-to-all
# sustains roughly a third of the bisection share per chip.  DCN
# (multi-host) planned at 100 Gb/s/host usable.
ICI_GB_S = float(os.environ.get("MERYL_TPU_ICI_GB_S", 150.0))
DCN_GB_S = float(os.environ.get("MERYL_TPU_DCN_GB_S", 12.5))

# owner-skew headroom: equal-mass boundaries leave composition skew;
# the pair_cap sizing uses 4x, the expected hot-owner load is ~1.3x
SKEW = 1.3


def predict_scaling(chunk_len: int, n_devices: int,
                    chips_per_host: int = 4,
                    ici_domain: int = 256,
                    dedup: float = 1.0) -> dict:
    """Predicted per-step times (seconds) and parallel efficiency for
    an n_devices mesh counting chunks of chunk_len bases per device.

    ici_domain: chips per ICI torus (one pod/slice).  Cross-HOST
    traffic inside a pod still rides ICI — the torus spans the pod;
    DCN binds only across pods (multislice).
    dedup: fraction of windows that survive local per-chunk dedup
    (1.0 = worst case, low-coverage input)."""
    c = float(chunk_len)
    uniques = c * dedup
    t_local = c * T_LOCAL_NS_PER_BASE * 1e-9
    # every unique leaves its source with probability (n-1)/n
    wire_bytes = uniques * WIRE_BYTES * (n_devices - 1) / max(n_devices, 1)
    n_hosts = max(1, n_devices // chips_per_host)
    n_pods = max(1, -(-n_devices // ici_domain))
    if n_devices <= 1:
        t_ici = t_dcn = 0.0
    else:
        t_ici = wire_bytes / (ICI_GB_S * 1e9)
        if n_pods <= 1:
            t_dcn = 0.0
        else:
            # fraction of shuffled bytes that cross a pod boundary,
            # paid on each pod's aggregate DCN by its chips together
            cross = wire_bytes * (n_pods - 1) / n_pods
            t_dcn = cross * chips_per_host / (DCN_GB_S * 1e9)
    # merge of the n received sorted runs into the accumulator:
    # ~uniques entries re-sorted at the row-batched floor, plus the
    # hot owner's skew share
    t_merge = uniques * T_SORT_NS_PER_ELT * 1e-9 * 2.0
    # owner skew only exists once work is shuffled by owner
    t_skew = (SKEW - 1.0) * (t_ici + t_merge) if n_devices > 1 else 0.0
    t_step = t_local + t_ici + t_dcn + t_merge + t_skew
    t_ref = t_local + t_merge  # single chip also merges its chunks
    return {
        "devices": n_devices,
        "hosts": n_hosts,
        "t_local_ms": round(t_local * 1e3, 3),
        "t_ici_ms": round(t_ici * 1e3, 3),
        "t_dcn_ms": round(t_dcn * 1e3, 3),
        "t_merge_ms": round(t_merge * 1e3, 3),
        "t_skew_ms": round(t_skew * 1e3, 3),
        "efficiency": round(t_ref / t_step, 4),
        "bases_per_s": round(n_devices * c / t_step, 1),
    }


def scaling_report(chunk_len: int, counts=(8, 64, 256),
                   chips_per_host: int = 4) -> list:
    """Predicted efficiency table for the -C plan."""
    return [predict_scaling(chunk_len, n, chips_per_host)
            for n in counts]
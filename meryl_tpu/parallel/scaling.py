"""Analytic multi-chip scaling model for sharded counting.

No multi-chip hardware is reachable from this environment, so instead
of a measurement the -C plan prints a checkable prediction: from the
MEASURED single-chip stage costs plus published interconnect
bandwidths, estimate each SPMD step's local compute, ICI all-to-all,
DCN crossing, and accumulator-merge time, and report the parallel
efficiency at several device counts.

Stage-cost calibration is re-measured every round: bench.py emits
`t_local_ns_per_base` (the compacted shard-step local kernel) and
`t_merge_ns_per_elt` (the row-batched merge floor) into BENCH_r{N}.json
and this module reads the newest such file at import, so -C's table is
derived from the current round's hardware measurements, not
hand-entered literals (VERDICT r3 item 5).  Resolution order:
env override > newest BENCH_r*.json > built-in r3/r4 measurements.

The ROUTED counting step (parallel/shard_count.make_routed_step, the
round-5 design) does, per device and per chunk of C bases:

  1. extract + key-range cell routing (row-batched sorts)  t_local
  2. ONE tiled all-to-all of the raw-window cell grid      t_ici/t_dcn
  3. row-batched fold into the owner accumulator
     (accum.merge_cells)                                   t_merge

The wire and merge volumes are C * inflate SLOTS, where inflate =
B*Wc/C is the cell-grid padding factor of the routing geometry
(plan_shard_route; ~1.3-1.7x) — slot counts are FIXED per (source,
owner) pair, so the wire and the merge are balanced by construction
(composition skew lands in the exact capture/recount hatches instead
of in a hot owner).

Efficiency(n) = (t_local + t_merge) / (t_local + t_wire + t_merge):
all stages except the wire are per-device constant (perfect data
parallelism), so the question -C answers is whether the wire stays
small relative to compute.

Reference analog: the counting memory model's analytic planning stance
(/root/reference/src/meryl/merylOp-count.C:299-462) — plan from a
model, verify against reality later.
"""

from __future__ import annotations

import glob
import json
import os
import re

# built-in fallbacks (v5e chip over the dev tunnel, RTT-corrected,
# docs/tpu-design.md round-5 tables): routed cell build per base;
# row-batched merge_cells fold per staged slot.  bench.py re-measures
# both every round (bench_calibration) and the newest BENCH_r*.json
# wins.  (The pre-r5 built-ins of 1.6/1.6 came from the retracted
# "~0.9 ns/elt" design note — see STATUS.md; these are measured.)
_DEFAULT_T_LOCAL_NS = 11.0
_DEFAULT_T_MERGE_NS = 4.6

# bytes per cell slot on the wire: P=2 key planes (raw windows carry
# an implicit count of 1 — no count word crosses)
WIRE_BYTES = 8

# Per-generation interconnect table (docs/multihost.md for sources and
# the derivation).  "aggregate" is the published per-chip ICI
# bandwidth; a full all-to-all across the torus sustains roughly a
# third of it per chip (bisection share), which is what the model
# uses.  DCN is the usable per-host share for multislice crossings.
ICI_TABLE = {
    #          aggregate GB/s   all-to-all GB/s   DCN GB/s/host
    "v4":  {"ici_aggregate": 300.0, "ici": 100.0, "dcn": 12.5},
    "v5e": {"ici_aggregate": 200.0, "ici":  67.0, "dcn": 12.5},
    "v5p": {"ici_aggregate": 600.0, "ici": 200.0, "dcn": 25.0},
}
TPU_GEN = os.environ.get("MERYL_TPU_GEN", "v5e")

# owner-skew headroom: the routed step ships FIXED slot counts per
# (source, owner) pair and folds fixed-width staged grids, so wire and
# merge are balanced by construction; residual skew is the (rare,
# bounded) capture/recount hatch traffic
SKEW = 1.0


def _newest_bench_json(root: str):
    cands = []
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        # rounds < 5 measured the FLAT shard-step kernels under the
        # same field names (the step was rebuilt routed in round 5);
        # feeding those into the routed model would be a silent
        # semantics mismatch, so they are skipped
        if m and int(m.group(1)) >= 5:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def _load_calibration() -> dict:
    """(t_local_ns, t_merge_ns, source) resolved from env > newest
    BENCH_r*.json > built-ins."""
    t_local = t_merge = None
    src_l = src_m = None
    if os.environ.get("MERYL_TPU_T_LOCAL_NS"):
        t_local = float(os.environ["MERYL_TPU_T_LOCAL_NS"])
        src_l = "env"
    if os.environ.get("MERYL_TPU_T_MERGE_NS"):
        t_merge = float(os.environ["MERYL_TPU_T_MERGE_NS"])
        src_m = "env"
    if t_local is None or t_merge is None:
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        path = os.environ.get("MERYL_TPU_BENCH_JSON") \
            or _newest_bench_json(root)
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
                # driver-written BENCH_r*.json wraps the bench line as
                # {"n", "cmd", "rc", "tail", "parsed": {...}} — the
                # metrics live under "parsed" (a bare bench.py capture
                # is the flat dict itself)
                if not isinstance(data, dict):
                    raise ValueError("BENCH json top level not a dict")
                if isinstance(data.get("parsed"), dict):
                    data = data["parsed"]
                name = os.path.basename(path)
                if t_local is None and "t_local_ns_per_base" in data \
                        and data["t_local_ns_per_base"] > 0:
                    t_local = float(data["t_local_ns_per_base"])
                    src_l = name
                if t_merge is None and "t_merge_ns_per_elt" in data \
                        and data["t_merge_ns_per_elt"] > 0:
                    t_merge = float(data["t_merge_ns_per_elt"])
                    src_m = name
            except (OSError, ValueError, KeyError):
                pass
    if t_local is None:
        t_local, src_l = _DEFAULT_T_LOCAL_NS, "built-in"
    if t_merge is None:
        t_merge, src_m = _DEFAULT_T_MERGE_NS, "built-in"
    return {"t_local_ns": t_local, "t_merge_ns": t_merge,
            "t_local_src": src_l, "t_merge_src": src_m}


CALIBRATION = _load_calibration()
T_LOCAL_NS_PER_BASE = CALIBRATION["t_local_ns"]
T_MERGE_NS_PER_ELT = CALIBRATION["t_merge_ns"]

# interconnect (per-generation table above; env-overridable)
ICI_GB_S = float(os.environ.get(
    "MERYL_TPU_ICI_GB_S", ICI_TABLE.get(TPU_GEN, ICI_TABLE["v5e"])["ici"]))
DCN_GB_S = float(os.environ.get(
    "MERYL_TPU_DCN_GB_S", ICI_TABLE.get(TPU_GEN, ICI_TABLE["v5e"])["dcn"]))


def predict_scaling(chunk_len: int, n_devices: int,
                    chips_per_host: int = 4,
                    ici_domain: int = 256,
                    k: int = 21) -> dict:
    """Predicted per-step times (seconds) and parallel efficiency for
    an n_devices mesh counting chunks of chunk_len bases per device
    with the routed SPMD step.

    ici_domain: chips per ICI torus (one pod/slice).  Cross-HOST
    traffic inside a pod still rides ICI — the torus spans the pod;
    DCN binds only across pods (multislice)."""
    from .shard_count import plan_shard_route
    c = float(chunk_len)
    g = plan_shard_route(chunk_len, k, max(1, n_devices))
    # cell-grid slots per chunk: fixed by the routing geometry, NOT by
    # coverage — raw windows cross (count 1 each), padding included
    slots = float(g["B"] * g["Wc"])
    t_local = c * T_LOCAL_NS_PER_BASE * 1e-9
    # a slot leaves its source with probability (n-1)/n (tiled
    # all-to-all of contiguous owner blocks)
    wire_bytes = slots * WIRE_BYTES * (n_devices - 1) / max(n_devices, 1)
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
    # fold of the received staged grid into the accumulator: every
    # cell slot rides the row-batched merge sort exactly once per
    # merge cadence (fixed width per owner row — balanced)
    t_merge = slots * T_MERGE_NS_PER_ELT * 1e-9
    t_skew = (SKEW - 1.0) * (t_ici + t_merge) if n_devices > 1 else 0.0
    t_step = t_local + t_ici + t_dcn + t_merge + t_skew
    t_ref = t_local + t_merge  # single chip also routes and merges
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

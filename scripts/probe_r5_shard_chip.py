"""Compile and run the SPMD sharded-count program on the REAL TPU
chip (VERDICT r4 item 2).

Every sharded/multihost test and the driver dryrun runs on virtual CPU
meshes; a `shard_map` + `lax.all_to_all` + `psum` program can lower
differently (or hit axon backend bugs) on the real TPU pipeline —
CLAUDE.md documents Mosaic surprises of exactly this kind.  A 1-device
mesh degenerates the collective but the program still compiles through
the real backend, which retires the cheap risk.

Phases (each decode-compared vs the single-chip path on the same chip):
  1. base: 6 x 2^20-base random input through count_to_arrays_sharded
     (routed step + tiled all_to_all + psum stats + row-batched merge)
  2. spill: same input with a tiny acc_cap -> the proactive spill +
     regrow hatches run on the real backend
  3. adversarial: poly-A flood at tiny chunks -> capture region, the
     mask_sources collective and the host recount run on the real
     backend

Run: python scripts/probe_r5_shard_chip.py   (one TPU process only)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("MERYL_TPU_PROBE_CPU"):  # CPU smoke of the probe itself
    jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh  # noqa: E402

from meryl_tpu import counter  # noqa: E402
from meryl_tpu.parallel import shard_count as sc  # noqa: E402

K = 21
ACGT = np.frombuffer(b"ACGT", np.uint8)


def make_fasta(td, name, seqs):
    p = os.path.join(td, name)
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")
    return p


def rand_seq(rng, n):
    b = ACGT[rng.integers(0, 4, n)]
    return b.tobytes().decode()


def run_single(fa):
    os.environ["MERYL_TPU_SHARDED"] = "0"
    try:
        return counter.count_to_arrays([fa], K)
    finally:
        os.environ["MERYL_TPU_SHARDED"] = "1"


def compare(tag, got, want):
    ghi, glo, gc = got
    whi, wlo, wc = want
    ok = (len(gc) == len(wc)
          and np.array_equal(ghi, whi) and np.array_equal(glo, wlo)
          and np.array_equal(np.asarray(gc, np.uint64),
                             np.asarray(wc, np.uint64)))
    print(f"[{tag}] uniques={len(gc)} single={len(wc)} "
          f"{'EXACT' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        sys.exit(f"{tag}: decode parity FAILED")


def main():
    print("backend:", jax.default_backend(),
          "devices:", jax.devices(), flush=True)
    os.environ["MERYL_TPU_SHARDED"] = "1"
    mesh = Mesh(np.array(jax.devices()), ("d",))
    rng = np.random.default_rng(11)

    with tempfile.TemporaryDirectory() as td:
        # -------- phase 1: base parity + step timing ------------------
        seqs = [rand_seq(rng, 1 << 20) + "N" + rand_seq(rng, 1 << 18)
                for _ in range(4)]
        fa = make_fasta(td, "base.fa", seqs)
        t0 = time.time()
        got = counter.count_to_arrays_sharded([fa], K,
                                              chunk_len=1 << 20,
                                              mesh=mesh)
        t1 = time.time()
        print(f"[base] sharded wall {t1 - t0:.1f}s (incl. compile), "
              f"stats={sc.LAST_SHARD_STATS}", flush=True)
        want = run_single(fa)
        compare("base", got, want)

        # warm re-run for a post-compile step rate
        t0 = time.time()
        got2 = counter.count_to_arrays_sharded([fa], K,
                                               chunk_len=1 << 20,
                                               mesh=mesh)
        t1 = time.time()
        nb = sum(len(s) for s in seqs)
        print(f"[base-warm] wall {t1 - t0:.2f}s "
              f"({nb / (t1 - t0) / 1e6:.1f} Mb/s incl. host scan)",
              flush=True)
        compare("base-warm", got2, want)

        # -------- phase 2: forced spill on the real backend -----------
        got3 = counter.count_to_arrays_sharded(
            [fa], K, chunk_len=1 << 20, mesh=mesh,
            acc_cap=2_000_000, spill_dir=os.path.join(td, "spill"))
        print(f"[spill] stats={sc.LAST_SHARD_STATS}", flush=True)
        if sc.LAST_SHARD_STATS.get("spills", 0) < 1:
            sys.exit("spill phase did not spill")
        compare("spill", got3, want)

        # -------- phase 3: adversarial skew (capture + mask) ----------
        adv = ["A" * 3000 + rand_seq(rng, 2000),
               rand_seq(rng, 4000) + "A" * 2500,
               rand_seq(rng, 6000)]
        fa2 = make_fasta(td, "adv.fa", adv)
        got4 = counter.count_to_arrays_sharded([fa2], K,
                                               chunk_len=1 << 13,
                                               mesh=mesh)
        st = dict(sc.LAST_SHARD_STATS)
        print(f"[adv] stats={st}", flush=True)
        if st.get("recount_chunks", 0) < 1 and \
           st.get("captured_windows", 0) < 1:
            sys.exit("adversarial phase exercised no hatch")
        want4 = run_single(fa2)
        compare("adv", got4, want4)

    print("ALL PHASES EXACT ON CHIP", flush=True)


if __name__ == "__main__":
    main()

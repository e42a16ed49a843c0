"""Rowlen rebalance sweep on the real chip.

The device counting rate rises as sort rows shrink (873 Mb/s @ 2^14,
1149 @ 2^11, 1366 @ 2^9 measured pre-u64-merge) while the host finish
merge pays for the larger fan-in; 2^11 was the measured balance point
BEFORE the u64-key tournament kernel made the merge 15-26% faster.
This sweep re-measures both sides end-to-end so the default
(counter._sort_rowlen / MERYL_TPU_ROWLEN) can be re-picked.

Run ON THE CHIP (one process, axon rules apply):
    python scripts/chip_sweep.py [total_bases_log2=26]

Prints one line per rowlen: device-only rate (bench instrument) and
end-to-end count_to_db wall rate on a synthetic FASTA.
"""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_fasta(total_bases: int) -> str:
    rng = np.random.default_rng(11)
    fd, path = tempfile.mkstemp(suffix=".fa")
    with os.fdopen(fd, "w") as f:
        read = 1 << 14
        for i in range(total_bases // read):
            codes = rng.integers(0, 4, size=read)
            f.write(f">r{i}\n")
            f.write("".join("ACTG"[c] for c in codes))
            f.write("\n")
    return path


def main():
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    total = 1 << log2
    fa = make_fasta(total)
    try:
        print(f"# sweep over {total} bases, file {fa}", flush=True)
        print("rowlen_log2\tdevice_bases_s\te2e_bases_s")
        for rl in (9, 10, 11, 12):
            env = dict(os.environ, MERYL_TPU_ROWLEN=str(1 << rl))
            # device-only: the bench instrument in a fresh process (one
            # TPU client at a time; sequential)
            r = subprocess.run([sys.executable, "bench.py"], env=env,
                               cwd=REPO, capture_output=True, text=True,
                               timeout=3600)
            dev = "ERR"
            lines = r.stdout.strip().splitlines()
            if r.returncode == 0 and lines:
                import json
                dev = json.loads(lines[-1])["value"]
            # end-to-end: CLI count into a DB (host merge included)
            with tempfile.TemporaryDirectory() as d:
                db = os.path.join(d, "out.meryldb")
                t0 = time.perf_counter()
                r2 = subprocess.run(
                    [sys.executable, "-m", "meryl_tpu", "count", "k=21",
                     fa, "output", db],
                    env=env, cwd=REPO, capture_output=True, text=True,
                    timeout=3600)
                dt = time.perf_counter() - t0
            e2e = total / dt if r2.returncode == 0 else "ERR"
            print(f"{rl}\t{dev}\t{e2e}", flush=True)
    finally:
        os.unlink(fa)


if __name__ == "__main__":
    main()

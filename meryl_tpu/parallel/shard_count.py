"""Multi-chip sharded k-mer counting: shard_map + ICI all-to-all.

The reference meryl's only distributed story is external sharding
(`segment=a/b`, /root/reference/src/meryl/merylCommandBuilder.C:313-315)
followed by a DB `union-sum` merge.  The TPU-native replacement is one
fused SPMD step over a device mesh:

  1. every device encodes + extracts canonical kmers from its own shard
     of the base stream (data parallelism over input),
  2. sorts + run-length-counts locally (dedup before the wire),
  3. shuffles unique (kmer, count) pairs to their *owner* device with an
     ICI all-to-all keyed on the kmer's top prefix bits — a widened
     version of the reference's 6-bit DB partition
     (documentation/source/reference.rst:71-81): ownership uses
     `prefix_bits` >= 6 bits so meshes larger than 64 devices map, while
     the on-disk 64-file layout stays at the edges, and
  4. merges the received sorted runs (sort + segment-sum).

Because local kmers are already sorted and the owner id is the top bits
of the kmer, step 3's send buffer is built with gathers — kmers are
already grouped by destination.

Capacity model: the all-to-all carries `pair_cap` slots per
(source, destination) pair.  Ownership boundaries are mass-balanced for
canonical kmers, so the expected per-pair load is ~uniques/n; the step
counts kmers that exceed pair_cap and the driver raises (no silent
drops).  When a device's accumulated unique set approaches `acc_cap`,
the accumulator is spilled to host RAM as a sorted run and reset (the
reference's out-of-core batch dump, merylOp-countThreads.C:311-380);
finalize() merges the spilled runs per owner.  The exact value
histogram is computed from the final merged counts — never from
per-step partials, which would reflect intermediate multiplicities.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kmer import num_planes
from ..ops import count as cnt
from ..ops import extract as ext

U32 = jnp.uint32
SENT = U32(0xFFFFFFFF)


def default_prefix_bits(n: int, k: int) -> int:
    """Ownership prefix width: >= log2(n) (so every device owns at
    least one prefix) plus headroom for mass balancing, capped by the
    kmer width."""
    need = max(6, (n - 1).bit_length() + 2 if n > 1 else 6)
    cap = min(16, 2 * k)
    bits = min(need, cap)
    if n > (1 << bits):
        raise ValueError(f"{n} devices need > {bits} ownership prefix "
                         f"bits (k={k} allows at most {cap})")
    return bits


def _prefix_top_bits(planes, k: int, bits: int):
    """Top `bits` bits of each 2k-bit kmer from its uint32 planes
    (bits <= 16, so the result fits one uint32)."""
    shift = 2 * k - bits
    out = jnp.zeros_like(planes[0])
    for p, pl in enumerate(planes):
        lo_bit = 32 * p
        if lo_bit + 32 <= shift:
            continue
        sh = shift - lo_bit
        if sh >= 0:
            if sh < 32:
                out = out | (pl >> U32(sh))
        else:
            out = out | (pl << U32(-sh))
    return out & U32((1 << bits) - 1)


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x


def owner_boundaries(n: int, mode: str, nprefix: int = 64) -> list:
    """Static prefix boundaries assigning `nprefix` prefixes to n owner
    devices with near-equal *expected canonical mass*.

    Canonical kmers are min(fmer, rmer) of two ~uniform values, so their
    prefix density is 2(1-x) on [0,1): the low half of prefix space holds
    ~75% of distinct canonical kmers (the reference's 64 DB files have
    the same skew — it tolerates it because files are just files; an
    all-to-all needs balanced capacities).  Equal-mass boundaries solve
    1-(1-x)^2 = i/n  =>  x_i = 1 - sqrt(1 - i/n).
    """
    if n > nprefix:
        raise ValueError(f"{n} devices > {nprefix} ownership prefixes")
    if mode != "canonical":
        bounds = [round(nprefix * i / n) for i in range(n + 1)]
    else:
        bounds = [round(nprefix * (1.0 - math.sqrt(1.0 - i / n)))
                  for i in range(n + 1)]
        bounds[n] = nprefix
    # force strictly increasing (n <= nprefix guaranteed above)
    for i in range(1, n + 1):
        if bounds[i] <= bounds[i - 1]:
            bounds[i] = bounds[i - 1] + 1
    for i in range(n - 1, -1, -1):
        if bounds[i] >= bounds[i + 1]:
            bounds[i] = bounds[i + 1] - 1
    assert bounds[0] == 0 and bounds[-1] == nprefix
    return bounds


def _owner_from_prefix(prefix, bounds) -> jnp.ndarray:
    """prefix (int32 array) -> owner id via static boundary comparisons."""
    owner = jnp.zeros_like(prefix)
    for b in bounds[1:-1]:
        owner = owner + (prefix >= jnp.int32(b)).astype(prefix.dtype)
    return owner


def make_sharded_count_step(mesh: Mesh, k: int, *, chunk_len: int,
                            mode: str = "canonical",
                            pair_cap: int | None = None,
                            prefix_bits: int | None = None):
    """Build the jitted SPMD counting step over `mesh` (axis 'd').

    Returns fn(codes) where codes is (n_dev * chunk_len,) uint8 sharded
    over 'd'.  Output per device (stacked on axis 0 in the global view):
      planes:    P arrays (n_dev, n_dev*pair_cap) uint32 — unique kmers
                 owned by that device, ascending, sentinel-padded
      counts:    (n_dev, n_dev*pair_cap) uint32
      n_unique:  (n_dev,) int32 — real entries per device
      overflow:  () int32 — total kmers dropped because a
                 (source, destination) pair exceeded pair_cap; any
                 nonzero value means the step's output is incomplete
                 and the caller must retry with a larger pair_cap
    """
    n = mesh.devices.size
    nplanes = num_planes(k)
    bits = prefix_bits if prefix_bits is not None else \
        default_prefix_bits(n, k)
    cap = pair_cap if pair_cap is not None else chunk_len
    out_cap = n * cap
    bounds = owner_boundaries(n, mode, 1 << bits)

    def step(codes):  # per-device view: (chunk_len,)
        codes = codes.reshape(chunk_len)
        planes, valid = ext.extract_kmers(codes, k, mode)
        cplanes, ccounts, _ = cnt.sort_count_compacted(planes, valid)

        # unique kmers are sorted, so owner groups are contiguous; the
        # send buffer is built with GATHERS (scatters serialize on TPU):
        # slot (o, j) of the send buffer takes the j-th kmer of owner
        # group o, i.e. source index group_start[o] + j
        is_real = ccounts > U32(0)
        owner = _owner_from_prefix(
            _prefix_top_bits(cplanes, k, bits).astype(jnp.int32), bounds)
        owner_oh = (owner[None, :] == jnp.arange(n, dtype=jnp.int32)[:, None])
        owner_ct = jnp.sum(owner_oh & is_real[None, :], axis=1)
        group_start = _exclusive_cumsum(owner_ct)
        dropped = jnp.sum(jnp.maximum(owner_ct - jnp.int32(cap), 0))

        j = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 1)
        o = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 0)
        src = group_start[o] + j
        slot_ok = j < owner_ct[o]
        send_planes = [
            jnp.where(slot_ok, jnp.take(p, src, mode="clip"), SENT)
            .reshape(n * cap)
            for p in cplanes
        ]
        send_counts = jnp.where(
            slot_ok, jnp.take(ccounts, src, mode="clip"), U32(0)
        ).reshape(n * cap)

        # ICI all-to-all: chunk i of the send buffer goes to device i
        recv_planes = [
            jax.lax.all_to_all(p, "d", split_axis=0, concat_axis=0,
                               tiled=True)
            for p in send_planes
        ]
        recv_counts = jax.lax.all_to_all(send_counts, "d",
                                         split_axis=0, concat_axis=0,
                                         tiled=True)

        # merge the n sorted runs we received (compacted output)
        oplanes, ocounts, n_unique = cnt.merge_counted(
            [p[:0] for p in recv_planes], recv_counts[:0],  # empty "a" side
            recv_planes, recv_counts)

        overflow = jax.lax.psum(dropped, "d")
        # replicated max so every HOST sees the same control values
        # (per-device outputs are not addressable across processes)
        n_max = jax.lax.pmax(n_unique, "d")

        return (tuple(p.reshape(1, out_cap) for p in oplanes),
                ocounts.reshape(1, out_cap), n_max, overflow)

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=P("d"),
        out_specs=(tuple(P("d", None) for _ in range(nplanes)),
                   P("d", None), P(), P()),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_merge(mesh: Mesh, nplanes: int, acc_cap: int):
    """Per-device merge of two sharded unique/count accumulations,
    truncated to the fixed accumulator capacity `acc_cap`.  The returned
    n_unique is the PRE-truncation run count: n_unique > acc_cap means
    entries were lost and the caller must spill more aggressively."""
    def merge(acc_planes, acc_counts, new_planes, new_counts):
        a = [p.reshape(p.shape[-1]) for p in acc_planes]
        b = [p.reshape(p.shape[-1]) for p in new_planes]
        ac = acc_counts.reshape(acc_counts.shape[-1])
        bc = new_counts.reshape(new_counts.shape[-1])
        mplanes, mcounts, n_unique = cnt.merge_counted(a, ac, b, bc)
        mplanes = [p[:acc_cap] for p in mplanes]
        mcounts = mcounts[:acc_cap]
        n_max = jax.lax.pmax(n_unique, "d")  # replicated (multihost-safe)
        return (tuple(p.reshape(1, acc_cap) for p in mplanes),
                mcounts.reshape(1, acc_cap), n_max)

    fn = jax.shard_map(
        merge, mesh=mesh,
        in_specs=(tuple(P("d", None) for _ in range(nplanes)), P("d", None),
                  tuple(P("d", None) for _ in range(nplanes)), P("d", None)),
        out_specs=(tuple(P("d", None) for _ in range(nplanes)),
                   P("d", None), P()),
        check_vma=False)
    return jax.jit(fn)


class ShardedCounter:
    """End-to-end multi-chip counting: feed (n_dev * chunk_len) base
    codes per step; every step counts, shuffles kmers to owner devices
    over ICI, and merges into each device's accumulated unique set.
    When an accumulator nears `acc_cap` it spills to host RAM (the
    reference's out-of-core batch dump, P5) and resets.  finalize()
    merges spills + accumulators per owner and returns globally sorted
    (hi, lo, counts) — owner prefix ranges ascend with device id, so
    per-device results concatenate in order.

    This replaces the reference's external count-shards-then-union-sum
    pattern (SURVEY.md P6) with one fused SPMD pass."""

    def __init__(self, mesh: Mesh, k: int, *, chunk_len: int,
                 mode: str = "canonical", pair_cap: int | None = None,
                 acc_cap: int | None = None,
                 prefix_bits: int | None = None,
                 send_cap: int | None = None,
                 spill_dir: str | None = None):
        self.mesh = mesh
        self.k = k
        self.n = mesh.devices.size
        self.chunk_len = chunk_len
        self.nplanes = num_planes(k)
        if pair_cap is None:
            pair_cap = send_cap  # back-compat alias
        if pair_cap is None:
            if self.n <= 4:
                pair_cap = chunk_len  # worst case, always safe
            else:
                # mass-balanced boundaries make the expected per-pair
                # load ~chunk_len/n; 4x headroom for composition skew
                pair_cap = min(chunk_len,
                               max(4096, -(-4 * chunk_len // self.n)))
        self.pair_cap = int(pair_cap)
        self._step = make_sharded_count_step(
            mesh, k, chunk_len=chunk_len, mode=mode,
            pair_cap=self.pair_cap, prefix_bits=prefix_bits)
        step_max = self.n * self.pair_cap  # per-device per-step maximum
        self.acc_cap = acc_cap if acc_cap is not None else 4 * step_max
        self._merge = make_sharded_merge(mesh, self.nplanes, self.acc_cap)
        self._acc = None
        self._acc_n = 0            # max per-device uniques in _acc
        self._acc_n_pending = None  # device scalar of the last merge
        self._pending = None        # last _step output, not yet merged
        # host (hi, lo, c) runs per ADDRESSABLE device row (multi-host:
        # each process only downloads its own devices' owner ranges).
        # With spill_dir set, runs go to .npz files instead of RAM (the
        # out-of-core analog of the reference's batch dumps) and
        # finalize_parts loads one device's runs at a time — host peak
        # drops from the whole merged set to ~1/n_local of it.
        self.spill_dir = spill_dir
        self._spill_seq = 0
        self._spills: dict = {}

    def _fresh_acc(self):
        zc = jnp.zeros((self.n, self.acc_cap), jnp.uint32)
        zp = tuple(jnp.full((self.n, self.acc_cap), 0xFFFFFFFF,
                            jnp.uint32) for _ in range(self.nplanes))
        return (zp, zc)

    @staticmethod
    def _local_rows(arr):
        """{device row -> (rows, cap) numpy data} for the process-local
        (addressable) shards of a P('d', None)-sharded array."""
        out = {}
        for sh in arr.addressable_shards:
            idx = sh.index[0]
            r = idx.start or 0
            out[r] = np.asarray(sh.data)[0]
        return out

    def _download_acc(self):
        """{row: (hi, lo, counts)} host runs for addressable devices."""
        from .. import kmer as km
        planes, counts = self._acc
        crows = self._local_rows(counts)
        prows = [self._local_rows(p) for p in planes]
        runs = {}
        for d, c in crows.items():
            keep = c > 0
            hi, lo = km.hilo_from_planes([pr[d][keep] for pr in prows])
            runs[d] = (hi, lo, c[keep].astype(np.uint64))
        return runs

    def spill(self) -> None:
        """Download every local device's accumulated run to host RAM
        and reset the accumulators (out-of-core batch dump)."""
        self._resolve_acc_n()
        if self._acc is None or self._acc_n == 0:
            return
        for d, run in self._download_acc().items():
            if len(run[2]):
                self._spills.setdefault(d, []).append(
                    self._store_run(d, run))
        self._acc = None
        self._acc_n = 0
        self._spill_seq += 1

    def _store_run(self, d: int, run):
        """RAM by default; an .npz path when spill_dir is set."""
        if self.spill_dir is None:
            return run
        import os
        os.makedirs(self.spill_dir, exist_ok=True)
        p = os.path.join(self.spill_dir,
                         f"spill_r{d}_s{self._spill_seq}.npz")
        np.savez(p, hi=run[0], lo=run[1], c=run[2])
        return p

    @staticmethod
    def _load_run(run):
        if not isinstance(run, str):
            return run
        z = np.load(run)
        return z["hi"], z["lo"], z["c"]

    def _resolve_acc_n(self) -> None:
        """Fetch the n_unique scalar of the last dispatched merge (it
        has had a full host iteration to complete) and validate it."""
        if self._acc_n_pending is None:
            return
        nmax = int(np.asarray(self._acc_n_pending))
        self._acc_n_pending = None
        self._acc_n = nmax
        if nmax > self.acc_cap:
            raise RuntimeError(
                f"ShardedCounter accumulator overflow: one step produced "
                f"{nmax} uniques > acc_cap={self.acc_cap}; raise acc_cap")

    def _drain_pending(self) -> None:
        """Resolve the previously dispatched step: check its overflow
        scalar, spill if the accumulator cannot absorb it, and dispatch
        (not await) its merge.  All scalars read here are replicated
        collectives (pmax), so every process takes identical spill/merge
        decisions — multi-host lockstep is preserved."""
        if self._pending is None:
            return
        planes, counts, step_n, overflow = self._pending
        self._pending = None
        self._resolve_acc_n()
        if int(np.asarray(overflow)) > 0:
            raise RuntimeError(
                f"ShardedCounter all-to-all overflow: "
                f"{int(np.asarray(overflow))} kmers exceeded pair_cap="
                f"{self.pair_cap}; raise pair_cap")
        step_max = int(np.asarray(step_n))  # replicated pmax scalar
        if self._acc is not None and self._acc_n + step_max > self.acc_cap:
            self.spill()  # make room before merging (no truncation)
        if self._acc is None:
            self._acc = self._fresh_acc()
        ap, ac, n_unique = self._merge(self._acc[0], self._acc[1],
                                       planes, counts)
        self._acc = (ap, ac)
        self._acc_n_pending = n_unique  # fetched next drain/spill

    def add_codes(self, codes) -> None:
        """codes: (n_dev * chunk_len,) uint8; device d's shard is an
        independent sequence window (callers insert separators).

        Pipelined 1 deep (the sharded analog of the single-stream
        host/device overlap): the previous step's scalars are resolved
        and its merge dispatched FIRST — by now the device has finished
        them, so the fetches don't stall — then this step is dispatched
        and the call returns while it runs.  Overflow errors therefore
        surface one call late (or at finalize), before any results."""
        self._drain_pending()
        self._pending = self._step(codes)

    def iter_finalized_parts(self):
        """Yield (device row, hi, lo, counts) for the process-local
        devices, ascending row; spilled runs and the live accumulator
        are union-sum merged per owner.  A GENERATOR so callers can
        stream owner ranges into a DB writer one device at a time —
        with spill_dir, host peak is one device's merged range, never
        the whole kmer set."""
        from ..counter import merge_runs
        if getattr(self, "_finalized", False):
            raise RuntimeError(
                "ShardedCounter already finalized: finalize()/"
                "finalize_parts()/iter_finalized_parts() consume the "
                "accumulator and may be called only once")
        self._finalized = True
        self._drain_pending()
        self._resolve_acc_n()
        acc_runs = {}
        if self._acc is not None and self._acc_n > 0:
            acc_runs = self._download_acc()
        self._acc = None  # the downloaded runs own the data now
        rows = sorted(set(self._spills) | set(acc_runs))
        for d in rows:
            runs = [self._load_run(r) for r in self._spills.get(d, [])]
            if d in acc_runs:
                runs.append(acc_runs.pop(d))
            hi, lo, c = merge_runs(runs)
            yield (d, hi, lo, c)

    def finalize_parts(self):
        """-> [(device row, hi, lo, counts)], materialized (see
        iter_finalized_parts for the streaming form)."""
        return list(self.iter_finalized_parts())

    def finalize(self):
        """-> (hi, lo, counts) numpy arrays, globally sorted unique
        (single-process meshes; multi-host assembly uses
        finalize_parts).  Owner prefix ranges ascend with device id, so
        per-device results concatenate in order.  Value histogram /
        statistics should be computed from these final counts (e.g. by
        MerylDB.write), never from per-step partials."""
        parts = self.finalize_parts()
        if not parts:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), np.zeros(0, np.uint32)
        return (np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
                np.concatenate([p[3] for p in parts]).astype(np.uint32))


def demo_codes(n_dev: int, chunk_len: int, seed: int = 7):
    """Deterministic synthetic base codes for dryruns/benches."""
    key = jax.random.PRNGKey(seed)
    return jax.random.randint(key, (n_dev * chunk_len,), 0, 4, jnp.uint8)

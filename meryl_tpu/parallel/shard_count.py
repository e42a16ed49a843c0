"""Multi-chip sharded k-mer counting: shard_map + ICI all-to-all.

The reference meryl's only distributed story is external sharding
(`segment=a/b`, /root/reference/src/meryl/merylCommandBuilder.C:313-315)
followed by a DB `union-sum` merge.  The TPU-native replacement is one
fused SPMD step over a device mesh:

  1. every device encodes + extracts canonical kmers from its own shard
     of the base stream (data parallelism over input),
  2. sorts + run-length-counts locally (dedup before the wire),
  3. shuffles unique (kmer, count) pairs to their *owner* device with an
     ICI all-to-all keyed on the kmer's 6-bit prefix — the same 64-way
     partition the reference uses for its DB files
     (documentation/source/reference.rst:71-81), so device d owns
     prefixes [d*64/n, (d+1)*64/n),
  4. merges the received sorted runs (sort + segment-sum), and
  5. psums the per-device value histograms so every chip ends with the
     global histogram.

Because local kmers are already sorted and the owner id is the top bits
of the kmer, step 3's send buffer is built with one scatter — kmers are
already grouped by destination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kmer import num_planes
from ..ops import count as cnt
from ..ops import extract as ext

U32 = jnp.uint32
SENT = U32(0xFFFFFFFF)


def _prefix6(planes, k: int):
    """Top 6 bits of each 2k-bit kmer from its uint32 planes."""
    P_ = len(planes)
    top_bit = 2 * k - 1                 # index of the kmer's MSB
    top_plane = top_bit // 32
    used = 2 * k - 32 * top_plane       # bits used in the top plane (1..32)
    if used >= 6:
        return (planes[top_plane] >> U32(used - 6)) & U32(63)
    # top plane holds < 6 bits: combine with the next plane down
    hi = planes[top_plane] & ((U32(1) << U32(used)) - U32(1))
    lo = planes[top_plane - 1] >> U32(32 - (6 - used))
    return ((hi << U32(6 - used)) | lo) & U32(63)


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x


def owner_boundaries(n: int, mode: str) -> list:
    """Static 6-bit-prefix boundaries assigning prefixes to n owner
    devices with near-equal *expected canonical mass*.

    Canonical kmers are min(fmer, rmer) of two ~uniform values, so their
    prefix density is 2(1-x) on [0,1): the low half of prefix space holds
    ~75% of distinct canonical kmers (the reference's 64 DB files have
    the same skew — it tolerates it because files are just files; an
    all-to-all needs balanced capacities).  Equal-mass boundaries solve
    1-(1-x)^2 = i/n  =>  x_i = 1 - sqrt(1 - i/n).
    """
    import math
    if mode != "canonical":
        bounds = [round(64 * i / n) for i in range(n + 1)]
    else:
        bounds = [round(64 * (1.0 - math.sqrt(1.0 - i / n))) for i in range(n + 1)]
        bounds[n] = 64
    # force strictly increasing (n <= 64 guaranteed by caller)
    for i in range(1, n + 1):
        if bounds[i] <= bounds[i - 1]:
            bounds[i] = bounds[i - 1] + 1
    for i in range(n - 1, -1, -1):
        if bounds[i] >= bounds[i + 1]:
            bounds[i] = bounds[i + 1] - 1
    assert bounds[0] == 0 and bounds[-1] == 64
    return bounds


def _owner_from_prefix(prefix, bounds) -> jnp.ndarray:
    """prefix (int32 array) -> owner id via static boundary comparisons."""
    owner = jnp.zeros_like(prefix)
    for b in bounds[1:-1]:
        owner = owner + (prefix >= jnp.int32(b)).astype(prefix.dtype)
    return owner


def make_sharded_count_step(mesh: Mesh, k: int, *, chunk_len: int,
                            mode: str = "canonical",
                            send_cap: int | None = None,
                            hist_bins: int = 1024):
    """Build the jitted SPMD counting step over `mesh` (axis 'd').

    Returns fn(codes) where codes is (n_dev * chunk_len,) uint8 sharded
    over 'd'.  Output per device (stacked on axis 0 in the global view):
      planes:  P arrays (n_dev, cap) uint32 — unique kmers owned by that
               device, ascending, sentinel-padded
      counts:  (n_dev, cap) uint32
      hist:    (hist_bins,) int64-ish histogram, replicated (psum'd)
    """
    n = mesh.devices.size
    if n > 64:
        raise ValueError("more than 64 devices needs a wider ownership prefix")
    nplanes = num_planes(k)
    local_cap = chunk_len  # worst case: every window unique
    cap = send_cap if send_cap is not None else local_cap
    out_cap = n * cap      # worst case: one device owns everything
    bounds = owner_boundaries(n, mode)

    def step(codes):  # per-device view: (chunk_len,)
        codes = codes.reshape(chunk_len)
        planes, valid = ext.extract_kmers(codes, k, mode)
        cplanes, ccounts, _ = cnt.sort_count_compacted(planes, valid)

        # unique kmers are sorted, so owner groups are contiguous; the
        # send buffer is built with GATHERS (scatters serialize on TPU):
        # slot (o, j) of the send buffer takes the j-th kmer of owner
        # group o, i.e. source index group_start[o] + j
        is_real = ccounts > U32(0)
        owner = _owner_from_prefix(_prefix6(cplanes, k).astype(jnp.int32),
                                   bounds)
        owner_oh = (owner[None, :] == jnp.arange(n, dtype=jnp.int32)[:, None])
        owner_ct = jnp.sum(owner_oh & is_real[None, :], axis=1)
        group_start = _exclusive_cumsum(owner_ct)

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
            jax.lax.all_to_all(p, "d", split_axis=0, concat_axis=0, tiled=True)
            for p in send_planes
        ]
        recv_counts = jax.lax.all_to_all(send_counts, "d",
                                         split_axis=0, concat_axis=0, tiled=True)

        # merge the n sorted runs we received (compacted output)
        oplanes, ocounts, _ = cnt.merge_counted(
            [p[:0] for p in recv_planes], recv_counts[:0],  # empty "a" side
            recv_planes, recv_counts)

        hist = cnt.value_histogram(ocounts, hist_bins)
        hist = jax.lax.psum(hist, "d")

        return (tuple(p.reshape(1, out_cap) for p in oplanes),
                ocounts.reshape(1, out_cap), hist)

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=P("d"),
        out_specs=(tuple(P("d", None) for _ in range(nplanes)),
                   P("d", None), P()),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_merge(mesh: Mesh, nplanes: int, acc_cap: int):
    """Per-device merge of two sharded unique/count accumulations,
    truncated to the fixed accumulator capacity `acc_cap` (overflow is
    detected by the caller via the returned n_unique)."""
    def merge(acc_planes, acc_counts, new_planes, new_counts):
        a = [p.reshape(p.shape[-1]) for p in acc_planes]
        b = [p.reshape(p.shape[-1]) for p in new_planes]
        ac = acc_counts.reshape(acc_counts.shape[-1])
        bc = new_counts.reshape(new_counts.shape[-1])
        mplanes, mcounts, n_unique = cnt.merge_counted(a, ac, b, bc)
        mplanes = [p[:acc_cap] for p in mplanes]
        mcounts = mcounts[:acc_cap]
        return (tuple(p.reshape(1, acc_cap) for p in mplanes),
                mcounts.reshape(1, acc_cap), n_unique.reshape(1))

    fn = jax.shard_map(
        merge, mesh=mesh,
        in_specs=(tuple(P("d", None) for _ in range(nplanes)), P("d", None),
                  tuple(P("d", None) for _ in range(nplanes)), P("d", None)),
        out_specs=(tuple(P("d", None) for _ in range(nplanes)),
                   P("d", None), P("d")),
        check_vma=False)
    return jax.jit(fn)


class ShardedCounter:
    """End-to-end multi-chip counting: feed (n_dev * chunk_len) base
    codes per step; every step counts, shuffles kmers to owner devices
    over ICI, and merges into each device's accumulated unique set.
    finalize() returns globally sorted (hi, lo, counts) — owner prefix
    ranges ascend with device id, so per-device results concatenate in
    order.

    This replaces the reference's external count-shards-then-union-sum
    pattern (SURVEY.md P6) with one fused SPMD pass."""

    def __init__(self, mesh: Mesh, k: int, *, chunk_len: int,
                 mode: str = "canonical", send_cap: int | None = None,
                 acc_cap: int | None = None, hist_bins: int = 1024):
        self.mesh = mesh
        self.k = k
        self.n = mesh.devices.size
        self.chunk_len = chunk_len
        self.nplanes = num_planes(k)
        self._step = make_sharded_count_step(
            mesh, k, chunk_len=chunk_len, mode=mode, send_cap=send_cap,
            hist_bins=hist_bins)
        cap = send_cap if send_cap is not None else chunk_len
        # HBM budget for each device's accumulated unique set
        self.acc_cap = acc_cap if acc_cap is not None else 4 * self.n * cap
        self._merge = make_sharded_merge(mesh, self.nplanes, self.acc_cap)
        self._acc = None
        self._hist = None

    def add_codes(self, codes) -> None:
        """codes: (n_dev * chunk_len,) uint8; device d's shard is an
        independent sequence window (callers insert separators)."""
        import numpy as np
        planes, counts, hist = self._step(codes)
        if self._acc is None:
            zc = jnp.zeros((self.n, self.acc_cap), jnp.uint32)
            zp = tuple(jnp.full((self.n, self.acc_cap), 0xFFFFFFFF,
                                jnp.uint32) for _ in range(self.nplanes))
            self._acc = (zp, zc)
            self._hist = jnp.zeros_like(hist)
        ap, ac, n_unique = self._merge(self._acc[0], self._acc[1],
                                       planes, counts)
        if int(np.max(np.asarray(n_unique))) >= self.acc_cap:
            raise RuntimeError(
                f"ShardedCounter accumulator overflow (acc_cap="
                f"{self.acc_cap}); raise acc_cap or spill more often")
        self._acc = (ap, ac)
        self._hist = self._hist + hist

    def finalize(self):
        """-> (hi, lo, counts) numpy arrays, globally sorted unique.
        (The accumulated histogram reflects per-step counts, not the
        final merged multiplicities; recompute from counts if needed.)"""
        import numpy as np
        from .. import kmer as km
        if self._acc is None:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), np.zeros(0, np.uint32)
        planes, counts = self._acc
        his, los, cs = [], [], []
        for d in range(self.n):
            c = np.asarray(counts[d])
            keep = c > 0
            hi, lo = km.hilo_from_planes(
                [np.asarray(p[d])[keep] for p in planes])
            his.append(hi)
            los.append(lo)
            cs.append(c[keep])
        return (np.concatenate(his), np.concatenate(los),
                np.concatenate(cs).astype(np.uint32))


def demo_codes(n_dev: int, chunk_len: int, seed: int = 7):
    """Deterministic synthetic base codes for dryruns/benches."""
    key = jax.random.PRNGKey(seed)
    return jax.random.randint(key, (n_dev * chunk_len,), 0, 4, jnp.uint8)

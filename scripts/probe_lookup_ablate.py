"""Ablate the routed-join lookup kernel stage by stage on chip.

Each variant runs the kernel prefix up to a stage and returns a
checksum; stage cost = difference of fetch-grounded times.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_lookup_ablate.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from meryl_tpu import kmer as km
from meryl_tpu import lookup as lk

U32 = jnp.uint32
K = 21
TRIALS = 2


def build():
    rng = np.random.default_rng(1)
    kmers = np.unique(rng.integers(0, 1 << 42, size=1 << 22,
                                   dtype=np.uint64))
    hi = np.zeros(len(kmers), np.uint64)
    counts = rng.integers(1, 100, size=len(kmers)).astype(np.uint32)

    class F:
        k = K

        def load_all(self):
            return hi, kmers, counts

    table = lk.ExactLookup(F())
    g = table._build_grouped()
    cfg = g["cfg"]
    R0, L0 = cfg[7], cfg[8]
    NQ = R0 * L0

    def mkq():
        q = np.concatenate([
            rng.choice(kmers, size=NQ // 2),
            rng.integers(0, 1 << 42, size=NQ - NQ // 2, dtype=np.uint64)])
        rng.shuffle(q)
        qp = km.planes_from_hilo(np.zeros(NQ, np.uint64), q, table.P)
        return ([jnp.asarray(p.reshape(R0, L0)) for p in qp],
                jnp.asarray(np.arange(NQ, dtype=np.uint32).reshape(R0, L0)))

    ins = [mkq() for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    return table, g, cfg, ins


@functools.partial(jax.jit, static_argnames=("cfg", "upto"))
def staged(gplanes, gvalues, q_planes, q_qidx, pad_key, pad_planes,
           cfg, upto):
    k, P, b, B, G, SUB, LDB, R0, L0, c = cfg
    D = B * c
    SENTQ = U32(0xFFFFFFFF)

    pref = lk._top_bits_planes(q_planes, k, b).astype(U32)
    if upto == 0:
        return jnp.sum(pref)
    srt = jax.lax.sort((pref,) + tuple(q_planes) + (q_qidx,),
                       num_keys=1, dimension=-1)
    pref1, planes1, qidx1 = srt[0], list(srt[1:1 + P]), srt[1 + P]
    if upto == 1:
        return pref1[0, 0] + qidx1[-1, -1]

    seg_start = jnp.concatenate(
        [jnp.ones((R0, 1), bool), pref1[:, 1:] != pref1[:, :-1]], axis=1)
    iot = jax.lax.broadcasted_iota(jnp.int32, (R0, L0), 1)
    seg_base = jax.lax.cummax(jnp.where(seg_start, iot, -1), axis=1)
    kept_q = (iot - seg_base) < c
    if upto == 2:
        return jnp.sum(kept_q.astype(jnp.int32)).astype(U32)

    iob = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    oh = (pref1.astype(jnp.int32)[:, :, None] == iob[None, :, :]
          ).astype(jnp.int8)
    ones = jnp.ones((1, L0), jnp.int8)
    n_bucket = jax.lax.dot_general(
        jnp.broadcast_to(ones, (R0, 1, L0)).astype(jnp.int8), oh,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).reshape(R0, B)
    if upto == 3:
        return jnp.sum(n_bucket).astype(U32)

    pad_rank = jax.lax.broadcasted_iota(jnp.int32, (B, c), 1).reshape(D)
    n_slot = jnp.repeat(n_bucket, c, axis=1)
    kept_p = pad_rank[None, :] >= jnp.minimum(n_slot, c)
    key2 = jnp.concatenate(
        [jnp.where(kept_q, pref1, SENTQ),
         jnp.where(kept_p, jnp.broadcast_to(pad_key, (R0, D)), SENTQ)],
        axis=1)
    planes2 = [jnp.concatenate(
        [planes1[p], jnp.broadcast_to(pad_planes[p], (R0, D))], axis=1)
        for p in range(P)]
    qidx2 = jnp.concatenate(
        [qidx1, jnp.full((R0, D), SENTQ, U32)], axis=1)
    srt2 = jax.lax.sort((key2,) + tuple(planes2) + (qidx2,),
                        num_keys=1, dimension=-1, is_stable=True)
    cells_planes = [s[:, :D] for s in srt2[1:1 + P]]
    cells_qidx = srt2[1 + P][:, :D]
    if upto == 4:
        return cells_planes[0][0, 0] + cells_qidx[-1, -1]

    CQ = SUB * c * R0
    cells_planes = [p.T.reshape(G, CQ) for p in cells_planes]
    cells_qidx = cells_qidx.T.reshape(G, CQ)
    db_kind = jnp.where(gvalues > U32(0), U32(0), U32(3))
    q_kind = jnp.where(cells_qidx != SENTQ, U32(1), U32(3))
    kind = jnp.concatenate([db_kind, q_kind], axis=1)
    jplanes = [jnp.concatenate([gplanes[p], cells_planes[p]], axis=1)
               for p in range(P)]
    jval = jnp.concatenate([gvalues, jnp.zeros((G, CQ), U32)], axis=1)
    jqidx = jnp.concatenate(
        [jnp.full((G, LDB), SENTQ, U32), cells_qidx], axis=1)
    keys = tuple(jplanes[p] for p in range(P - 1, -1, -1)) + (kind,)
    srt3 = jax.lax.sort(keys + (jval, jqidx), num_keys=P + 1,
                        dimension=-1)
    if upto == 5:
        return srt3[0][0, 0] + srt3[P + 2][-1, -1]
    return jnp.sum(srt3[P + 1])


def main():
    table, g, cfg, ins = build()
    print("cfg", cfg, flush=True)
    names = ["pref", "+sort1", "+rank", "+hist", "+sort2", "+joinsort"]
    prev = 0.0
    for upto in range(6):
        f = lambda i: staged(g["gplanes"], g["gvalues"], ins[i][0],
                             ins[i][1], g["pad_key"], g["pad_planes"],
                             cfg, upto)
        int(f(0))  # compile
        ts = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            int(f(1 + t))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{names[upto]:10s} total {dt*1e3:7.1f} ms  "
              f"stage {+(dt-prev)*1e3:7.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

"""Collocation mining (pointwise mutual information) over ``documents``.

PMI-ranked bigrams are the classic collocation signal (Church & Hanks 1990)
and a standard corpus-exploration step when curating training data (e.g.
spotting boilerplate phrases that survive dedup).  For adjacent-token pairs:

    PMI(w1, w2) = ln( c(w1,w2) * T / (c(w1,*) * c(*,w2)) )

with T the total bigram count and the marginals summed over the *pair*
table (the standard contingency-table formulation, so everything derives
from one distinct-bigram count table).

Scale shape — three bucketed shuffles over the DISTINCT-BIGRAM table (the
corpus itself is touched once):

1. one corpus pass explodes per-batch combined (w1, w2, count) rows keyed
   by ``crc32(w1 \\x1f w2) % B`` — every occurrence of a bigram type lands
   in one bucket, so the bucket emits its exact global count;
2. the pair table re-keys by ``crc32(w1)``: the bucket owns every pair of
   its left tokens, computes c(w1,*) with one dictionary-encode + reduceat
   and attaches it to each pair row (a co-located marginal, not a join);
3. same by ``crc32(w2)`` for c(*,w2); T is one Sum aggregate.

The per-pair score is quantized ONCE to ``round_even(ln(x) * 2^40)`` int64
(the ``lm.py`` contract: DuckDB ``ln`` == numpy ``log`` — same libm — and
the power-of-two scale gives an identical grid), so ordering and the
top-k cut are exact integer comparisons, bit-identical to the SQL twin.
``c12 * T`` and ``c1 * c2`` stay in int64: both are ≤ T², safe while the
corpus holds under ~3×10^9 bigram occurrences per int64; past that the
kernel promotes to float64 BEFORE the product (one rounding step, applied
identically in the twin) — the gate corpora are far inside the exact
regime.  Final top-k: per-block prune to k (only a block-local top-k row
can reach the global top-k) → tiny sort + limit.  Ties are impossible to
misorder: (pmi_q DESC, w1, w2) is a total order.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import sf_table
from .lm import LM_Q
from .textstats import _token_occurrences

PMI_MIN_COUNT = 3  # ignore rare pairs (standard collocation practice)
PMI_TOP_K = 50


def _marginal_attach(pairs: rd.Dataset, side: str, out: str, *, num_buckets: int) -> rd.Dataset:
    """Attach the ``side`` (w1 or w2) marginal sum to every pair row via a
    token-keyed bucket shuffle (no join infrastructure: the bucket owns
    every pair of its tokens, so one reduceat computes the marginal)."""

    def key(batch: pa.Table) -> pa.Table:
        dic = pc.dictionary_encode(batch.column(side).combine_chunks())
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(dic.dictionary),
        )
        bkt = crc[np.asarray(dic.indices, dtype=np.int64)] if len(batch) else np.empty(0, np.int64)
        return batch.append_column("_mbkt", pa.array(bkt))

    def attach(group: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(group.column(side).combine_chunks())
        idx = np.asarray(enc.indices, dtype=np.int64)
        c12 = group.column("c12").combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(tot, idx, c12)
        return group.drop_columns(["_mbkt"]).append_column(out, pa.array(tot[idx]))

    return (
        pairs.map_batches(key, batch_format="pyarrow")
        .groupby("_mbkt")
        .map_groups(attach, batch_format="pyarrow")
    )


def pmi_collocations(
    sf_dir: str,
    *,
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_TOP_K,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Top-k adjacent-token collocations by quantized PMI.

    Returns (w1, w2, c12, pmi_q, pmi) — ``pmi_q`` the exact 2^-40-quantized
    integer score (the ordering key), ``pmi`` its rounded float surface —
    ordered by (pmi_q DESC, w1, w2), limited to ``k``.
    """
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_pairs(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "pbkt": pa.array([], pa.int64()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c12": pa.array([], pa.int64()),
            }
        )
        if len(rows) < 2:
            return empty
        adj = rows[1:] == rows[:-1]  # adjacent occurrences within one doc
        if not adj.any():
            return empty
        w1c = codes[:-1][adj]
        w2c = codes[1:][adj]
        nd = len(dic)
        ukey, cnt = np.unique(w1c * nd + w2c, return_counts=True)
        uw1 = (ukey // nd).astype(np.int64)
        uw2 = (ukey % nd).astype(np.int64)
        toks = dic.to_pylist()
        bkt = np.fromiter(
            (
                zlib.crc32(f"{toks[a]}\x1f{toks[b]}".encode()) % num_buckets
                for a, b in zip(uw1, uw2)
            ),
            dtype=np.int64,
            count=len(ukey),
        )
        return pa.table(
            {
                "pbkt": pa.array(bkt),
                "w1": pc.take(dic, pa.array(uw1)),
                "w2": pc.take(dic, pa.array(uw2)),
                "c12": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        # exact global count per distinct (w1, w2) of the bucket
        w1e = pc.dictionary_encode(group.column("w1").combine_chunks())
        w2e = pc.dictionary_encode(group.column("w2").combine_chunks())
        i1 = np.asarray(w1e.indices, dtype=np.int64)
        i2 = np.asarray(w2e.indices, dtype=np.int64)
        c = group.column("c12").combine_chunks().to_numpy(zero_copy_only=False)
        n2 = max(len(w2e.dictionary), 1)
        key = i1 * n2 + i2
        order = np.argsort(key, kind="stable")
        sk = key[order]
        new = np.concatenate([[True], sk[1:] != sk[:-1]]) if len(sk) else np.array([], bool)
        starts = np.nonzero(new)[0]
        tot = np.add.reduceat(c[order], starts) if len(starts) else c
        return pa.table(
            {
                "w1": pc.take(w1e.dictionary, pa.array((sk[starts] // n2).astype(np.int64))),
                "w2": pc.take(w2e.dictionary, pa.array((sk[starts] % n2).astype(np.int64))),
                "c12": pa.array(tot),
            }
        )

    pairs = (
        ds.map_batches(explode_pairs, batch_format="pyarrow", batch_size=4096)
        .groupby("pbkt")
        .map_groups(bucket_counts, batch_format="pyarrow")
        .materialize()  # distinct-bigram-sized; consumed by T and the scoring pass
    )
    agg = pairs.aggregate(Sum("c12", alias_name="t"))
    total = int((agg or {}).get("t") or 0)

    scored_src = _marginal_attach(
        _marginal_attach(pairs, "w1", "c1", num_buckets=num_buckets),
        "w2",
        "c2",
        num_buckets=num_buckets,
    )

    def score_and_prune(batch: pa.Table) -> pa.Table:
        c12 = batch.column("c12").combine_chunks().to_numpy(zero_copy_only=False)
        keep = c12 >= min_count
        if not keep.any():
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c12": pa.array([], pa.int64()),
                    "pmi_q": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        sub = batch.filter(pa.array(keep))
        c12 = c12[keep]
        c1 = sub.column("c1").combine_chunks().to_numpy(zero_copy_only=False)
        c2 = sub.column("c2").combine_chunks().to_numpy(zero_copy_only=False)
        # (c12*T)::DOUBLE / (c1*c2)::DOUBLE — exact int64 products, one
        # divide, one ln, the SAME association as the SQL twin
        q = np.round(
            np.log((c12 * total).astype(np.float64) / (c1 * c2).astype(np.float64)) * LM_Q
        ).astype(np.int64)
        out = pa.table(
            {
                "w1": sub.column("w1"),
                "w2": sub.column("w2"),
                "c12": pa.array(c12),
                "pmi_q": pa.array(q),
                "pmi": pa.array([round(float(v) / LM_Q, 6) for v in q], pa.float64()),
            }
        )
        if len(out) > k:  # block-local prune: only a local top-k row can win
            w1 = np.asarray(sub.column("w1").combine_chunks(), dtype=object)
            w2 = np.asarray(sub.column("w2").combine_chunks(), dtype=object)
            order = np.lexsort((w2, w1, -q))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    return (
        scored_src.map_batches(score_and_prune, batch_format="pyarrow")
        .sort(["pmi_q", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )

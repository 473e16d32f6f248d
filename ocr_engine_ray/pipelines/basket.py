"""Market-basket co-occurrence mining over the ``lineitem`` table.

Frequent-pair counting (the support-counting core of Apriori, Agrawal &
Srikant 1994) is the classic transaction-mining operator: which parts are
bought together in one order, with what support.  The pair count follows
the self-join convention — every (row, row) pair of the same order with
``p1 < p2`` counts once, so a part appearing twice in an order doubles its
pairs' weight — which keeps the DuckDB twin a literal self-join.

Scale shape — two bucketed shuffles, NO self-join materialization:

1. lineitem rows bucket by ``orderkey % B``: all items of an order land in
   one bucket, so the bucket forms each order's pairs locally.  Pair
   fan-out is bounded by order size m (m·(m−1)/2, m ≤ a handful in any
   sane transaction log); pathological giant baskets would be capped and
   logged like the dedup buckets.  The kernel vectorizes by ORDER SIZE
   CLASS: all orders with m distinct parts gather into one (n, m) matrix
   and one ``triu_indices`` expansion — no per-order Python loop.
   In-bucket pair counts pre-combine before the exchange;
2. pair rows bucket by ``hash(p1, p2) % B`` for exact global counts, the
   min-support filter, and a block-local top-k prune (only a block-local
   top-k row can reach the global top-k) → k-row sort.

Ties cannot misorder: (n DESC, p1, p2) is a total order on both sides,
and every value is an exact int64 count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.tables import sf_table

BASKET_MIN_SUPPORT = 2
BASKET_TOP_K = 50


def copurchase_pairs(
    sf_dir: str,
    *,
    min_support: int = BASKET_MIN_SUPPORT,
    k: int = BASKET_TOP_K,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Top-k co-purchased part pairs by support.

    Returns (p1, p2, n) with ``p1 < p2``, ordered by (n DESC, p1, p2),
    limited to ``k``; ``n`` counts lineitem-row pairs per order (the
    self-join convention).
    """
    li = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "obkt": pa.array((ok % num_buckets).astype(np.int64)),
                "okey": pa.array(ok.astype(np.int64)),
                "part": batch.column("l_partkey").cast(pa.int64()),
            }
        )

    def order_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pbkt": pa.array([], pa.int64()),
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        ok = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        pt = group.column("part").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(ok):
            return empty
        # distinct (order, part) with row multiplicities, sorted — parts
        # ascend within each order, so p1 < p2 falls out of triu order
        maxp = int(pt.max()) + 1
        comb, cnt = np.unique(ok * maxp + pt, return_counts=True)
        d_ok = comb // maxp
        d_pt = comb % maxp
        orders, m = np.unique(d_ok, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        p1_all, p2_all, w_all = [], [], []
        for msize in np.unique(m):
            if msize < 2:
                continue
            sel = np.nonzero(m == msize)[0]
            idx = starts[sel][:, None] + np.arange(msize)[None, :]
            parts_m = d_pt[idx]  # (n_orders, msize), ascending per row
            cnt_m = cnt[idx]
            iu, ju = np.triu_indices(int(msize), 1)
            p1_all.append(parts_m[:, iu].ravel())
            p2_all.append(parts_m[:, ju].ravel())
            w_all.append((cnt_m[:, iu] * cnt_m[:, ju]).ravel())
        if not p1_all:
            return empty
        p1 = np.concatenate(p1_all)
        p2 = np.concatenate(p2_all)
        w = np.concatenate(w_all).astype(np.int64)
        # pre-combine per (p1, p2) before the pair shuffle
        pk = p1 * maxp + p2
        upk, inv = np.unique(pk, return_inverse=True)
        tot = np.zeros(len(upk), dtype=np.int64)
        np.add.at(tot, inv, w)
        up1 = (upk // maxp).astype(np.int64)
        up2 = (upk % maxp).astype(np.int64)
        pbkt = ((up1 * np.int64(1_000_003) + up2) % num_buckets).astype(np.int64)
        return pa.table(
            {
                "pbkt": pa.array(pbkt),
                "p1": pa.array(up1),
                "p2": pa.array(up2),
                "n": pa.array(tot),
            }
        )

    def global_counts(group: pa.Table) -> pa.Table:
        p1 = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        p2 = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(p1):
            return empty
        maxp = int(max(p1.max(), p2.max())) + 1
        upk, inv = np.unique(p1 * maxp + p2, return_inverse=True)
        tot = np.zeros(len(upk), dtype=np.int64)
        np.add.at(tot, inv, n)
        keep = tot >= min_support
        if not keep.any():
            return empty
        up1 = (upk // maxp)[keep]
        up2 = (upk % maxp)[keep]
        tot = tot[keep]
        if len(tot) > k:  # block-local prune
            order = np.lexsort((up2, up1, -tot))[:k]
            up1, up2, tot = up1[order], up2[order], tot[order]
        return pa.table({"p1": pa.array(up1), "p2": pa.array(up2), "n": pa.array(tot)})

    return (
        li.map_batches(bucket, batch_format="pyarrow")
        .groupby("obkt")
        .map_groups(order_pairs, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(global_counts, batch_format="pyarrow")
        .sort(["n", "p1", "p2"], descending=[True, False, False])
        .limit(k)
    )

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


def _bucket_rows(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    ok = batch.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "obkt": pa.array((ok % num_buckets).astype(np.int64)),
            "okey": pa.array(ok.astype(np.int64)),
            "part": batch.column("l_partkey").cast(pa.int64()),
        }
    )

def _order_pair_partials(group: pa.Table, *, num_buckets: int) -> pa.Table:
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


def _pair_partials(sf_dir: str, *, num_buckets: int) -> rd.Dataset:
    """Per-order pair partials of the co-purchase graph: the shared first
    two stages (order-bucket shuffle + size-class pair expansion) of
    `copurchase_pairs` and `triangle_count`."""
    import functools

    li = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return (
        li.map_batches(
            functools.partial(_bucket_rows, num_buckets=num_buckets),
            batch_format="pyarrow",
        )
        .groupby("obkt")
        .map_groups(
            functools.partial(_order_pair_partials, num_buckets=num_buckets),
            batch_format="pyarrow",
        )
    )


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
    pairs = _pair_partials(sf_dir, num_buckets=num_buckets)

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
        pairs.groupby("pbkt")
        .map_groups(global_counts, batch_format="pyarrow")
        .sort(["n", "p1", "p2"], descending=[True, False, False])
        .limit(k)
    )


def _support_filter(group: pa.Table, *, min_support: int) -> pa.Table:
    """Fold one pair-bucket's partials to its distinct supported edges."""
    p1 = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
    p2 = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
    n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"p1": pa.array([], pa.int64()), "p2": pa.array([], pa.int64())}
    )
    if not len(p1):
        return empty
    maxp = int(max(p1.max(), p2.max())) + 1
    upk, inv = np.unique(p1 * maxp + p2, return_inverse=True)
    tot = np.zeros(len(upk), dtype=np.int64)
    np.add.at(tot, inv, n)
    keep = tot >= min_support
    return pa.table(
        {
            "p1": pa.array((upk // maxp)[keep]),
            "p2": pa.array((upk % maxp)[keep]),
        }
    )


def copurchase_edges(
    sf_dir: str, *, min_support: int = BASKET_MIN_SUPPORT, num_buckets: int = 64
) -> rd.Dataset:
    """The MATERIALIZED co-purchase edge list (p1 < p2, support ≥
    ``min_support``): the shared `_pair_partials` stages + one pair-bucket
    support fold — the edge input of `triangle_count` and
    `graph.kcore_members` (a pair lands wholly in its bucket, so bucket
    folds are exact).

    The survivor set is compacted to 8 blocks before materializing (the
    connected-components compaction rule): the fold leaves ``num_buckets``
    near-empty blocks, and every downstream graph query pays per-block
    fixed costs in EACH of its all-to-all exchanges — at web scale the
    edge list is large and blocks stay full, so the repartition is a
    no-op-sized cheap pass there too."""
    import functools

    pairs = _pair_partials(sf_dir, num_buckets=num_buckets)
    return (
        pairs.groupby("pbkt")
        .map_groups(
            functools.partial(_support_filter, min_support=min_support),
            batch_format="pyarrow",
        )
        .repartition(8)
        .materialize()
    )


RULES_MIN_SUPPORT = 2
RULES_TOP_K = 100
_PPM = 1_000_000


def _distinct_rule_partials(group: pa.Table, *, num_buckets: int) -> pa.Table:
    """One order bucket → tagged partial stream on SET semantics
    (distinct presence per order, the textbook Apriori convention —
    deliberately different from `copurchase_pairs`' row-pair convention):

    kind 0: (bkt=hash(p1,p2)%B, a=p1, b=p2, n=pair-order count partial)
    kind 1: (bkt=p%B,           a=p,  b=0,  n=item-order count partial)
    kind 2: (bkt=0,             a=0,  b=0,  n=distinct orders here)

    Exact because an order lives wholly in its bucket.
    """
    empty = pa.table(
        {
            "kind": pa.array([], pa.int64()),
            "bkt": pa.array([], pa.int64()),
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    ok = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
    pt = group.column("part").combine_chunks().to_numpy(zero_copy_only=False)
    if not len(ok):
        return empty
    maxp = int(pt.max()) + 1
    comb = np.unique(ok * maxp + pt)  # distinct (order, part)
    d_ok = comb // maxp
    d_pt = comb % maxp
    orders, m = np.unique(d_ok, return_counts=True)
    # item partials: per-part count of orders containing it (distinct!)
    items, item_n = np.unique(d_pt, return_counts=True)
    kinds = [np.ones(len(items), dtype=np.int64)]
    bkts = [(items % num_buckets).astype(np.int64)]
    a_out = [items.astype(np.int64)]
    b_out = [np.zeros(len(items), dtype=np.int64)]
    n_out = [item_n.astype(np.int64)]
    # order-count partial
    kinds.append(np.array([2], dtype=np.int64))
    bkts.append(np.array([0], dtype=np.int64))
    a_out.append(np.array([0], dtype=np.int64))
    b_out.append(np.array([0], dtype=np.int64))
    n_out.append(np.array([len(orders)], dtype=np.int64))
    # pair partials by order-size class (the `_order_pair_partials` shape,
    # weight 1 per order — set semantics)
    starts = np.concatenate([[0], np.cumsum(m)[:-1]])
    p1_all, p2_all = [], []
    for msize in np.unique(m):
        if msize < 2:
            continue
        sel = np.nonzero(m == msize)[0]
        idx = starts[sel][:, None] + np.arange(msize)[None, :]
        parts_m = d_pt[idx]  # ascending per row
        iu, ju = np.triu_indices(int(msize), 1)
        p1_all.append(parts_m[:, iu].ravel())
        p2_all.append(parts_m[:, ju].ravel())
    if p1_all:
        p1 = np.concatenate(p1_all)
        p2 = np.concatenate(p2_all)
        pk = p1 * maxp + p2
        upk, cnt = np.unique(pk, return_counts=True)
        up1 = (upk // maxp).astype(np.int64)
        up2 = (upk % maxp).astype(np.int64)
        kinds.append(np.zeros(len(upk), dtype=np.int64))
        bkts.append(((up1 * np.int64(1_000_003) + up2) % num_buckets).astype(np.int64))
        a_out.append(up1)
        b_out.append(up2)
        n_out.append(cnt.astype(np.int64))
    return pa.table(
        {
            "kind": pa.array(np.concatenate(kinds)),
            "bkt": pa.array(np.concatenate(bkts)),
            "a": pa.array(np.concatenate(a_out)),
            "b": pa.array(np.concatenate(b_out)),
            "n": pa.array(np.concatenate(n_out)),
        }
    )


def association_rules(
    sf_dir: str,
    *,
    min_support: int = RULES_MIN_SUPPORT,
    k: int = RULES_TOP_K,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Association rules from co-purchase pairs (Agrawal & Srikant 1994):
    both directions of every pair with order-set support ≥ ``min_support``,
    scored by confidence and lift on the exact integer ppm grid —

        conf_ppm = ⌊pair_n · 10⁶ / ante_n⌋
        lift_ppm = ⌊pair_n · N · 10⁶ / (ante_n · cons_n)⌋

    with arbitrary-precision integer quotients (HUGEINT in the twin), so
    no float touches the score.  Returns
    (antecedent, consequent, pair_n, ante_n, cons_n, conf_ppm, lift_ppm)
    ordered by (conf_ppm DESC, antecedent, consequent) — a total order,
    (antecedent, consequent) being unique — limited to ``k``.

    Scale shape: ONE order-bucket shuffle emits a tagged pre-combined
    partial stream (pair / item / order-count rows — distinct-set
    semantics fall out per bucket because an order lives wholly in its
    bucket); the partial stream (≈ distinct pairs + parts, far below the
    corpus) is materialized once and consumed twice: item supports fold to
    a PART-DIMENSION-BOUNDED table broadcast via ``ray.put`` (the classic
    small-side rule), pair counts fold per pair bucket, score against the
    broadcast supports, and prune block-local top-k before the k-row sort.
    """
    import functools

    import ray

    li = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    partials = (
        li.map_batches(
            functools.partial(_bucket_rows, num_buckets=num_buckets),
            batch_format="pyarrow",
        )
        .groupby("obkt")
        .map_groups(
            functools.partial(_distinct_rule_partials, num_buckets=num_buckets),
            batch_format="pyarrow",
        )
        .materialize()  # ≈ distinct pairs, not the corpus
    )

    def fold_items(group: pa.Table) -> pa.Table:
        mask = pa.compute.equal(group.column("kind"), 1)
        g = group.filter(mask)
        p = g.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        n = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(p):
            return pa.table(
                {"p": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        up, inv = np.unique(p, return_inverse=True)
        tot = np.zeros(len(up), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"p": pa.array(up), "n": pa.array(tot)})

    item_rows = (
        partials.groupby("bkt").map_groups(fold_items, batch_format="pyarrow").take_all()
    )  # part-dimension-bounded
    support = {int(r["p"]): int(r["n"]) for r in item_rows}
    n_orders = sum(
        int(r["n"]) for r in partials.filter(expr="kind == 2").take_all()
    )
    support_ref = ray.put(support)

    def score_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "antecedent": pa.array([], pa.int64()),
                "consequent": pa.array([], pa.int64()),
                "pair_n": pa.array([], pa.int64()),
                "ante_n": pa.array([], pa.int64()),
                "cons_n": pa.array([], pa.int64()),
                "conf_ppm": pa.array([], pa.int64()),
                "lift_ppm": pa.array([], pa.int64()),
            }
        )
        mask = pa.compute.equal(group.column("kind"), 0)
        g = group.filter(mask)
        p1 = g.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        p2 = g.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        n = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(p1):
            return empty
        maxp = int(p2.max()) + 1
        upk, inv = np.unique(p1 * maxp + p2, return_inverse=True)
        tot = np.zeros(len(upk), dtype=np.int64)
        np.add.at(tot, inv, n)
        keep = tot >= min_support
        if not keep.any():
            return empty
        up1 = (upk // maxp)[keep]
        up2 = (upk % maxp)[keep]
        tot = tot[keep]
        sup = ray.get(support_ref)
        rows: list[tuple[int, int, int, int, int, int, int]] = []
        # surviving pairs per bucket are few past the support cut; the ppm
        # quotients use Python ints so pair_n·N·10⁶ never overflows
        for a, c, pn in zip(up1.tolist(), up2.tolist(), tot.tolist()):
            an, cn = sup[a], sup[c]
            for ante, cons, ante_n, cons_n in ((a, c, an, cn), (c, a, cn, an)):
                conf = pn * _PPM // ante_n
                lift = pn * n_orders * _PPM // (ante_n * cons_n)
                rows.append((ante, cons, pn, ante_n, cons_n, conf, lift))
        rows.sort(key=lambda r: (-r[5], r[0], r[1]))
        rows = rows[:k]  # block-local prune: only a local top-k row can win
        cols = list(zip(*rows))
        return pa.table(
            {
                "antecedent": pa.array(cols[0], pa.int64()),
                "consequent": pa.array(cols[1], pa.int64()),
                "pair_n": pa.array(cols[2], pa.int64()),
                "ante_n": pa.array(cols[3], pa.int64()),
                "cons_n": pa.array(cols[4], pa.int64()),
                "conf_ppm": pa.array(cols[5], pa.int64()),
                "lift_ppm": pa.array(cols[6], pa.int64()),
            }
        )

    return (
        partials.groupby("bkt")
        .map_groups(score_pairs, batch_format="pyarrow")
        .sort(
            ["conf_ppm", "antecedent", "consequent"],
            descending=[True, False, False],
        )
        .limit(k)
    )


def triangle_count(
    sf_dir: str, *, min_support: int = BASKET_MIN_SUPPORT, num_buckets: int = 64
) -> pa.Table:
    """Exact triangle count of the co-purchase graph (edges = part pairs
    with support >= ``min_support``) — the graph-density / community-
    structure metric next to `trade_pagerank` and the dedup CC: triangles
    drive clustering coefficients and motif-based anomaly detection.

    Node-iterator algorithm (the MapReduce standard, Suri & Vassilvitskii
    2011), oriented so each triangle a<b<c is found exactly once:

    1. edges fold from the shared `_pair_partials` stages + support filter
       (ONE exact pair-bucket shuffle);
    2. wedges: edges bucket by their LOW endpoint; per bucket every vertex
       ``a`` emits its higher-neighbor pairs (b, c), b<c — vectorized by
       DEGREE-SIZE CLASS (the `_order_pair_partials` triu expansion shape);
       wedge volume is Σ C(d⁺,2), the thinned graph's bound;
    3. wedges and edges co-bucket by hash(b, c); each bucket counts wedges
       whose closing edge exists (one np.isin on packed keys).

    Returns one row: (n_edges, n_wedges, n_triangles) — all exact int64.
    """
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )
    n_edges = edges.count()

    _PRIME = np.int64(1_000_003)

    def edge_side(batch: pa.Table) -> pa.Table:
        b = batch.column("p1").to_numpy(zero_copy_only=False)
        c = batch.column("p2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "wbkt": pa.array(((b * _PRIME + c) % num_buckets).astype(np.int64)),
                "b": pa.array(b),
                "c": pa.array(c),
                "is_edge": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )

    def abucket(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        return batch.append_column("abkt", pa.array((a % num_buckets).astype(np.int64)))

    def wedges_of(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wbkt": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.int64()),
            }
        )
        a = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        nb = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(a):
            return empty
        order = np.lexsort((nb, a))
        a, nb = a[order], nb[order]
        verts, deg = np.unique(a, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        b_all, c_all = [], []
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = np.nonzero(deg == d)[0]
            idx = starts[sel][:, None] + np.arange(d)[None, :]
            nbr = nb[idx]  # (n_vertices, d), ascending per row
            iu, ju = np.triu_indices(int(d), 1)
            b_all.append(nbr[:, iu].ravel())
            c_all.append(nbr[:, ju].ravel())
        if not b_all:
            return empty
        b = np.concatenate(b_all)
        c = np.concatenate(c_all)
        return pa.table(
            {
                "wbkt": pa.array(((b * _PRIME + c) % num_buckets).astype(np.int64)),
                "b": pa.array(b),
                "c": pa.array(c),
                "is_edge": pa.array(np.zeros(len(b), dtype=np.int64)),
            }
        )

    def close_wedges(group: pa.Table) -> pa.Table:
        b = group.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        ise = (
            group.column("is_edge").combine_chunks().to_numpy(zero_copy_only=False)
            == 1
        )
        maxc = int(c.max()) + 1 if len(c) else 1
        key = b * maxc + c
        closed = np.isin(key[~ise], key[ise])
        return pa.table(
            {
                "n_wedges": pa.array([int((~ise).sum())], pa.int64()),
                "n_triangles": pa.array([int(closed.sum())], pa.int64()),
            }
        )

    wedges = (
        edges.map_batches(abucket, batch_format="pyarrow")
        .groupby("abkt")
        .map_groups(wedges_of, batch_format="pyarrow")
    )
    parts = (
        wedges.union(edges.map_batches(edge_side, batch_format="pyarrow"))
        .groupby("wbkt")
        .map_groups(close_wedges, batch_format="pyarrow")
        .take_all()
    )  # <= num_buckets 2-int rows
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([sum(r["n_wedges"] for r in parts)], pa.int64()),
            "n_triangles": pa.array(
                [sum(r["n_triangles"] for r in parts)], pa.int64()
            ),
        }
    )


LCC_PPM_SCALE = 1_000_000


def clustering_coefficients(
    sf_dir: str, *, min_support: int = BASKET_MIN_SUPPORT, num_buckets: int = 64
) -> rd.Dataset:
    """Per-node local clustering coefficient of the co-purchase graph —
    Watts & Strogatz 1998's ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))``,
    the per-node refinement of `triangle_count`'s global triangle census
    (community tightness / motif-anomaly signal per part).

    Same oriented node-iterator (Suri & Vassilvitskii 2011), extended to
    ATTRIBUTE each closed wedge: wedges carry their center ``a``; in the
    (b, c)-keyed closing buckets every triangle credits all three corners
    (a, b, c), and the per-node credits fold through ONE node-keyed
    bucket shuffle together with the degree partials (tagged union — no
    join stage).  The coefficient is kept float-free as
    ``lcc_ppm = (2·T·10^6) // (d·(d−1))`` exact integer floor.

    Returns (part, degree, n_tri, lcc_ppm) for nodes with degree ≥ 2,
    sorted by part — byte-identical to the wedge-join DuckDB twin.
    """
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )

    _PRIME = np.int64(1_000_003)

    def edge_side(batch: pa.Table) -> pa.Table:
        b = batch.column("p1").to_numpy(zero_copy_only=False)
        c = batch.column("p2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "wbkt": pa.array(((b * _PRIME + c) % num_buckets).astype(np.int64)),
                "a": pa.array(np.full(len(b), -1, dtype=np.int64)),
                "b": pa.array(b),
                "c": pa.array(c),
            }
        )

    def abucket(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        return batch.append_column("abkt", pa.array((a % num_buckets).astype(np.int64)))

    def wedges_of(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wbkt": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        a = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        nb = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(a):
            return empty
        order = np.lexsort((nb, a))
        a, nb = a[order], nb[order]
        verts, deg = np.unique(a, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        a_all, b_all, c_all = [], [], []
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = np.nonzero(deg == d)[0]
            idx = starts[sel][:, None] + np.arange(d)[None, :]
            nbr = nb[idx]  # (n_vertices, d), ascending per row
            iu, ju = np.triu_indices(int(d), 1)
            a_all.append(np.repeat(verts[sel], len(iu)))
            b_all.append(nbr[:, iu].ravel())
            c_all.append(nbr[:, ju].ravel())
        if not b_all:
            return empty
        av = np.concatenate(a_all)
        b = np.concatenate(b_all)
        c = np.concatenate(c_all)
        return pa.table(
            {
                "wbkt": pa.array(((b * _PRIME + c) % num_buckets).astype(np.int64)),
                "a": pa.array(av),
                "b": pa.array(b),
                "c": pa.array(c),
            }
        )

    def tri_credits(group: pa.Table) -> pa.Table:
        a = group.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        b = group.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        ise = a < 0
        maxc = int(c.max()) + 1 if len(c) else 1
        key = b * maxc + c
        closed = np.isin(key[~ise], key[ise])
        ta, tb, tc_ = a[~ise][closed], b[~ise][closed], c[~ise][closed]
        nodes = np.concatenate([ta, tb, tc_])
        uv, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": pa.array(uv, pa.int64()),
                "deg": pa.array(np.zeros(len(uv), dtype=np.int64)),
                "tri": pa.array(cnt.astype(np.int64)),
            }
        )

    def deg_partials(batch: pa.Table) -> pa.Table:
        p1 = batch.column("p1").to_numpy(zero_copy_only=False)
        p2 = batch.column("p2").to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(np.concatenate([p1, p2]), return_counts=True)
        return pa.table(
            {
                "part": pa.array(uv, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64)),
                "tri": pa.array(np.zeros(len(uv), dtype=np.int64)),
            }
        )

    wedges = (
        edges.map_batches(abucket, batch_format="pyarrow")
        .groupby("abkt")
        .map_groups(wedges_of, batch_format="pyarrow")
    )
    credits = (
        wedges.union(edges.map_batches(edge_side, batch_format="pyarrow"))
        .groupby("wbkt")
        .map_groups(tri_credits, batch_format="pyarrow")
    )
    from .fold import fold_int_sums_by_key

    folded = fold_int_sums_by_key(
        credits.union(edges.map_batches(deg_partials, batch_format="pyarrow")),
        key="part",
        cols=["deg", "tri"],
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        t = batch.column("tri").to_numpy(zero_copy_only=False)
        keep = d >= 2
        d, t = d[keep], t[keep]
        lcc = (2 * t * LCC_PPM_SCALE) // (d * (d - 1))
        return pa.table(
            {
                "part": batch.column("part").filter(pa.array(keep)),
                "degree": pa.array(d, pa.int64()),
                "n_tri": pa.array(t, pa.int64()),
                "lcc_ppm": pa.array(lcc.astype(np.int64)),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("part")


CN_MAX_DEGREE = 256
CN_TOP_K = 20


def common_neighbors_topk(
    sf_dir: str,
    *,
    min_support: int = BASKET_MIN_SUPPORT,
    num_buckets: int = 64,
    max_degree: int = CN_MAX_DEGREE,
    k: int = CN_TOP_K,
) -> rd.Dataset:
    """Common-neighbors link prediction on the co-purchase graph: the
    top-k NON-adjacent part pairs ranked by shared-neighbor count — the
    classic "customers also bought" candidate generator (Liben-Nowell &
    Kleinberg 2003's strongest simple baseline) and the recommendation
    complement of `triangle_count` (which counts the wedges that DID
    close; this surfaces the strongest wedges that did not).

    Unlike the triangle orientation trick, common-neighbor wedges need the
    FULL symmetrized adjacency per center, so hub centers explode as
    C(d, 2): centers with degree > ``max_degree`` are excluded outright
    (not truncated — exclusion is exactly expressible in the SQL twin,
    truncation is not) and counted in the pipeline log.  At real scale the
    cap is the standard mitigation; the excluded hubs are the pairs every
    heavy-hitter already co-occurs with.

    Scale shape: edges fold from the shared `_pair_partials` stages (ONE
    exact pair-bucket shuffle); wedges bucket by CENTER so each center's
    full neighbor list is bucket-local (degree-class triu expansion, no
    per-center Python loop); wedge pairs and edges co-bucket by
    hash(u, v) where each bucket counts wedges per pair, drops pairs that
    are already edges, and keeps a block-local top-k (only a block top-k
    row can reach the global top-k) -> k-row global sort.  Returns
    (p1, p2, cn) ordered by (cn DESC, p1, p2), a total order on both
    sides.
    """
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )
    return _cn_topk_from_edges(
        edges, num_buckets=num_buckets, max_degree=max_degree, k=k
    )


def _cn_topk_from_edges(
    edges: rd.Dataset, *, num_buckets: int, max_degree: int, k: int
) -> rd.Dataset:
    """Common-neighbors top-k over an arbitrary (p1, p2) edge Dataset —
    the shared core of `common_neighbors_topk` (full graph) and
    `linkpred_holdout_eval` (train split)."""
    import logging

    _PRIME = np.int64(1_000_003)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        ctr = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        return pa.table(
            {
                "cbkt": pa.array((ctr % num_buckets).astype(np.int64)),
                "ctr": pa.array(ctr),
                "nbr": pa.array(nbr),
            }
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wbkt": pa.array([], pa.int64()),
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.int64()),
            }
        )
        ctr = group.column("ctr").combine_chunks().to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(ctr):
            return empty
        order = np.lexsort((nbr, ctr))
        ctr, nbr = ctr[order], nbr[order]
        verts, deg = np.unique(ctr, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        dropped = int((deg > max_degree).sum())
        if dropped:
            logging.getLogger(__name__).info(
                "common_neighbors: excluded %d hub centers (degree > %d)",
                dropped,
                max_degree,
            )
        u_all, v_all = [], []
        for d in np.unique(deg):
            if d < 2 or d > max_degree:
                continue
            sel = np.nonzero(deg == d)[0]
            idx = starts[sel][:, None] + np.arange(d)[None, :]
            nb = nbr[idx]  # (n_centers, d), ascending per row
            iu, ju = np.triu_indices(int(d), 1)
            u_all.append(nb[:, iu].ravel())
            v_all.append(nb[:, ju].ravel())
        if not u_all:
            return empty
        u = np.concatenate(u_all)
        v = np.concatenate(v_all)
        return pa.table(
            {
                "wbkt": pa.array(((u * _PRIME + v) % num_buckets).astype(np.int64)),
                "u": pa.array(u),
                "v": pa.array(v),
                "is_edge": pa.array(np.zeros(len(u), dtype=np.int64)),
            }
        )

    def edge_side(batch: pa.Table) -> pa.Table:
        u = batch.column("p1").to_numpy(zero_copy_only=False)
        v = batch.column("p2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "wbkt": pa.array(((u * _PRIME + v) % num_buckets).astype(np.int64)),
                "u": pa.array(u),
                "v": pa.array(v),
                "is_edge": pa.array(np.ones(len(u), dtype=np.int64)),
            }
        )

    def block_topk(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
            }
        )
        u = group.column("u").combine_chunks().to_numpy(zero_copy_only=False)
        v = group.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        ise = (
            group.column("is_edge").combine_chunks().to_numpy(zero_copy_only=False)
            == 1
        )
        if not len(u):
            return empty
        maxv = int(v.max()) + 1
        key = u * maxv + v
        wkey = key[~ise]
        if not len(wkey):
            return empty
        uniq, counts = np.unique(wkey, return_counts=True)
        keep = ~np.isin(uniq, key[ise])  # drop pairs already adjacent
        uniq, counts = uniq[keep], counts[keep]
        if not len(uniq):
            return empty
        # block-local top-k under the global (cn DESC, p1, p2) order
        order = np.lexsort((uniq % maxv, uniq // maxv, -counts))[:k]
        uniq, counts = uniq[order], counts[order]
        return pa.table(
            {
                "p1": pa.array((uniq // maxv).astype(np.int64)),
                "p2": pa.array((uniq % maxv).astype(np.int64)),
                "cn": pa.array(counts.astype(np.int64)),
            }
        )

    wedges = (
        edges.map_batches(symmetrize, batch_format="pyarrow")
        .groupby("cbkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )
    return (
        wedges.union(edges.map_batches(edge_side, batch_format="pyarrow"))
        .groupby("wbkt")
        .map_groups(block_topk, batch_format="pyarrow")
        .sort(["cn", "p1", "p2"], descending=[True, False, False])
        .limit(k)
    )


RA_SCALE = 1_000_000_000


def resource_allocation_topk(
    sf_dir: str,
    *,
    min_support: int = BASKET_MIN_SUPPORT,
    num_buckets: int = 64,
    max_degree: int = CN_MAX_DEGREE,
    k: int = CN_TOP_K,
) -> rd.Dataset:
    """Resource-allocation link prediction — `common_neighbors_topk` with
    hub-discounted scoring (Zhou, Lü & Zhang 2009, the strongest of the
    simple local indices): each shared neighbor w contributes 1/deg(w),
    so a pair connected only through promiscuous hubs scores low.  On the
    exact integer grid: contribution = ``RA_SCALE // deg(w)`` (floor on
    both sides — no float anywhere), summed per non-adjacent pair.

    Same scale shape as `common_neighbors_topk` (one center-bucket wedge
    expansion with the degree cap excluded identically in the twin, one
    pair-bucket fold with block-local top-k); the center's full degree is
    bucket-local by construction, so the score attaches for free.
    Returns (p1, p2, cn, ra_score) ordered by (ra_score DESC, p1, p2).
    """
    import logging

    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )

    _PRIME = np.int64(1_000_003)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        ctr = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        return pa.table(
            {
                "cbkt": pa.array((ctr % num_buckets).astype(np.int64)),
                "ctr": pa.array(ctr),
                "nbr": pa.array(nbr),
            }
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wbkt": pa.array([], pa.int64()),
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "sc": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.int64()),
            }
        )
        ctr = group.column("ctr").combine_chunks().to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(ctr):
            return empty
        order = np.lexsort((nbr, ctr))
        ctr, nbr = ctr[order], nbr[order]
        verts, deg = np.unique(ctr, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        dropped = int((deg > max_degree).sum())
        if dropped:
            logging.getLogger(__name__).info(
                "resource_allocation: excluded %d hub centers (degree > %d)",
                dropped,
                max_degree,
            )
        u_all, v_all, s_all = [], [], []
        for d in np.unique(deg):
            if d < 2 or d > max_degree:
                continue
            sel = np.nonzero(deg == d)[0]
            idx = starts[sel][:, None] + np.arange(d)[None, :]
            nb = nbr[idx]
            iu, ju = np.triu_indices(int(d), 1)
            npairs = len(sel) * len(iu)
            u_all.append(nb[:, iu].ravel())
            v_all.append(nb[:, ju].ravel())
            s_all.append(np.full(npairs, RA_SCALE // int(d), dtype=np.int64))
        if not u_all:
            return empty
        u = np.concatenate(u_all)
        v = np.concatenate(v_all)
        s = np.concatenate(s_all)
        return pa.table(
            {
                "wbkt": pa.array(((u * _PRIME + v) % num_buckets).astype(np.int64)),
                "u": pa.array(u),
                "v": pa.array(v),
                "sc": pa.array(s),
                "is_edge": pa.array(np.zeros(len(u), dtype=np.int64)),
            }
        )

    def edge_side(batch: pa.Table) -> pa.Table:
        u = batch.column("p1").to_numpy(zero_copy_only=False)
        v = batch.column("p2").to_numpy(zero_copy_only=False)
        z = np.zeros(len(u), dtype=np.int64)
        return pa.table(
            {
                "wbkt": pa.array(((u * _PRIME + v) % num_buckets).astype(np.int64)),
                "u": pa.array(u),
                "v": pa.array(v),
                "sc": pa.array(z),
                "is_edge": pa.array(np.ones(len(u), dtype=np.int64)),
            }
        )

    def block_topk(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
                "ra_score": pa.array([], pa.int64()),
            }
        )
        u = group.column("u").combine_chunks().to_numpy(zero_copy_only=False)
        v = group.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        sc = group.column("sc").combine_chunks().to_numpy(zero_copy_only=False)
        ise = (
            group.column("is_edge").combine_chunks().to_numpy(zero_copy_only=False)
            == 1
        )
        if not len(u):
            return empty
        maxv = int(v.max()) + 1
        key = u * maxv + v
        wkey, wsc = key[~ise], sc[~ise]
        if not len(wkey):
            return empty
        uniq, inv, counts = np.unique(wkey, return_inverse=True, return_counts=True)
        score = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(score, inv, wsc)  # exact: <= 256 wedges x RA_SCALE/2
        keep = ~np.isin(uniq, key[ise])
        uniq, counts, score = uniq[keep], counts[keep], score[keep]
        if not len(uniq):
            return empty
        order = np.lexsort((uniq % maxv, uniq // maxv, -score))[:k]
        return pa.table(
            {
                "p1": pa.array((uniq[order] // maxv).astype(np.int64)),
                "p2": pa.array((uniq[order] % maxv).astype(np.int64)),
                "cn": pa.array(counts[order].astype(np.int64)),
                "ra_score": pa.array(score[order]),
            }
        )

    wedges = (
        edges.map_batches(symmetrize, batch_format="pyarrow")
        .groupby("cbkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )
    return (
        wedges.union(edges.map_batches(edge_side, batch_format="pyarrow"))
        .groupby("wbkt")
        .map_groups(block_topk, batch_format="pyarrow")
        .sort(["ra_score", "p1", "p2"], descending=[True, False, False])
        .limit(k)
    )


LP_HOLDOUT_MOD = 5  # coin % 5 == 0 -> test edge (20% holdout)
LP_EVAL_K = 50


def linkpred_holdout_eval(
    sf_dir: str,
    *,
    min_support: int = BASKET_MIN_SUPPORT,
    num_buckets: int = 64,
    max_degree: int = CN_MAX_DEGREE,
    k: int = LP_EVAL_K,
) -> rd.Dataset:
    """Offline evaluation of common-neighbors link prediction — the
    standard holdout protocol (Liben-Nowell & Kleinberg 2003): hide a
    deterministic 20% of the co-purchase edges, predict the top-k links
    from the REMAINING graph, and report how many predictions are hidden
    true edges (hits@k).  This is the harness that turns the link
    predictors from demos into tunable components.

    The split coin is the Knuth-hash arithmetic the synthetic corpus
    already uses (exactly expressible in SQL):
        coin = ((p1·2654435761 + p2·40503) mod 2^32) mod 5, test ⇔ 0.
    Scale shape: the train filter is one vectorized map over the edge
    fold; prediction reuses `_cn_topk_from_edges` unchanged; the k
    predictions (k rows, driver-safe by construction) broadcast into one
    membership filter over the test split.  Returns one row
    (n_train_edges, n_test_edges, k, n_hits, hit_ppm) with
    hit_ppm = n_hits·10^6 // k.
    """
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )

    def coin_split(keep_test: bool):
        def inner(batch: pa.Table) -> pa.Table:
            a = batch.column("p1").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = batch.column("p2").to_numpy(zero_copy_only=False).astype(np.uint64)
            coin = ((a * np.uint64(2654435761) + b * np.uint64(40503))
                    % np.uint64(4294967296)) % np.uint64(LP_HOLDOUT_MOD)
            sel = (coin == 0) if keep_test else (coin != 0)
            return pa.table(
                {
                    "p1": batch.column("p1").filter(pa.array(sel)),
                    "p2": batch.column("p2").filter(pa.array(sel)),
                }
            )

        return inner

    train = edges.map_batches(coin_split(False), batch_format="pyarrow").materialize()
    test = edges.map_batches(coin_split(True), batch_format="pyarrow").materialize()
    n_train, n_test = train.count(), test.count()

    preds = _cn_topk_from_edges(
        train, num_buckets=num_buckets, max_degree=max_degree, k=k
    ).take_all()  # exactly <= k rows: driver-safe by construction
    pred_keys = {(int(r["p1"]), int(r["p2"])) for r in preds}

    import ray

    keys_ref = ray.put(pred_keys)

    def hits(batch: pa.Table) -> pa.Table:
        from .joins import _get_broadcast

        keys = _get_broadcast(keys_ref)
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        h = sum(1 for p in zip(a.tolist(), b.tolist()) if (p[0], p[1]) in keys)
        return pa.table({"h": pa.array([h], pa.int64())})

    n_hits = test.map_batches(hits, batch_format="pyarrow").sum("h") or 0
    return rd.from_arrow(
        pa.table(
            {
                "n_train_edges": pa.array([n_train], pa.int64()),
                "n_test_edges": pa.array([n_test], pa.int64()),
                "k": pa.array([len(preds)], pa.int64()),
                "n_hits": pa.array([int(n_hits)], pa.int64()),
                "hit_ppm": pa.array(
                    [int(n_hits) * 1_000_000 // max(len(preds), 1)], pa.int64()
                ),
            }
        )
    )


def degree_assortativity(
    sf_dir: str, *, min_support: int = BASKET_MIN_SUPPORT, num_buckets: int = 64
) -> pa.Table:
    """Degree assortativity coefficient (Newman 2002) of the co-purchase
    graph: the Pearson correlation of endpoint degrees over all edge
    stubs — positive means hubs trade with hubs (assortative), negative
    means hub-and-spoke structure; THE one-number summary of whether
    near-dup/graph blow-ups will concentrate on a few nodes.

    EXACT integer moments end-to-end: over the 2E ordered stubs (u, v),
    Sx = Σ deg_u (= Σ deg_v by symmetry), Sxx = Σ deg_u², Sxy =
    Σ deg_u·deg_v fold as Python ints; r is ONE double expression

        r = (M·Sxy − Sx·Sx) / (M·Sxx − Sx·Sx)

    rounded half-even to ppm — HUGEINT twin with the same operand order.

    Scale shape: degrees via one endpoint-bucket fold; two co-partition
    attach passes key the edge list by u then by v (the
    `token_rarity_score` bucket-join discipline — the degree table never
    sits on the driver); block-local moment partials fold to six
    driver ints.  Returns ONE row (n_edges, m_stubs, sx, sxx, sxy,
    r_ppm).
    """
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    ).materialize()
    _SENT = -1

    def stub_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "nbkt": pa.array((node % num_buckets).astype(np.int64)),
                "node": pa.array(node),
                "c": pa.array(np.ones(len(node), np.int64)),
            }
        )

    def deg_fold(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        un, inv = np.unique(node, return_inverse=True)
        deg = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "nbkt": pa.array((un % num_buckets).astype(np.int64)),
                "node": pa.array(un),
                "deg": pa.array(deg),
            }
        )

    degrees = (
        edges.map_batches(stub_rows, batch_format="pyarrow")
        .groupby("nbkt")
        .map_groups(deg_fold, batch_format="pyarrow")
        .materialize()
    )

    def edge_u_side(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nbkt": pa.array((a % num_buckets).astype(np.int64)),
                "node": pa.array(a),
                "other": batch.column("p2"),
                "deg": pa.array(np.full(len(a), _SENT, np.int64)),
            }
        )

    def deg_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nbkt": batch.column("nbkt"),
                "node": batch.column("node"),
                "other": pa.array(np.full(batch.num_rows, _SENT, np.int64)),
                "deg": batch.column("deg"),
            }
        )

    def attach_u(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        other = group.column("other").combine_chunks().to_numpy(zero_copy_only=False)
        deg = group.column("deg").combine_chunks().to_numpy(zero_copy_only=False)
        is_deg = deg != _SENT
        dn, dv = node[is_deg], deg[is_deg]
        order = np.argsort(dn, kind="stable")
        dn, dv = dn[order], dv[order]
        eu, ev = node[~is_deg], other[~is_deg]
        if not len(eu):
            return pa.table(
                {
                    "nbkt": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        pos = np.searchsorted(dn, eu)
        if (pos >= len(dn)).any() or (dn[np.minimum(pos, len(dn) - 1)] != eu).any():
            raise ValueError("edge endpoint without a degree row")
        # rekey by the OTHER endpoint, carrying deg_u in `deg`
        return pa.table(
            {
                "nbkt": pa.array((ev % num_buckets).astype(np.int64)),
                "node": pa.array(ev),
                "other": pa.array(eu),
                "deg": pa.array(dv[pos]),
            }
        )

    def attach_v(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        deg = group.column("deg").combine_chunks().to_numpy(zero_copy_only=False)
        other = group.column("other").combine_chunks().to_numpy(zero_copy_only=False)
        is_deg = (other == _SENT)
        dn, dv = node[is_deg], deg[is_deg]
        order = np.argsort(dn, kind="stable")
        dn, dv = dn[order], dv[order]
        eu, du = node[~is_deg], deg[~is_deg]
        if not len(eu):
            return pa.table(
                {
                    "sx": pa.array([], pa.string()),
                    "sxx": pa.array([], pa.string()),
                    "sxy": pa.array([], pa.string()),
                    "m": pa.array([], pa.int64()),
                }
            )
        pos = np.searchsorted(dn, eu)
        if (pos >= len(dn)).any() or (dn[np.minimum(pos, len(dn) - 1)] != eu).any():
            raise ValueError("edge endpoint without a degree row")
        dv_edge = dv[pos]
        # both stub orientations of each undirected edge: (du, dv) + (dv, du)
        sx = int(du.sum()) + int(dv_edge.sum())
        sxx = int((du * du).sum()) + int((dv_edge * dv_edge).sum())
        sxy = 2 * int((du * dv_edge).sum())
        return pa.table(
            {
                "sx": pa.array([str(sx)], pa.string()),
                "sxx": pa.array([str(sxx)], pa.string()),
                "sxy": pa.array([str(sxy)], pa.string()),
                "m": pa.array([2 * len(eu)], pa.int64()),
            }
        )

    deg_keyed = degrees.map_batches(deg_side, batch_format="pyarrow")
    mid = (
        edges.map_batches(edge_u_side, batch_format="pyarrow")
        .union(deg_keyed)
        .groupby("nbkt")
        .map_groups(attach_u, batch_format="pyarrow")
    )
    parts = (
        mid.union(deg_keyed)
        .groupby("nbkt")
        .map_groups(attach_v, batch_format="pyarrow")
        .take_all()
    )
    sx = sum(int(r["sx"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    m = sum(r["m"] for r in parts)
    n_edges = m // 2
    if m and (m * sxx - sx * sx):
        r_ppm = int(
            np.round(
                (float(m * sxy - sx * sx) / float(m * sxx - sx * sx)) * 1_000_000
            )
        )
    else:
        r_ppm = 0
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "m_stubs": pa.array([m], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sxx": pa.array([sxx], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "r_ppm": pa.array([r_ppm], pa.int64()),
        }
    )

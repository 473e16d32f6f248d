"""Rank-based statistics + RFM segmentation over the driver tables.

Nonparametric rank statistics are the robust complement to the exact-moment
family (`profile.pearson_price_qty`, `analytics.theil_sen_daily`): they need
GLOBAL ranks, which at scale means a distributed ranking, not a sort.  Every
operator here rides the same two-pass order-preserving value-bucket prefix
sum already proven by `packing.rank_by_quality` / `profile.gini_by_segment`:

1. bucketize by ``value * B // (max+1)`` (bucket order == value order),
2. per-bucket counts give exclusive rank offsets (a buckets-sized driver
   fold — never row data),
3. each bucket ranks locally under the pinned deterministic tie-break
   (value, unique_key) — identical to the twin's ``row_number() OVER
   (ORDER BY value, key)``.

Exactness contract (the repo-wide convention): all sums are EXACT integers
on the cents/rank grid — rank products are summed in ``chunk``-row int64
slices and carried as arbitrary-precision Python ints serialized as decimal
strings, so no int64 addition can overflow at any corpus size; floats appear
exactly once per statistic, in the final division evaluated with the
identical operand order as the HUGEINT twin, quantized half-even (np.round
== DuckDB round_even).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..sources.tables import sf_table
from .analytics import _cents
from .joins import _get_broadcast

_CHUNK = 8192  # int64-overflow-safe slice length for rank-product partials


def _str_sum(vals: np.ndarray, chunk: int = _CHUNK) -> int:
    """Exact Python-int sum of an int64 array via overflow-safe slices."""
    total = 0
    for i in range(0, len(vals), chunk):
        total += int(vals[i : i + chunk].sum())
    return total


def mannwhitney_order_value(
    sf_dir: str,
    *,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Mann-Whitney U between two customer segments' per-order value — the
    nonparametric two-sample location test every experiment-analysis layer
    runs when value distributions are skewed (order totals always are).

    Ranks are the DETERMINISTIC permutation under (cents, o_orderkey) —
    tie-broken row_number ranks, not midranks; exact and identical to the
    twin's window by construction (documented: with heavy cents ties the
    classic midrank U differs, but is not exactly reproducible across
    engines without a second tie pass).  U_a = R_a - n_a(n_a+1)/2; the
    normal z-score uses the tie-free variance n_a·n_b·(n+1)/12.

    Scale shape: segment attaches via the broadcast customer dim; ONE
    bucket-keyed shuffle ranks the combined sample (two-pass prefix sum, no
    global sort); per-bucket rank-sum partials are buckets-sized strings.
    Returns one row (n_a, n_b, rank_sum_a, u_a, u_b, z_milli) with the
    HUGEINT-sized sums as exact decimal strings.
    """
    orders = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).take_all()
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in cust}
    seg_ref = ray.put(seg_of)

    def attach(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lookup = _get_broadcast(seg_ref)
        keys = pd.Series(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        segs = keys.map(lookup).to_numpy()
        g = np.where(segs == seg_a, 0, np.where(segs == seg_b, 1, -1)).astype(np.int64)
        keep = g >= 0
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()).filter(pa.array(keep)),
                "cents": _cents(batch.column("o_totalprice")).filter(pa.array(keep)),
                "g": pa.array(g[keep]),
            }
        )

    tagged = orders.map_batches(attach, batch_format="pyarrow").materialize()
    mx = tagged.max("cents") or 0

    def bucketize(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = (c.astype(np.int64) * num_buckets) // (int(mx) + 1)
        return batch.append_column("bkt", pa.array(np.clip(bkt, 0, num_buckets - 1)))

    bucketed = tagged.map_batches(bucketize, batch_format="pyarrow").materialize()
    parts = bucketed.groupby("bkt").aggregate(Count(alias_name="n")).take_all()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(parts, key=lambda r: r["bkt"]):
        offsets[r["bkt"]] = acc
        acc += int(r["n"])
    off_ref = ray.put(offsets)

    def rank_partial(group: pa.Table) -> pa.Table:
        off = _get_broadcast(off_ref)
        base = off[group.column("bkt")[0].as_py()]
        c = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        k = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        g = group.column("g").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, c))
        gs = g[order]
        ranks = base + np.arange(1, len(gs) + 1, dtype=np.int64)
        return pa.table(
            {
                "na": pa.array([int((gs == 0).sum())], pa.int64()),
                "nb": pa.array([int((gs == 1).sum())], pa.int64()),
                "ra": pa.array([str(_str_sum(ranks[gs == 0]))], pa.string()),
            }
        )

    rows = (
        bucketed.groupby("bkt")
        .map_groups(rank_partial, batch_format="pyarrow")
        .take_all()  # <= num_buckets rows
    )
    na = sum(int(r["na"]) for r in rows)
    nb = sum(int(r["nb"]) for r in rows)
    ra = sum(int(r["ra"]) for r in rows)
    ua = ra - na * (na + 1) // 2
    ub = na * nb - ua
    var4 = na * nb * (na + nb + 1)  # 12 * variance
    if var4 == 0:
        z_milli = 0
    else:
        z = (float(ua) - float(na * nb) / 2.0) / math.sqrt(float(var4) / 12.0)
        z_milli = int(np.round(z * 1000))
    return rd.from_arrow(
        pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "rank_sum_a": pa.array([str(ra)], pa.string()),
                "u_a": pa.array([str(ua)], pa.string()),
                "u_b": pa.array([str(ub)], pa.string()),
                "z_milli": pa.array([z_milli], pa.int64()),
            }
        )
    )


def spearman_qty_price(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Spearman rank correlation between l_quantity and l_extendedprice —
    the monotone-association screen (Pearson's rank-space twin; robust to
    the price outliers `price_outliers` flags).

    Spearman pairs BOTH ranks per physical row, so rows first get a
    globally unique id: a distributed ``row_number() OVER (ORDER BY
    l_orderkey, l_linenumber, x, y)`` via the okey-range prefix sum —
    (orderkey, linenumber) does NOT uniquely key this table, and rows
    whose full (okey, lineno, x, y) tuple duplicates are interchangeable
    for both rankings (equal x AND equal y → consecutive uid, rank pairs
    shift together), so the uid tie among them is inert.  Then rank_x and
    rank_y are CHAINED passes that carry the row through (uid pass →
    x-rank pass attaches rx → y-rank pass attaches ry and folds Σd²
    in-place): three pipelined shuffles of n narrow rows, versus the
    union-both-tags + zip-by-uid alternative's 5n shuffle volume — and
    every per-bucket rank offset comes from tiny histograms computed
    ONCE off the materialized base, so nothing re-executes.
        rho = 1 - 6·Σd² / (n·(n²-1))
    is exact-integer up to the single final division.  Returns
    (n, sum_d2, rho_ppm) with sum_d2 as an exact decimal string (Σd² ≤ n³
    overflows int64 past ~2M rows).
    """
    li = sf_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "lineno": batch.column("l_linenumber").cast(pa.int64()),
                "x": _cents(batch.column("l_quantity")),
                "y": _cents(batch.column("l_extendedprice")),
            }
        )

    rows0 = li.map_batches(to_cents, batch_format="pyarrow").materialize()
    mxo = rows0.max("okey") or 0
    mxx = rows0.max("x") or 0
    mxy = rows0.max("y") or 0

    def histogram(col: str, mx: int) -> dict[int, int]:
        def part(batch: pa.Table) -> pa.Table:
            v = batch.column(col).combine_chunks().to_numpy(zero_copy_only=False)
            bkt = np.clip((v * num_buckets) // (int(mx) + 1), 0, num_buckets - 1)
            uniq, counts = np.unique(bkt, return_counts=True)
            return pa.table(
                {"bkt": pa.array(uniq.astype(np.int64)), "n": pa.array(counts.astype(np.int64))}
            )

        parts = (
            rows0.map_batches(part, batch_format="pyarrow")
            .groupby("bkt")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        off: dict[int, int] = {}
        acc = 0
        for r in sorted(parts, key=lambda r: r["bkt"]):
            off[int(r["bkt"])] = acc
            acc += int(r["n"])
        return off

    koff_ref = ray.put(histogram("okey", mxo))
    xoff_ref = ray.put(histogram("x", mxx))
    yoff_ref = ray.put(histogram("y", mxy))

    def kbucket(batch: pa.Table) -> pa.Table:
        k = batch.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = np.clip((k * num_buckets) // (int(mxo) + 1), 0, num_buckets - 1)
        return batch.append_column("bkt", pa.array(bkt.astype(np.int64)))

    def uid_group(group: pa.Table) -> pa.Table:
        off = _get_broadcast(koff_ref)
        base = off[int(group.column("bkt")[0].as_py())]
        okey = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        lineno = group.column("lineno").combine_chunks().to_numpy(zero_copy_only=False)
        x = group.column("x").combine_chunks().to_numpy(zero_copy_only=False)
        y = group.column("y").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x, lineno, okey))
        uid = np.empty(len(okey), dtype=np.int64)
        uid[order] = base + np.arange(1, len(okey) + 1, dtype=np.int64)
        return pa.table({"uid": pa.array(uid), "x": pa.array(x), "y": pa.array(y)})

    withuid = (
        rows0.map_batches(kbucket, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(uid_group, batch_format="pyarrow")
    )

    def xbucket(batch: pa.Table) -> pa.Table:
        v = batch.column("x").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = np.clip((v * num_buckets) // (int(mxx) + 1), 0, num_buckets - 1)
        return batch.append_column("xbkt", pa.array(bkt.astype(np.int64)))

    def rank_x(group: pa.Table) -> pa.Table:
        off = _get_broadcast(xoff_ref)
        base = off[int(group.column("xbkt")[0].as_py())]
        v = group.column("x").combine_chunks().to_numpy(zero_copy_only=False)
        uid = group.column("uid").combine_chunks().to_numpy(zero_copy_only=False)
        y = group.column("y").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, v))
        rx = np.empty(len(v), dtype=np.int64)
        rx[order] = base + np.arange(1, len(v) + 1, dtype=np.int64)
        return pa.table({"uid": pa.array(uid), "y": pa.array(y), "rx": pa.array(rx)})

    ranked_x = (
        withuid.map_batches(xbucket, batch_format="pyarrow")
        .groupby("xbkt")
        .map_groups(rank_x, batch_format="pyarrow")
    )

    def ybucket(batch: pa.Table) -> pa.Table:
        v = batch.column("y").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = np.clip((v * num_buckets) // (int(mxy) + 1), 0, num_buckets - 1)
        return batch.append_column("ybkt", pa.array(bkt.astype(np.int64)))

    def rank_y_fold(group: pa.Table) -> pa.Table:
        off = _get_broadcast(yoff_ref)
        base = off[int(group.column("ybkt")[0].as_py())]
        v = group.column("y").combine_chunks().to_numpy(zero_copy_only=False)
        uid = group.column("uid").combine_chunks().to_numpy(zero_copy_only=False)
        rx = group.column("rx").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, v))
        ry = np.empty(len(v), dtype=np.int64)
        ry[order] = base + np.arange(1, len(v) + 1, dtype=np.int64)
        d = rx - ry
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "sd2": pa.array([str(_str_sum(d * d))], pa.string()),
            }
        )

    rows = (
        ranked_x.map_batches(ybucket, batch_format="pyarrow")
        .groupby("ybkt")
        .map_groups(rank_y_fold, batch_format="pyarrow")
        .take_all()  # <= num_buckets rows
    )
    n = sum(int(r["n"]) for r in rows)
    sd2 = sum(int(r["sd2"]) for r in rows)
    den = n * (n * n - 1)
    if den == 0:
        rho_ppm = 0
    else:
        rho_ppm = int(np.round((1.0 - float(6 * sd2) / float(den)) * 1_000_000))
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sum_d2": pa.array([str(sd2)], pa.string()),
                "rho_ppm": pa.array([rho_ppm], pa.int64()),
            }
        )
    )


def acf_daily_revenue(sf_dir: str, *, max_lag: int = 7) -> rd.Dataset:
    """Autocorrelation of the daily event-revenue series at lags 1..k —
    the seasonality/persistence diagnostic behind `weekly_trends` and
    `theil_sen_daily` (a strong lag-7 peak is the weekly cycle).

    Per-lag ACF here is the Pearson correlation over the (x_t, x_{t+k})
    pairs of OBSERVED days (a day pairs with day+k only when both exist —
    the same join semantics as the twin's calendar self-join; gaps are
    not zero-filled).  Scale shape: ONE day-keyed aggregate folds the
    event stream to a calendar-sized table (constant at any corpus size);
    the per-lag moment sums run on the driver in exact Python ints (daily
    cents products overflow int64, never arbitrary precision).  Returns
    (lag, n_pairs, acf_ppm) for lag 1..max_lag.
    """
    ev = sf_table(sf_dir, "events", columns=["ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "cents": _cents(batch.column("value"))})
        agg = pa.TableGroupBy(t, "day").aggregate([("cents", "sum")])
        return pa.table(
            {"day": agg.column("day"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    daily = (
        ev.map_batches(day_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # calendar-sized: constant at any corpus scale
    )
    days = sorted(daily, key=lambda r: r["day"])
    d0 = days[0]["day"] if days else None
    idx = {int((r["day"] - d0).days): int(r["cents"]) for r in days} if days else {}
    lags, n_pairs, acf = [], [], []
    for k in range(1, max_lag + 1):
        xs, ys = [], []
        for di, x in idx.items():
            y = idx.get(di + k)
            if y is not None:
                xs.append(x)
                ys.append(y)
        m = len(xs)
        lags.append(k)
        n_pairs.append(m)
        if m == 0:
            acf.append(0)
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = m * sxy - sx * sy
        varx = m * sxx - sx * sx
        vary = m * syy - sy * sy
        if varx == 0 or vary == 0:
            acf.append(0)
        else:
            r_val = float(num) / math.sqrt(float(varx) * float(vary))
            acf.append(int(np.round(r_val * 1_000_000)))
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "acf_ppm": pa.array(acf, pa.int64()),
            }
        )
    )


def rfm_segments(sf_dir: str, *, tiles: int = 5, num_buckets: int = 64) -> rd.Dataset:
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical marketing grid: NTILE(5) each measure independently, count
    customers per (r, f, m) cell.

    Measures fold from orders in one custkey-keyed aggregate (map-side
    combined): recency = days from the customer's last order to the global
    last order, frequency = order count, monetary = revenue cents.  All
    three NTILE rankings ride ONE union shuffle (tag ∈ {r, f, m}; offsets
    keyed by (tag, value-bucket); ties break by custkey — identical to the
    twin's ``ntile(5) OVER (ORDER BY measure, custkey)``); the tile falls
    out of (rank, N) arithmetic exactly as `packing.quality_ntiles`.  A
    second custkey-keyed shuffle zips the three tiles per customer (dense
    keys -> balanced ``k % B`` buckets).  Returns
    (r_tile, f_tile, m_tile, n_customers, sum_cents) sorted by tile.
    """
    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch.column("o_orderdate"), unit="day"), pa.date32())
        t = pa.table(
            {
                "k": batch.column("o_custkey").cast(pa.int64()),
                "cents": _cents(batch.column("o_totalprice")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "lastd": day.cast(pa.int32()).cast(pa.int64()),
            }
        )
        agg = pa.TableGroupBy(t, "k").aggregate(
            [("cents", "sum"), ("one", "sum"), ("lastd", "max")]
        )
        return pa.table(
            {
                "k": agg.column("k"),
                "cents": agg.column("cents_sum").cast(pa.int64()),
                "freq": agg.column("one_sum").cast(pa.int64()),
                "lastd": agg.column("lastd_max").cast(pa.int64()),
            }
        )

    per_cust = (
        orders.map_batches(per_cust_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("k")
        .aggregate(
            Sum("cents", alias_name="cents"),
            Sum("freq", alias_name="freq"),
            Max("lastd", alias_name="lastd"),
        )
        .materialize()
    )
    gmax = per_cust.max("lastd") or 0
    n_total = per_cust.count()

    def explode(batch: pa.Table) -> pa.Table:
        k = batch.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        cents = batch.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        freq = batch.column("freq").combine_chunks().to_numpy(zero_copy_only=False)
        rec = int(gmax) - batch.column("lastd").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "k": pa.array(np.concatenate([k, k, k])),
                "v": pa.array(np.concatenate([rec, freq, cents]).astype(np.int64)),
                "tag": pa.array(
                    np.repeat(np.arange(3, dtype=np.int64), len(k))
                ),
            }
        )

    tagged = per_cust.map_batches(explode, batch_format="pyarrow").materialize()
    mxs = tagged.groupby("tag").aggregate(Max("v", alias_name="mx")).take_all()
    mx_of = {int(r["tag"]): int(r["mx"]) for r in mxs}
    mx_ref = ray.put(mx_of)

    def bucketize(batch: pa.Table) -> pa.Table:
        mx = _get_broadcast(mx_ref)
        v = batch.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        t = batch.column("tag").combine_chunks().to_numpy(zero_copy_only=False)
        den = np.array([mx.get(int(x), 0) + 1 for x in range(3)])[t]
        bkt = np.clip((v * num_buckets) // den, 0, num_buckets - 1)
        return batch.append_column("bkt", pa.array(bkt.astype(np.int64)))

    bucketed = tagged.map_batches(bucketize, batch_format="pyarrow").materialize()
    parts = (
        bucketed.groupby(["tag", "bkt"]).aggregate(Count(alias_name="n")).take_all()
    )
    offsets: dict[tuple[int, int], int] = {}
    acc: dict[int, int] = {}
    for r in sorted(parts, key=lambda r: (r["tag"], r["bkt"])):
        offsets[(int(r["tag"]), int(r["bkt"]))] = acc.get(int(r["tag"]), 0)
        acc[int(r["tag"])] = acc.get(int(r["tag"]), 0) + int(r["n"])
    off_ref = ray.put(offsets)

    def tile_group(group: pa.Table) -> pa.Table:
        off = _get_broadcast(off_ref)
        tag = int(group.column("tag")[0].as_py())
        base = off[(tag, int(group.column("bkt")[0].as_py()))]
        v = group.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        k = group.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, v))
        rk = np.empty(len(v), dtype=np.int64)
        rk[order] = base + np.arange(1, len(v) + 1, dtype=np.int64)
        # NTILE's exact split: first n % tiles tiles get one extra row
        n = n_total
        size_small = n // tiles
        n_big = n % tiles
        cut = n_big * (size_small + 1)
        r0 = rk - 1
        tile = (
            np.where(
                rk <= cut,
                r0 // (size_small + 1),
                n_big + (r0 - cut) // max(size_small, 1),
            )
            + 1
        )
        return pa.table(
            {
                "k": pa.array(k),
                "tag": pa.array(np.full(len(k), tag, dtype=np.int64)),
                "tile": pa.array(tile.astype(np.int64)),
                "v": pa.array(v),
            }
        )

    tiled = bucketed.groupby(["tag", "bkt"]).map_groups(
        tile_group, batch_format="pyarrow"
    )

    def zbucket(batch: pa.Table) -> pa.Table:
        k = batch.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("zb", pa.array((k % num_buckets).astype(np.int64)))

    def zip_cells(group: pa.Table) -> pa.Table:
        k = group.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        tag = group.column("tag").combine_chunks().to_numpy(zero_copy_only=False)
        tile = group.column("tile").combine_chunks().to_numpy(zero_copy_only=False)
        v = group.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, k))
        ks, tgs, tls, vs = k[order], tag[order], tile[order], v[order]
        # rows arrive as (k, tag=0), (k, 1), (k, 2) triples after the sort
        rt, ft, mt = tls[tgs == 0], tls[tgs == 1], tls[tgs == 2]
        cents = vs[tgs == 2]
        t = pa.table(
            {
                "r_tile": pa.array(rt),
                "f_tile": pa.array(ft),
                "m_tile": pa.array(mt),
                "one": pa.array(np.ones(len(rt), dtype=np.int64)),
                "cents": pa.array(cents),
            }
        )
        agg = pa.TableGroupBy(t, ["r_tile", "f_tile", "m_tile"]).aggregate(
            [("one", "sum"), ("cents", "sum")]
        )
        return pa.table(
            {
                "r_tile": agg.column("r_tile"),
                "f_tile": agg.column("f_tile"),
                "m_tile": agg.column("m_tile"),
                "n": agg.column("one_sum").cast(pa.int64()),
                "cents": agg.column("cents_sum").cast(pa.int64()),
            }
        )

    return (
        tiled.map_batches(zbucket, batch_format="pyarrow")
        .groupby("zb")
        .map_groups(zip_cells, batch_format="pyarrow")
        .groupby(["r_tile", "f_tile", "m_tile"])
        .aggregate(
            Sum("n", alias_name="n_customers"),
            Sum("cents", alias_name="sum_cents"),
        )
        .sort(["r_tile", "f_tile", "m_tile"])
    )


def cusum_changepoint(sf_dir: str) -> rd.Dataset:
    """Single changepoint detection on the daily revenue series via the
    CUSUM statistic (Page 1954) — the standard "did the level shift, and
    when?" audit on a metric stream.

    Exact-integer formulation: with daily cents x_1..x_T in day order and
    prefix sums S_k, the mean-removed CUSUM deviation is

        D_k = T·S_k − k·S_T      (= T·(S_k − k·mean), exact integers)

    and the changepoint is ``argmax_{1 ≤ k < T} |D_k|`` with smallest-k
    tie-break.  Scale shape: the acf/theil-sen pattern — ONE day-keyed
    map-side-combined aggregate folds the event stream to a calendar-sized
    series (constant at any corpus size); the argmax runs on the driver in
    exact Python ints.  Output is one row
    (cp_day, k_index, n_days, dmax, ratio_ppm) where
    ratio_ppm = round_even(dmax / (T·S_T) · 1e6) — the scale-free shift
    magnitude, the ONE double expression (same operand order as the
    HUGEINT twin: both factors cast to double before the divide).  dmax is
    emitted as int64 (exact while T·S_T < 2^63 — comfortably true on the
    cents grid below ~1e5 days × 1e13 daily cents; the twin computes in
    HUGEINT and casts).  Empty series or T == 1 → empty result on both
    sides.
    """
    ev = sf_table(sf_dir, "events", columns=["ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "cents": _cents(batch.column("value"))})
        agg = pa.TableGroupBy(t, "day").aggregate([("cents", "sum")])
        return pa.table(
            {"day": agg.column("day"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    daily = (
        ev.map_batches(day_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # calendar-sized: constant at any corpus scale
    )
    days = sorted(daily, key=lambda r: r["day"])
    T = len(days)
    empty = pa.table(
        {
            "cp_day": pa.array([], pa.timestamp("us")),
            "k_index": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "dmax": pa.array([], pa.int64()),
            "ratio_ppm": pa.array([], pa.int64()),
        }
    )
    if T < 2:
        return rd.from_arrow(empty)
    cents = [int(r["cents"]) for r in days]
    s_tot = sum(cents)
    best_k, best_d = 0, -1
    s_k = 0
    for k in range(1, T):  # k < T: the full-series deviation is 0 by def
        s_k += cents[k - 1]
        d = abs(T * s_k - k * s_tot)
        if d > best_d:  # strict: smallest k wins ties
            best_k, best_d = k, d
    denom = T * s_tot
    ratio = (
        int(np.round(float(best_d) / float(denom) * 1_000_000)) if denom != 0 else 0
    )
    return rd.from_arrow(
        pa.table(
            {
                "cp_day": pa.array([days[best_k - 1]["day"]], pa.timestamp("us")),
                "k_index": pa.array([best_k], pa.int64()),
                "n_days": pa.array([T], pa.int64()),
                "dmax": pa.array([best_d], pa.int64()),
                "ratio_ppm": pa.array([ratio], pa.int64()),
            }
        )
    )


def repurchase_life_table(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Kaplan–Meier life table over customer REPURCHASE gaps — the
    survival-analysis view of retention ("how long until the next order,
    and how many customers are still at risk at each horizon").

    Observations: every consecutive order pair of a customer contributes
    an EVENT at t = whole days between the two order dates; each
    customer's last order contributes a CENSORED observation at t = days
    to the global last order date (the study horizon — standard
    right-censoring).  The output is the exact-integer life table

        (gap_days, n_risk, n_events, n_censored, hazard_ppm)

    where ``n_risk(t) = #{observations with gap ≥ t}`` (reverse cumulative
    count) and ``hazard_ppm = round_even(n_events/n_risk · 1e6)`` is the
    ONE double per row (operand order mirrors the twin's ``::DOUBLE``
    casts).  The KM survival curve is the running product of
    ``1 − d/n`` over this table; it is NOT emitted because a float
    cumulative product is combine-order-sensitive — the table itself is
    the exact, scale-stable surface.

    Scale shape: the ``user_event_gaps`` window pattern — ONE
    ``custkey % B`` bucket shuffle, in-bucket vectorized pandas
    ``groupby.shift(-1)`` for the lead, then a gap-keyed aggregate folds
    to a horizon-sized table (days, constant at any corpus size) whose
    reverse cumsum runs on the driver in exact ints.  The global horizon
    is one column-pruned ``max()`` pass broadcast via ``fn_kwargs``.
    """
    import pandas as pd

    orders = sf_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    horizon = orders.aggregate(Max("o_orderdate"))["max(o_orderdate)"]

    def bucketize(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((ck % num_buckets).astype(np.int32))
        )

    def bucket_gaps(group: pa.Table, *, horizon) -> pa.Table:
        df = group.select(["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        led = df.groupby("o_custkey", sort=False)["o_orderdate"].shift(-1)
        ev = led.notna()
        nxt = led.fillna(pd.Timestamp(horizon))
        # whole days between day-truncated stamps: exact integer, identical
        # to the twin's date_diff('day', date_trunc(...), date_trunc(...))
        gap_us = (
            (nxt.dt.floor("D") - df["o_orderdate"].dt.floor("D"))
            .astype("timedelta64[us]")
            .astype("int64")
        )
        gap = gap_us // 86_400_000_000  # exact: both stamps are midnight
        out = pd.DataFrame(
            {
                "gap_days": gap.to_numpy(),
                "n_events": ev.to_numpy().astype("int64"),
                "n_censored": (~ev.to_numpy()).astype("int64"),
            }
        )
        part = out.groupby("gap_days", as_index=False).sum()  # map-side combine
        return pa.Table.from_pandas(part, preserve_index=False)

    tab = (
        orders.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_gaps, batch_format="pyarrow", fn_kwargs={"horizon": horizon})
        .groupby("gap_days")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_censored", alias_name="n_censored"),
        )
        .take_all()  # horizon-sized (days): constant at any corpus scale
    )
    rows = sorted(tab, key=lambda r: r["gap_days"])
    n_at = [int(r["n_events"]) + int(r["n_censored"]) for r in rows]
    risk_rev = np.cumsum(n_at[::-1])[::-1] if rows else np.array([], np.int64)
    gap_days = [int(r["gap_days"]) for r in rows]
    n_events = [int(r["n_events"]) for r in rows]
    n_cens = [int(r["n_censored"]) for r in rows]
    hazard = [
        int(np.round(float(d) / float(n) * 1_000_000)) if n else 0
        for d, n in zip(n_events, risk_rev)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "gap_days": pa.array(gap_days, pa.int64()),
                "n_risk": pa.array([int(v) for v in risk_rev], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "n_censored": pa.array(n_cens, pa.int64()),
                "hazard_ppm": pa.array(hazard, pa.int64()),
            }
        )
    )


HOLT_ALPHA_NUM, HOLT_BETA_NUM, HOLT_DEN = 3, 1, 10  # α = 0.3, β = 0.1
HOLT_SCALE = 1_000_000
HOLT_HORIZON = 7


def _rdiv_even(n: int, d: int) -> int:
    """Round-half-even integer division (d > 0) — exact banker's rounding
    on arbitrary-precision ints, the fixed-point kernel both the engine
    and the sequential oracle share by SPEC (reimplemented there)."""
    q, r = divmod(n, d)
    if 2 * r > d or (2 * r == d and q % 2 == 1):
        q += 1
    return q


def holt_forecast(sf_dir: str) -> pa.Table:
    """Holt double exponential smoothing (level + trend) over the daily
    revenue series, in EXACT INTEGER FIXED-POINT — the deterministic
    variant of the classic forecast recursion (α = 3/10, β = 1/10 as
    rationals, state in micro-cents, every step a half-even integer
    division), so the whole recursion is bit-reproducible on any
    platform with no float anywhere:

        l_t = rdiv(3·x_t·S + 7·(l + b), 10)      S = 1e6 micro-cents
        b_t = rdiv(1·(l_t − l) + 9·b, 10)

    over the ZERO-FILLED calendar between the first and last observed
    day (gaps are real zero-revenue days for a forecaster).  Forecast
    h-days-ahead f_h = l_T + h·b_T, emitted as whole cents.

    Scale shape: the acf/cusum pattern — one day-keyed map-side-combined
    aggregate folds the stream to the calendar-sized series; the
    recursion is driver math.  Not SQL-expressible (stateful recursion)
    — gated through `holt_forecast_digest`, pinned from the sequential
    `oracle_dedup.holt_rows`.  Returns (h, forecast_cents) for h = 1..7.
    """
    ev = sf_table(sf_dir, "events", columns=["ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "cents": _cents(batch.column("value"))})
        agg = pa.TableGroupBy(t, "day").aggregate([("cents", "sum")])
        return pa.table(
            {"day": agg.column("day"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    daily = (
        ev.map_batches(day_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # calendar-sized
    )
    empty = pa.table(
        {"h": pa.array([], pa.int64()), "forecast_cents": pa.array([], pa.int64())}
    )
    if not daily:
        return empty
    rows = sorted(daily, key=lambda r: r["day"])
    d0, dT = rows[0]["day"], rows[-1]["day"]
    idx = {int((r["day"] - d0).days): int(r["cents"]) for r in rows}
    xs = [idx.get(i, 0) for i in range(int((dT - d0).days) + 1)]
    level = xs[0] * HOLT_SCALE
    trend = 0
    a, b_, den = HOLT_ALPHA_NUM, HOLT_BETA_NUM, HOLT_DEN
    for x in xs[1:]:
        new_level = _rdiv_even(a * x * HOLT_SCALE + (den - a) * (level + trend), den)
        trend = _rdiv_even(b_ * (new_level - level) + (den - b_) * trend, den)
        level = new_level
    hs = list(range(1, HOLT_HORIZON + 1))
    fc = [_rdiv_even(level + h * trend, HOLT_SCALE) for h in hs]
    return pa.table(
        {
            "h": pa.array(hs, pa.int64()),
            "forecast_cents": pa.array(fc, pa.int64()),
        }
    )


def holt_forecast_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `holt_forecast`: (n_h, digest) — md5 fold over
    (h, forecast_cents) rows, pinned from `oracle_dedup.holt_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    t = holt_forecast(sf_dir)
    dg = 0
    for h, f in zip(t.column("h").to_pylist(), t.column("forecast_cents").to_pylist()):
        dg = (dg + row_digest(str(h), str(f))) % DIGEST_MOD
    return pa.table(
        {
            "n_h": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


BOOT_REPLICAS = 64
BOOT_POISSON_MAX = 8
# Cumulative Poisson(1) CDF thresholds e^{-1}·Σ 1/i!, k = 0..7: a row's
# replica multiplicity is  c = #{k : u ≥ CDF(k)}  for the replica's
# uniform u — the shortest-repr literals below are embedded VERBATIM in
# the SQL twin, so both sides compare against bit-identical doubles.
BOOT_CDF = []
_acc, _term = 0.0, 1.0
for _k in range(BOOT_POISSON_MAX):
    if _k > 0:
        _term = _term / _k
    _acc = _acc + _term
    BOOT_CDF.append(_acc * 0.36787944117144233)  # e^{-1}
del _acc, _term, _k


def bootstrap_order_value_ci(sf_dir: str) -> rd.Dataset:
    """Poisson-bootstrap confidence interval for the mean order value
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams")
    — THE distributed bootstrap: instead of resampling n rows with
    replacement (impossible in one pass), every row contributes a
    Poisson(1)-distributed multiplicity to each of ``BOOT_REPLICAS``
    replicas, with the multiplicity DETERMINISTIC via
    ``u = md5(replica:orderkey)[:8] / 2^32`` against the precomputed
    Poisson CDF thresholds (capped at 8 — tail mass < 1e-6).

    Replica sums are exact integer (Σ c·cents, Σ c) partials folded
    map-side; each replica's mean is ONE double divide quantized to q4;
    the 2.5%/97.5% interval takes order statistics 1 and 62 of the 64
    sorted replica means (fixed indices — no interpolation to drift).
    Returns one row (n_orders, mean_q4, ci_lo_q4, ci_hi_q4); the SQL
    twin replays the whole construction via generate_series.
    """
    import hashlib

    orders = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = np.asarray(_cents(batch.column("o_totalprice")), dtype=np.int64)
        B = BOOT_REPLICAS
        s = np.zeros(B, dtype=np.int64)
        n = np.zeros(B, dtype=np.int64)
        for k, c in zip(keys.tolist(), cents.tolist()):
            kb = str(k).encode()
            for j in range(B):
                u = (
                    int(hashlib.md5(b"%d:" % j + kb).hexdigest()[:8], 16)
                    / 4294967296.0
                )
                mult = 0
                for t in BOOT_CDF:
                    if u >= t:
                        mult += 1
                if mult:
                    s[j] += mult * c
                    n[j] += mult
        return pa.table(
            {
                "replica": pa.array(np.arange(BOOT_REPLICAS, dtype=np.int64)),
                "s": pa.array(s),
                "n": pa.array(n),
            }
        )

    agg = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("replica")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .take_all()  # exactly BOOT_REPLICAS rows
    )
    means = []
    for r in agg:
        nn = int(r["n"])
        means.append(
            int(np.round(float(r["s"]) / float(nn) * 10_000)) if nn else 0
        )
    means.sort()
    # full-sample mean for the point estimate
    tot = orders.map_batches(
        lambda b: pa.table(
            {
                "c": _cents(b.column("o_totalprice")),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("c"), Sum("one"))
    s_all, n_all = int(tot["sum(c)"] or 0), int(tot["sum(one)"] or 0)
    mean_q4 = int(np.round(float(s_all) / float(n_all) * 10_000)) if n_all else 0
    lo = means[1] if len(means) > 1 else (means[0] if means else 0)
    hi = means[62] if len(means) > 62 else (means[-1] if means else 0)
    return rd.from_arrow(
        pa.table(
            {
                "n_orders": pa.array([n_all], pa.int64()),
                "mean_q4": pa.array([mean_q4], pa.int64()),
                "ci_lo_q4": pa.array([lo], pa.int64()),
                "ci_hi_q4": pa.array([hi], pa.int64()),
            }
        )
    )


BACKTEST_DAYS = 28


def holt_backtest(sf_dir: str, *, k: int = BACKTEST_DAYS) -> pa.Table:
    """Walk-forward backtest of the Holt forecaster — the eval harness
    that tells you whether the fancy model beats persistence BEFORE
    trusting its forecasts (the `ann_eval_digest` discipline applied to
    time series): for each of the last ``k`` days, fit the exact-integer
    Holt recursion on the PREFIX ending the day before, forecast h = 1,
    and compare against both the actual and the naive last-value carry.

    All integer: the daily series folds once (the `holt_forecast`
    day-keyed aggregate), the k prefix recursions run as driver math
    over the calendar-sized series (each O(T) int steps — at web scale
    the prefix states checkpoint incrementally, the recursion being
    strictly left-to-right), absolute errors sum exactly.  Returns ONE
    row (k_days, mae_holt_cents, mae_naive_cents, holt_wins,
    improvement_ppm) where improvement_ppm = (mae_naive − mae_holt)·10^6
    // max(mae_naive, 1) — positive means Holt beats persistence.
    """
    ev = sf_table(sf_dir, "events", columns=["ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "cents": _cents(batch.column("value"))})
        agg = pa.TableGroupBy(t, "day").aggregate([("cents", "sum")])
        return pa.table(
            {"day": agg.column("day"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    daily = (
        ev.map_batches(day_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # calendar-sized
    )
    empty = pa.table(
        {
            "k_days": pa.array([0], pa.int64()),
            "mae_holt_cents": pa.array([0], pa.int64()),
            "mae_naive_cents": pa.array([0], pa.int64()),
            "holt_wins": pa.array([0], pa.int64()),
            "improvement_ppm": pa.array([0], pa.int64()),
        }
    )
    if not daily:
        return empty
    rows = sorted(daily, key=lambda r: r["day"])
    d0, dT = rows[0]["day"], rows[-1]["day"]
    idx = {int((r["day"] - d0).days): int(r["cents"]) for r in rows}
    xs = [idx.get(i, 0) for i in range(int((dT - d0).days) + 1)]
    T = len(xs)
    k = min(k, T - 2)
    if k <= 0:
        return empty

    def holt_one_ahead(prefix: list[int]) -> int:
        level = prefix[0] * HOLT_SCALE
        trend = 0
        a, b_, den = HOLT_ALPHA_NUM, HOLT_BETA_NUM, HOLT_DEN
        for x in prefix[1:]:
            new_level = _rdiv_even(a * x * HOLT_SCALE + (den - a) * (level + trend), den)
            trend = _rdiv_even(b_ * (new_level - level) + (den - b_) * trend, den)
            level = new_level
        return _rdiv_even(level + trend, HOLT_SCALE)

    err_h = 0
    err_n = 0
    wins = 0
    for t in range(T - k, T):
        actual = xs[t]
        fh = holt_one_ahead(xs[:t])
        fn = xs[t - 1]
        eh, en = abs(fh - actual), abs(fn - actual)
        err_h += eh
        err_n += en
        if eh < en:
            wins += 1
    mae_h = err_h // k
    mae_n = err_n // k
    imp = (mae_n - mae_h) * 1_000_000 // max(mae_n, 1)
    return pa.table(
        {
            "k_days": pa.array([k], pa.int64()),
            "mae_holt_cents": pa.array([mae_h], pa.int64()),
            "mae_naive_cents": pa.array([mae_n], pa.int64()),
            "holt_wins": pa.array([wins], pa.int64()),
            "improvement_ppm": pa.array([imp], pa.int64()),
        }
    )

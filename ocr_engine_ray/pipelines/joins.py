"""Join patterns over the driver tables — one pipeline per strategy.

The reference has no joins (SURVEY.md §2.6), but a training-data engine at
100 TB needs all four canonical shapes, each with a different shuffle story:

- ``mktsegment_revenue`` — **broadcast join**: the small side (customer dim)
  is ``ray.put`` once and read per worker; the big side streams through
  ``map_batches`` with a numpy/dict lookup.  No shuffle.
- ``brand_volume`` — **manual bucketed hash join**: both sides bucketed on
  ``key % B``, tagged, unioned, and joined bucket-by-bucket inside
  ``map_groups`` (pandas merge); partial aggregates leave each bucket so the
  final groupby moves only ``B × |brands|`` rows.  This is the portable
  pattern when both sides are too big to broadcast.
- ``order_priority_counts`` — **native hash join** (``Dataset.join``,
  hash-partitioned on the key) for engine parity with the built-in.
- ``clicks_last_purchase`` — **as-of join**: per-user-bucket
  ``pd.merge_asof`` over ts-sorted groups (the Ray Data idiom for
  time-ordered joins); DuckDB's ``ASOF JOIN`` is the oracle.
- ``order_event_window_join`` — **range (interval) join**: both sides
  co-partitioned on ``user % B``, per-bucket vectorized merge + interval
  filter; the oracle is a plain ``LEFT JOIN ... BETWEEN``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..sources.tables import sf_table
from .analytics import _cents

# Per-worker-process cache of deserialized broadcast objects: ``ray.get`` of
# a plain-Python object deserializes on every call, so task-mode lookups
# cache by ObjectRef (actor-mode stages cache naturally in ``__init__``).
# Bounded LRU (ordered dict, oldest evicted) so a long-lived worker running
# many queries doesn't accumulate every broadcast it ever saw.
_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


def _get_broadcast(ref):
    key = ref.hex()
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = _BROADCAST_CACHE.pop(key)  # refresh LRU order
    else:
        _BROADCAST_CACHE[key] = ray.get(ref)
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    return _BROADCAST_CACHE[key]


def mktsegment_revenue(sf_dir: str) -> rd.Dataset:
    """Total order revenue + order count per customer market segment
    (broadcast join: customer is the small side)."""
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).take_all()
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in cust}
    ref = ray.put(seg_of)

    def attach(batch: pa.Table) -> pa.Table:
        lookup = _get_broadcast(ref)
        # vectorized recode (Series.map over a dict) + inner-join semantics:
        # rows whose key misses the broadcast dim are dropped, matching SQL
        keys = pd.Series(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        segs = keys.map(lookup)
        hit = segs.notna().to_numpy()
        if not hit.all():
            batch = batch.filter(pa.array(hit))
            segs = segs[hit]
        return pa.table(
            {
                "c_mktsegment": pa.array(segs, pa.string()),
                "price_c": _cents(batch.column("o_totalprice")),
            }
        )

    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = orders.map_batches(attach, batch_format="pyarrow").groupby("c_mktsegment").aggregate(
        Sum("price_c", alias_name="price_c"), Count(alias_name="n_orders")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "total_revenue": pc.round(
                    pc.divide(batch.column("price_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
                "n_orders": batch.column("n_orders"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


NUM_JOIN_BUCKETS = 32


def brand_volume(sf_dir: str) -> rd.Dataset:
    """Lineitem volume per part brand (manual bucketed hash join).

    Schema-harmonized union of both sides, keyed by ``p_partkey % B``; each
    bucket joins independently and emits per-brand partials.
    """
    part = sf_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    line = sf_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def part_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("p_partkey").cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    keys.to_numpy(zero_copy_only=False) % NUM_JOIN_BUCKETS
                ).cast(pa.int32()),
                "key": keys,
                "p_brand": batch.column("p_brand"),
                "qty_c": pa.nulls(batch.num_rows, pa.int64()),
                "n": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        # map-side pre-aggregation by partkey BEFORE the bucket shuffle: the
        # shuffled fact rows shrink from |lineitem| to distinct-partkeys/batch
        t = pa.table(
            {
                "key": batch.column("l_partkey").cast(pa.int64()),
                "qty_c": _cents(batch.column("l_quantity")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        # Row count via sum(1), not ('qty_c','count'): pyarrow count skips
        # null quantities but the oracle's count(*) does not.
        agg = pa.TableGroupBy(t, "key").aggregate([("qty_c", "sum"), ("one", "sum")])
        keys = agg.column("key")
        return pa.table(
            {
                "bucket": pa.array(
                    keys.to_numpy(zero_copy_only=False) % NUM_JOIN_BUCKETS
                ).cast(pa.int32()),
                "key": keys,
                "p_brand": pa.nulls(agg.num_rows, pa.string()),
                "qty_c": agg.column("qty_c_sum").cast(pa.int64()),
                "n": agg.column("one_sum").cast(pa.int64()),
            }
        )

    # Large fact-side batches so the map-side pre-aggregation actually
    # shrinks the shuffle: at the default ~1k-row batches every key is near
    # unique and the pre-agg is a no-op; at 64k rows/batch the shuffled rows
    # collapse toward the distinct-partkey count.
    both = part.map_batches(part_side, batch_format="pyarrow").union(
        line.map_batches(line_side, batch_format="pyarrow", batch_size=65536)
    )

    _EMPTY_PARTIAL = pd.DataFrame(
        {
            "p_brand": pd.Series([], dtype="object"),
            "qty_c": pd.Series([], dtype="int64"),
            "n_items": pd.Series([], dtype="int64"),
        }
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or "qty_c" not in group.columns:
            return _EMPTY_PARTIAL  # typed empty: no schema-drift RefBundles
        # Discriminate sides on p_brand (dim rows carry it, fact rows don't):
        # qty_c can be legitimately null on a fact row whose quantities were
        # all NULL, so it is not a side marker.
        dim = group[group["p_brand"].notna()][["key", "p_brand"]]
        fact = group[group["p_brand"].isna()][["key", "qty_c", "n"]]
        j = fact.merge(dim, on="key", how="inner")
        out = j.groupby("p_brand", as_index=False).agg(
            qty_c=("qty_c", "sum"), n_items=("n", "sum")
        )
        out["qty_c"] = out["qty_c"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        return out

    partials = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    agg = partials.groupby("p_brand").aggregate(
        Sum("qty_c", alias_name="qty_c"), Sum("n_items", alias_name="n_items")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": batch.column("p_brand"),
                "total_qty": pc.round(
                    pc.divide(batch.column("qty_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
                "n_items": batch.column("n_items"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def order_priority_counts(sf_dir: str) -> rd.Dataset:
    """Order counts per (mktsegment, orderpriority) via the native
    hash-partitioned ``Dataset.join``."""
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return joined.groupby(["c_mktsegment", "o_orderpriority"]).aggregate(
        Count(alias_name="n_orders")
    )


def top_customers(sf_dir: str, *, k: int = 10) -> rd.Dataset:
    """Top-k customers by total order value (pre-aggregate → broadcast name
    lookup → sort+limit; c_custkey asc breaks ties)."""
    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "price_c": _cents(batch.column("o_totalprice")),
            }
        )

    per_cust = orders.map_batches(cents, batch_format="pyarrow").groupby(
        "o_custkey"
    ).aggregate(Sum("price_c", alias_name="price_c"), Count(alias_name="n_orders"))

    names = {
        r["c_custkey"]: r["c_name"]
        for r in sf_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).take_all()
    }
    ref = ray.put(names)

    def attach(batch: pa.Table) -> pa.Table:
        lookup = _get_broadcast(ref)
        keys = pd.Series(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        names_s = keys.map(lookup)
        hit = names_s.notna().to_numpy()
        if not hit.all():  # inner-join semantics on dirty keys
            batch = batch.filter(pa.array(hit))
            names_s = names_s[hit]
        return pa.table(
            {
                "c_custkey": batch.column("o_custkey").cast(pa.int64()),
                "c_name": pa.array(names_s, pa.string()),
                "total_spent": pc.round(
                    pc.divide(batch.column("price_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
                "n_orders": batch.column("n_orders"),
            }
        )

    return (
        per_cust.map_batches(attach, batch_format="pyarrow")
        .sort(["total_spent", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def inactive_customer_orders(sf_dir: str) -> rd.Dataset:
    """Anti join: orders from customers with NO events, counted per market
    segment.  The event-user key set is broadcast (at true scale: a Bloom
    filter of it) and the filter runs inside ``map_batches`` — no shuffle
    for the anti-join itself.
    """
    # distinct user_ids computed ON-CLUSTER (groupby-style aggregation inside
    # Dataset.unique); only the already-distinct — much smaller — set reaches
    # the driver for the broadcast.  NULL user_ids are dropped so the filter
    # matches SQL NOT IN semantics on clean keys (documented assumption: a
    # NULL in events.user_id would make SQL NOT IN return no rows at all).
    users = np.sort(
        np.array(
            [
                u
                for u in sf_table(sf_dir, "events", columns=["user_id"]).unique("user_id")
                if u is not None
            ],
            dtype=np.int64,
        )
    )
    seg_of = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in sf_table(
            sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
        ).take_all()
    }
    ref = ray.put((users, seg_of))

    def anti(batch: pa.Table) -> pa.Table:
        user_arr, segs = _get_broadcast(ref)
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized anti-membership via binary search on the sorted id array
        pos = np.searchsorted(user_arr, keys)
        pos_c = np.minimum(pos, len(user_arr) - 1) if len(user_arr) else pos
        is_member = (
            (user_arr[pos_c] == keys) if len(user_arr) else np.zeros(len(keys), bool)
        )
        t = batch.filter(pa.array(~is_member))
        seg_s = pd.Series(
            t.column("o_custkey").to_numpy(zero_copy_only=False)
        ).map(segs)
        hit = seg_s.notna().to_numpy()
        if not hit.all():  # inner-join semantics on the dim side
            t = t.filter(pa.array(hit))
            seg_s = seg_s[hit]
        return pa.table(
            {
                "c_mktsegment": pa.array(seg_s, pa.string()),
                "price_c": _cents(t.column("o_totalprice")),
            }
        )

    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = orders.map_batches(anti, batch_format="pyarrow").groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_orders": batch.column("n_orders"),
                "total_revenue": pc.round(
                    pc.divide(batch.column("price_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def clicks_last_purchase(sf_dir: str, *, num_buckets: int = 16) -> rd.Dataset:
    """As-of join: for every 'click' event, the ts of the same user's most
    recent 'purchase' at or before it (NULL when none).

    Partitioning assumption: rows are co-located per ``user_id % B`` bucket;
    ordering is restored by the in-group sort (order is data).  Returns the
    purchase *ts* (not id) so simultaneous purchases cannot make the result
    ambiguous.
    """
    ev = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"), value_set=pa.array(["click", "purchase"])
        )
        t = batch.filter(keep)
        b = (
            t.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            % num_buckets
        )
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int32)),
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
            }
        )

    def asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
        clicks = (
            group[group["event_type"] == "click"]
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        purch = (
            group[group["event_type"] == "purchase"]
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        if clicks.empty:
            # typed empty frame matching the non-empty branch's schema exactly
            # (dtypes taken from the group itself), so no RefBundle schema
            # drift reaches downstream operators
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=group["event_id"].dtype),
                    "last_purchase_ts": pd.Series([], dtype=group["ts"].dtype),
                }
            )
        j = pd.merge_asof(
            clicks[["event_id", "user_id", "ts"]],
            purch[["user_id", "ts"]].rename(columns={"ts": "last_purchase_ts"}),
            left_on="ts",
            right_on="last_purchase_ts",
            by="user_id",
            direction="backward",
        )
        return j[["event_id", "last_purchase_ts"]]

    return ev.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").map_groups(
        asof_bucket, batch_format="pandas"
    )


def order_event_window_join(
    sf_dir: str, *, days: int = 7, num_buckets: int = 16
) -> rd.Dataset:
    """Range join: per order, the count and cents-exact value sum of the
    same user's events with ``ts ∈ [o_orderdate, o_orderdate + days)``.

    Ray Data has no native interval join; the portable shape is the same
    bucketed co-partition the as-of join uses — both sides keyed by
    ``user % B``, one shuffle, then a vectorized pandas merge + interval
    filter per bucket.  Partitioning assumption: per-user row counts are
    bounded (events ~O(100)/user), so the in-bucket user cross product is
    small; a hot user would need salting + a second reduce.  SQL twin:
    ``LEFT JOIN ... ON user AND ts >= odate AND ts < odate + INTERVAL``.
    """
    orders = sf_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = sf_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def order_side(batch: pa.Table) -> pa.Table:
        user = batch.column("o_custkey").cast(pa.int64())
        b = user.to_numpy(zero_copy_only=False) % num_buckets
        n = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int32)),
                "user": user,
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "odate": batch.column("o_orderdate"),
                "ts": pa.nulls(n, batch.column("o_orderdate").type),
                "val_c": pa.nulls(n, pa.int64()),
            }
        )

    def event_side(batch: pa.Table) -> pa.Table:
        user = batch.column("user_id").cast(pa.int64())
        b = user.to_numpy(zero_copy_only=False) % num_buckets
        n = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int32)),
                "user": user,
                "okey": pa.nulls(n, pa.int64()),
                "odate": pa.nulls(n, batch.column("ts").type),
                "ts": batch.column("ts"),
                "val_c": _cents(batch.column("value")),
            }
        )

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        events.map_batches(event_side, batch_format="pyarrow")
    )

    def window_bucket(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group["okey"].notna()][["user", "okey", "odate"]]
        e = group[group["okey"].isna()][["user", "ts", "val_c"]]
        empty = pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "n_events_7d": pd.Series([], dtype="int64"),
                "value_cents_7d": pd.Series([], dtype="int64"),
            }
        )
        if len(o) == 0:
            return empty
        if len(e) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": o["okey"].astype("int64"),
                    "n_events_7d": 0,
                    "value_cents_7d": 0,
                }
            ).astype({"n_events_7d": "int64", "value_cents_7d": "int64"})
        m = o.merge(e, on="user", how="left")
        in_win = (m["ts"] >= m["odate"]) & (
            m["ts"] < m["odate"] + pd.Timedelta(days=days)
        )
        hits = m[in_win]
        agg = hits.groupby("okey").agg(
            n_events_7d=("ts", "count"), value_cents_7d=("val_c", "sum")
        )
        out = (
            o[["okey"]]
            .drop_duplicates()
            .set_index("okey")
            .join(agg)
            .fillna(0)
            .reset_index()
        )
        return pd.DataFrame(
            {
                "o_orderkey": out["okey"].astype("int64"),
                "n_events_7d": out["n_events_7d"].astype("int64"),
                "value_cents_7d": out["value_cents_7d"].astype("int64"),
            }
        )

    return both.groupby("bucket").map_groups(window_bucket, batch_format="pandas")


def nation_revenue(
    sf_dir: str,
    *,
    region: str = "ASIA",
    year_from: int = 1996,
    year_to: int = 1998,
    num_buckets: int = NUM_JOIN_BUCKETS,
) -> rd.Dataset:
    """TPC-H Q5 analog — the canonical MULTI-WAY join: local-supplier
    revenue per nation for one region and a date range
    (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier, keeping
    lineitems whose supplier sits in the customer's nation).

    One strategy per join, chosen by side size — the composition story a
    planner at 100 TB follows:

    - region ⋈ nation: driver-side (≤ |nations| rows), broadcast as the
      nationkey → name map;
    - supplier: broadcast suppkey → nationkey dict (suppliers are ~1e-4 of
      lineitem; past broadcast scale, reuse the bucketed shape below);
    - customer ⋈ orders: BUCKETED hash join on custkey (both corpus-sized
      at scale), emitting only (orderkey, c_nationkey) for region+date
      survivors;
    - ⋈ lineitem: map-side revenue pre-agg per (orderkey, supplier-nation)
      — the supplier lookup and the nation equality both evaluate INSIDE
      the map, so the second bucket shuffle moves pre-combined cents
      partials, never raw lineitems;
    - final ``groupby(nationkey)`` is |nations|-sized.

    Returns (n_name, revenue) sorted by revenue DESC, n_name — money summed
    as exact integer cents (`_cents` convention), rounded once at the end.
    """
    import datetime as dt

    lo = dt.datetime(year_from, 1, 1)
    hi = dt.datetime(year_to, 1, 1)

    # --- driver-side dims: nations of the region, suppkey -> nationkey ----
    reg = {
        r["r_regionkey"]
        for r in sf_table(sf_dir, "region").take_all()
        if r["r_name"] == region
    }
    region_nations = {
        r["n_nationkey"]: r["n_name"]
        for r in sf_table(sf_dir, "nation").take_all()
        if r["n_regionkey"] in reg
    }
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in sf_table(
            sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
        ).take_all()
    }
    nat_ref, sup_ref = ray.put(region_nations), ray.put(sup)

    # --- bucketed customer ⋈ orders on custkey -----------------------------
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = sf_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        rn = _get_broadcast(nat_ref)
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = np.isin(nk, np.fromiter(rn.keys(), dtype=np.int64))
        batch = batch.filter(pa.array(keep))
        keys = batch.column("c_custkey").cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    keys.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "key": keys,
                "nationkey": batch.column("c_nationkey").cast(pa.int64()),
                "orderkey": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        batch = batch.filter(
            pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        )
        keys = batch.column("o_custkey").cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    keys.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "key": keys,
                "nationkey": pa.nulls(batch.num_rows, pa.int64()),
                "orderkey": batch.column("o_orderkey").cast(pa.int64()),
            }
        )

    def merge_orders(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        c = df[df["orderkey"].isna()][["key", "nationkey"]]
        o = df[df["orderkey"].notna()][["key", "orderkey"]]
        j = o.merge(c, on="key", how="inner")
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "orderkey": j["orderkey"].astype("int64"),
                    "nationkey": j["nationkey"].astype("int64"),
                }
            ),
            preserve_index=False,
        ).replace_schema_metadata(None)

    order_nation = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(merge_orders, batch_format="pyarrow")
    )

    # --- lineitem: supplier-nation revenue partials per orderkey -----------
    line = sf_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def line_side(batch: pa.Table) -> pa.Table:
        rn, sp = _get_broadcast(nat_ref), _get_broadcast(sup_ref)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        snat = np.array([sp.get(int(s), -1) for s in sk], dtype=np.int64)
        keep = np.isin(snat, np.fromiter(rn.keys(), dtype=np.int64))
        if not keep.any():
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "orderkey": pa.array([], pa.int64()),
                    "nationkey": pa.array([], pa.int64()),
                    "rev_c": pa.array([], pa.int64()),
                }
            )
        sub = batch.filter(pa.array(keep))
        snat = snat[keep]
        rev = pc.multiply(
            sub.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), sub.column("l_discount")),
        )
        t = pa.table(
            {
                "orderkey": sub.column("l_orderkey").cast(pa.int64()),
                "nationkey": pa.array(snat),
                "rev_c": _cents(rev),
            }
        )
        agg = pa.TableGroupBy(t, ["orderkey", "nationkey"]).aggregate(
            [("rev_c", "sum")]
        )
        ok = agg.column("orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((ok % num_buckets).astype(np.int32)),
                "orderkey": agg.column("orderkey"),
                "nationkey": agg.column("nationkey"),
                "rev_c": agg.column("rev_c_sum").cast(pa.int64()),
            }
        )

    def order_key_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((ok % num_buckets).astype(np.int32)),
                "orderkey": batch.column("orderkey"),
                "nationkey": batch.column("nationkey"),
                "rev_c": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def merge_line(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        o = df[df["rev_c"].isna()][["orderkey", "nationkey"]]
        l = df[df["rev_c"].notna()]
        # local-supplier rule: lineitem's supplier nation == customer nation
        j = l.merge(o, on=["orderkey", "nationkey"], how="inner")
        if j.empty:
            return pa.table(
                {"nationkey": pa.array([], pa.int64()), "rev_c": pa.array([], pa.int64())}
            )
        g = j.groupby("nationkey", sort=False)["rev_c"].sum().reset_index()
        return pa.Table.from_pandas(
            g.astype({"nationkey": "int64", "rev_c": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    per_nation = (
        line.map_batches(line_side, batch_format="pyarrow", batch_size=65536)
        .union(order_nation.map_batches(order_key_side, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(merge_line, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        rn = _get_broadcast(nat_ref)
        names = [rn[int(k)] for k in batch.column("nationkey").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                # on-grid value (int cents / 100), so the default half-even
                # matches the twin's round() exactly — the mktsegment
                # convention
                "revenue": pc.round(
                    pc.divide(
                        batch.column("rev_c").cast(pa.float64()), pa.scalar(100.0)
                    ),
                    ndigits=2,
                ),
            }
        )

    return per_nation.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False]
    )


_SEMI_CHUNK_BYTES = 1 << 16  # 64 KiB bit-space chunks for the OR-reduce


def bloom_semi_join(
    sf_dir: str,
    *,
    priority: str = "1-URGENT",
    num_buckets: int = 32,
    fp_rate: float = 1e-3,
) -> rd.Dataset:
    """``lineitem ⋉ σ_priority(orders)`` via a RUNTIME FILTER — the
    Bloom-pushdown semi-join every distributed engine uses when the build
    side is too big to broadcast exactly but its bitmap fits anywhere.

    Scale shape (exchange payload tracks SELECTIVITY, not the fact table):

    1. build side: the filtered ``o_orderkey`` column stays on-cluster
       (``materialize()`` pins only this narrow projection); its Bloom is
       built DISTRIBUTED by the chunked-OR pattern (bit-space partitioned
       into 64 KiB chunks, one ``groupby(chunk)`` OR-reduce — same shape as
       the MinHash candidate bloom in ``dedup._distributed_bloom``), so
       driver state is the bitmap itself, never a key array;
    2. probe side: ONE map pass prunes lineitem by vectorized bloom
       membership — only bloom-positives (true matches + ``fp_rate`` of the
       misses) enter the exchange below; false negatives are impossible;
    3. exact verify: one key-bucket co-partition shuffle of the surviving
       candidates against the distinct build keys kills false positives
       (Bloom FPs cost wasted shuffle rows, never correctness), then a
       small groupby counts per return flag.

    Returns ``(l_returnflag, n_items)`` sorted by flag.
    """
    from ..functions.sketch import IntBloom

    B = num_buckets
    orders = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def keys_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("o_orderpriority"), priority))
        return pa.table({"key": t.column("o_orderkey")})

    keys = orders.map_batches(keys_only, batch_format="pyarrow").materialize()
    m_bits, k = IntBloom.sized_for(max(1, keys.count()), fp_rate=fp_rate)
    chunk_bits = _SEMI_CHUNK_BYTES * 8

    def positions(batch: pa.Table) -> pa.Table:
        ids = np.unique(
            batch.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        )
        pos = IntBloom.positions_for(ids, m_bits, k).ravel()
        return pa.table(
            {
                "chunk": pa.array((pos // chunk_bits).astype(np.int32)),
                "pos": pa.array((pos % chunk_bits).astype(np.int32)),
            }
        )

    def or_chunk(group: pa.Table) -> pa.Table:
        cid = int(group.column("chunk")[0].as_py())
        size = min(_SEMI_CHUNK_BYTES, m_bits // 8 - cid * _SEMI_CHUNK_BYTES)
        buf = np.zeros(size, dtype=np.uint8)
        pos = group.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        np.bitwise_or.at(buf, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table(
            {
                "chunk": pa.array([cid], pa.int32()),
                "bits": pa.array([buf.tobytes()], pa.binary()),
            }
        )

    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in (
        keys.map_batches(positions, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(or_chunk, batch_format="pyarrow")
        .take_all()
    ):
        cid = int(row["chunk"])
        buf = np.frombuffer(row["bits"], dtype=np.uint8)
        bits[cid * _SEMI_CHUNK_BYTES : cid * _SEMI_CHUNK_BYTES + len(buf)] |= buf
    bloom_ref = ray.put(IntBloom(bits, k))

    line = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def probe(batch: pa.Table) -> pa.Table:
        bloom = _get_broadcast(bloom_ref)
        ks = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(bloom.contains(ks)))
        kk = t.column("l_orderkey")
        return pa.table(
            {
                "bkt": pc.cast(
                    pc.subtract(kk, pc.multiply(pc.divide(kk, B), B)), pa.int64()
                ),
                "kind": pa.array(np.zeros(t.num_rows, np.int64)),
                "key": kk,
                "flag": t.column("l_returnflag"),
            }
        )

    def build_rows(batch: pa.Table) -> pa.Table:
        kk = batch.column("key")
        return pa.table(
            {
                "bkt": pc.cast(
                    pc.subtract(kk, pc.multiply(pc.divide(kk, B), B)), pa.int64()
                ),
                "kind": pa.array(np.ones(batch.num_rows, np.int64)),
                "key": kk,
                "flag": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        gk = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        members = np.unique(gk[kind == 1])
        cand = group.filter(pa.array(kind == 0))
        ck = cand.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        keep = (
            np.isin(ck, members) if len(members) else np.zeros(len(ck), dtype=bool)
        )
        return pa.table({"l_returnflag": cand.filter(pa.array(keep)).column("flag")})

    return (
        line.map_batches(probe, batch_format="pyarrow")
        .union(keys.map_batches(build_rows, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(verify, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n_items"))
        .sort("l_returnflag")
    )


SALT_FACTOR = 4


def segment_event_value(
    sf_dir: str,
    *,
    num_buckets: int = NUM_JOIN_BUCKETS,
    salt: int = SALT_FACTOR,
) -> rd.Dataset:
    """Event value per customer market segment via a SALTED bucketed hash
    join on ``user_id`` — the hot-key mitigation `diagnostics.skew_report`
    recommends, demonstrated end-to-end.

    In a plain bucketed join one hot user lands every one of its fact rows
    in a single ``map_groups`` task; at 100 TB that task is the straggler
    that sets the stage's wall-time.  Salting splits each key's FACT rows
    across ``salt`` sub-buckets (salt drawn from ``event_id``, never the
    key) and REPLICATES each dim row into all ``salt`` sub-buckets, so the
    composite group key ``(user_id % B) * salt + s`` bounds any one task at
    ~1/salt of the hottest key.  The join result is salt-invariant by
    construction (asserted in tests at salt ∈ {1, 4, 7}); the only cost is
    ``salt ×`` the (small) dim side in the exchange.

    Scale shape: map-side (key, salt) pre-aggregation shrinks the fact
    exchange to distinct-(user, salt) per 64k batch; per-bucket pandas
    merge emits per-segment partials; one tiny segment groupby finishes.
    Money is exact int cents end-to-end (`_cents_i64` grid).
    """
    from ..state.stream import _cents_i64

    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    events = sf_table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def dim_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").cast(pa.int64())
        kn = keys.to_numpy(zero_copy_only=False)
        # replicate each dim row into every salt sub-bucket
        rep = np.repeat(np.arange(len(kn)), salt)
        salts = np.tile(np.arange(salt, dtype=np.int64), len(kn))
        gk = (kn[rep] % num_buckets) * salt + salts
        seg = batch.column("c_mktsegment").take(pa.array(rep, pa.int64()))
        return pa.table(
            {
                "gk": pa.array(gk.astype(np.int64)),
                "key": pa.array(kn[rep]),
                "seg": seg,
                "cents": pa.nulls(len(rep), pa.int64()),
                "n": pa.nulls(len(rep), pa.int64()),
            }
        )

    def fact_side(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("user_id")))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "gk": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uid = batch.column("user_id").cast(pa.int64())
        eid = (
            batch.column("event_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "key": uid,
                # salt from the EVENT id: a function of the key alone would
                # re-concentrate the hot key into one sub-bucket
                "s": pa.array((eid % salt).astype(np.int64)),
                "cents": _cents_i64(batch.column("value")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        # map-side pre-agg BY (key, salt): shrinks the exchange and keeps
        # count(*) semantics via sum(1) (pyarrow count would skip null cents)
        agg = pa.TableGroupBy(t, ["key", "s"]).aggregate(
            [("cents", "sum"), ("one", "sum")]
        )
        kn = agg.column("key").to_numpy(zero_copy_only=False)
        sn = agg.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gk": pa.array((kn % num_buckets) * salt + sn),
                "key": agg.column("key"),
                "seg": pa.nulls(agg.num_rows, pa.string()),
                "cents": agg.column("cents_sum").cast(pa.int64()),
                "n": agg.column("one_sum").cast(pa.int64()),
            }
        )

    _EMPTY_PARTIAL = pd.DataFrame(
        {
            "seg": pd.Series([], dtype="object"),
            "cents": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or "seg" not in group.columns:
            return _EMPTY_PARTIAL
        dim = group[group["seg"].notna()][["key", "seg"]]
        fact = group[group["seg"].isna()][["key", "cents", "n"]]
        j = fact.merge(dim, on="key", how="inner")
        if len(j) == 0:
            return _EMPTY_PARTIAL
        out = j.groupby("seg", as_index=False).agg(
            cents=("cents", "sum"), n_events=("n", "sum")
        )
        out["cents"] = out["cents"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    partials = (
        cust.map_batches(dim_side, batch_format="pyarrow")
        .union(events.map_batches(fact_side, batch_format="pyarrow", batch_size=65536))
        .groupby("gk")
        .map_groups(join_bucket, batch_format="pandas")
    )
    agg = partials.groupby("seg").aggregate(
        Sum("cents", alias_name="cents"), Sum("n_events", alias_name="n_events")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("seg"),
                "n_events": batch.column("n_events"),
                "total_value": pc.round(
                    pc.divide(batch.column("cents").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


def customer_order_reconciliation(
    sf_dir: str, *, num_buckets: int = NUM_JOIN_BUCKETS
) -> rd.Dataset:
    """FULL OUTER join reconciliation of customers vs orders — the one
    join type this module did not yet cover (broadcast/bucketed inner,
    as-of, interval, anti, semi are above): for each presence class
    (key in both tables / customer without orders / order with a dangling
    custkey) the distinct-key count, order count, and exact order cents —
    the two-sided completeness report a migration or CDC apply runs.

    Scale shape: orders fold map-side to per-custkey partials (one row
    per distinct key per batch); both sides co-bucket by ``custkey % B``
    in ONE tagged union shuffle; each bucket classifies its keys with two
    sorted-array memberships and emits 3 partial rows; the global
    groupby moves 3 x buckets tiny rows.  Only OBSERVED classes appear
    (the twin's GROUP BY does the same).  Returns
    (presence, n_keys, n_orders, order_cents) sorted by presence.
    """
    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = sf_table(sf_dir, "customer", columns=["c_custkey"])

    def order_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("o_custkey").cast(pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "cents": _cents(batch.column("o_totalprice")),
            }
        )
        agg = pa.TableGroupBy(t, "k").aggregate([("n", "sum"), ("cents", "sum")])
        k = agg.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array((k % num_buckets).astype(np.int64)),
                "k": pa.array(k),
                "kind": pa.array(np.ones(len(k), dtype=np.int64)),
                "n": agg.column("n_sum").cast(pa.int64()),
                "cents": agg.column("cents_sum").cast(pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        k = batch.column("c_custkey").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        z = np.zeros(len(k), dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array((k % num_buckets).astype(np.int64)),
                "k": pa.array(k),
                "kind": pa.array(z),
                "n": pa.array(z),
                "cents": pa.array(z),
            }
        )

    def classify(group: pa.Table) -> pa.Table:
        k = group.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        cents = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        ck = np.unique(k[kind == 0])
        is_ord = kind == 1
        ok, on, oc = k[is_ord], n[is_ord], cents[is_ord]
        # order partials may repeat a key across batches: fold per key
        order = np.argsort(ok, kind="stable")
        ok, on, oc = ok[order], on[order], oc[order]
        uk, starts = np.unique(ok, return_index=True)
        ends = np.concatenate([starts[1:], [len(ok)]])
        un = np.add.reduceat(on, starts) if len(ok) else np.array([], np.int64)
        uc = np.add.reduceat(oc, starts) if len(ok) else np.array([], np.int64)
        in_c = np.isin(uk, ck)
        out = {"presence": [], "n_keys": [], "n_orders": [], "cents": []}
        both_keys = int(in_c.sum())
        if both_keys:
            out["presence"].append("both")
            out["n_keys"].append(both_keys)
            out["n_orders"].append(int(un[in_c].sum()))
            out["cents"].append(int(uc[in_c].sum()))
        cust_only = int(len(ck) - np.isin(ck, uk).sum())
        if cust_only:
            out["presence"].append("customer_only")
            out["n_keys"].append(cust_only)
            out["n_orders"].append(0)
            out["cents"].append(0)
        ord_only = int((~in_c).sum())
        if ord_only:
            out["presence"].append("order_only")
            out["n_keys"].append(ord_only)
            out["n_orders"].append(int(un[~in_c].sum()))
            out["cents"].append(int(uc[~in_c].sum()))
        return pa.table(
            {
                "presence": pa.array(out["presence"], pa.string()),
                "n_keys": pa.array(out["n_keys"], pa.int64()),
                "n_orders": pa.array(out["n_orders"], pa.int64()),
                "cents": pa.array(out["cents"], pa.int64()),
            }
        )

    return (
        orders.map_batches(order_side, batch_format="pyarrow", batch_size=65536)
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("presence")
        .aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("n_orders", alias_name="n_orders"),
            Sum("cents", alias_name="order_cents"),
        )
        .sort("presence")
    )


JS_DEPTH = 4
JS_WIDTH = 256


def join_size_estimate(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """JOIN-SIZE ESTIMATION — the query-planner primitive: the exact
    cardinality of ``orders ⋈ events ON o_custkey = user_id`` next to its
    Count-Min-sketch INNER-PRODUCT estimate (AMS/CMS join-size
    estimation: |R ⋈ S| ≤ min_j Σ_b C_R[j,b]·C_S[j,b], an upper bound
    that tightens with width) — so the surface pins the sketch algebra,
    the md5 hash kernel AND the exact bucketed-join count in one row.

    Scale shape: per-side per-batch key-count partials fold once by key
    hash bucket (exact side: Σ c_R·c_S inside the bucket that owns the
    key — ONE shuffle of distinct-key rows); the sketch side emits
    ≤ depth×width combined cells per batch and folds to a constant-size
    array.  Integer-only output (exact_rows, cms_estimate, err_ppm);
    the twin recomputes both wholesale with the
    ``cms_token_counts`` hash expression.
    """
    import hashlib

    from ray.data.aggregate import Sum

    sides = (
        ("orders", "o_custkey", sf_table(sf_dir, "orders", columns=["o_custkey"])),
        ("events", "user_id", sf_table(sf_dir, "events", columns=["user_id"])),
    )

    def partials(batch: pa.Table, *, col, side_ix) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False).astype("int64")
        uk, cnt = np.unique(keys, return_counts=True)
        # exact-side rows: (key-bucket, side, key, n)
        out_rows = {
            "kbkt": (uk % num_buckets).tolist(),
            "side": [side_ix] * len(uk),
            "key": uk.tolist(),
            "n": cnt.astype(np.int64).tolist(),
            "j": [-1] * len(uk),
            "b": [-1] * len(uk),
        }
        # sketch-side rows: (j, bucket) cells, combined in-batch
        cells: dict[tuple[int, int], int] = {}
        for k, c in zip(uk.tolist(), cnt.tolist()):
            kb = str(k).encode()
            for j in range(JS_DEPTH):
                hb = int(hashlib.md5(b"%d:" % j + kb).hexdigest()[:8], 16) % JS_WIDTH
                cells[(j, hb)] = cells.get((j, hb), 0) + int(c)
        for (j, hb), c in sorted(cells.items()):
            # sketch cells spread over negative buckets (same cell →
            # same bucket), so no single group holds the whole stream
            out_rows["kbkt"].append(-1 - ((j * JS_WIDTH + hb) % num_buckets))
            out_rows["side"].append(side_ix)
            out_rows["key"].append(-1)
            out_rows["n"].append(c)
            out_rows["j"].append(j)
            out_rows["b"].append(hb)
        return pa.table(
            {
                "kbkt": pa.array(out_rows["kbkt"], pa.int64()),
                "side": pa.array(out_rows["side"], pa.int64()),
                "key": pa.array(out_rows["key"], pa.int64()),
                "n": pa.array(out_rows["n"], pa.int64()),
                "j": pa.array(out_rows["j"], pa.int64()),
                "b": pa.array(out_rows["b"], pa.int64()),
            }
        )

    streams = [
        ds.map_batches(partials, batch_format="pyarrow",
                       fn_kwargs={"col": col, "side_ix": ix})
        for ix, (_, col, ds) in enumerate(sides)
    ]
    union = streams[0].union(streams[1])

    def bucket_product(group: pa.Table) -> pa.Table:
        kb = group.column("kbkt")[0].as_py()
        if kb < 0:  # sketch cells pass through folded per (side, j, b)
            t = pa.TableGroupBy(
                group.select(["side", "j", "b", "n"]), ["side", "j", "b"]
            ).aggregate([("n", "sum")])
            return pa.table(
                {
                    "kind": pa.array([1] * t.num_rows, pa.int64()),
                    "side": t.column("side"),
                    "j": t.column("j"),
                    "b": t.column("b"),
                    "v": t.column("n_sum").cast(pa.int64()),
                }
            )
        # exact side: Σ over keys of c_orders·c_events within this bucket
        keys = group.column("key").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        tot = 0
        c0: dict[int, int] = {}
        for k, s_, c in zip(keys.tolist(), side.tolist(), n.tolist()):
            if s_ == 0:
                c0[k] = c0.get(k, 0) + c
        for k, s_, c in zip(keys.tolist(), side.tolist(), n.tolist()):
            if s_ == 1 and k in c0:
                tot += c0[k] * c
        return pa.table(
            {
                "kind": pa.array([0], pa.int64()),
                "side": pa.array([-1], pa.int64()),
                "j": pa.array([-1], pa.int64()),
                "b": pa.array([-1], pa.int64()),
                "v": pa.array([tot], pa.int64()),
            }
        )

    rows = (
        union.groupby("kbkt")
        .map_groups(bucket_product, batch_format="pyarrow")
        .take_all()  # ≤ num_buckets + 2·depth·width rows
    )
    exact = sum(int(r["v"]) for r in rows if r["kind"] == 0)
    cms = np.zeros((2, JS_DEPTH, JS_WIDTH), dtype=np.int64)
    for r in rows:
        if r["kind"] == 1:
            cms[int(r["side"]), int(r["j"]), int(r["b"])] += int(r["v"])
    inner = (cms[0].astype(object) * cms[1].astype(object)).sum(axis=1)
    est = int(min(inner))
    err = (est - exact) * 1_000_000 // exact if exact else 0
    return rd.from_arrow(
        pa.table(
            {
                "exact_rows": pa.array([exact], pa.int64()),
                "cms_estimate": pa.array([est], pa.int64()),
                "err_ppm": pa.array([err], pa.int64()),
            }
        )
    )

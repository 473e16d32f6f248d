"""Relational/analytic pipelines over the driver tables.

These exercise the wide-operation layer of the engine (groupby/aggregate,
windowed aggregation, sessionization, sort+limit) with exact ANSI-SQL
oracles.  Float aggregates are rounded identically on both sides (the driver
compares value hashes; unrounded float sums differ in the last bits between
summation orders).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tables import sf_table



_HALF_AWAY = pc.RoundOptions(round_mode="half_towards_infinity")


def _cents(arr: pa.Array) -> pa.Array:
    """Exact integer cents: round(x*100) half-away (duckdb round semantics).
    Summing integers is order-independent — float sums are not, and the
    driver compares value hashes across different summation orders."""
    return pc.round(pc.multiply(arr, pa.scalar(100.0)), options=_HALF_AWAY).cast(pa.int64())


def _pricing_state(ds: rd.Dataset) -> rd.Dataset:
    """Mergeable integer-cents aggregate STATE of a lineitem slice:
    (flag, status) → qty_c/base_c/disc_c sums + count.  Exact integers, so
    states combine associatively (the materialized-view invariant
    ``incremental_pricing`` rides)."""

    def to_cents(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity")
        price = batch.column("l_extendedprice")
        rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_c": _cents(qty),
                "base_c": _cents(price),
                "disc_c": _cents(rev),
            }
        )

    return ds.map_batches(to_cents, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("base_c", alias_name="base_c"),
        Sum("disc_c", alias_name="disc_c"),
        Count(alias_name="count_order"),
    )


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-style pricing summary over lineitem.

    Vectorized per-batch revenue; money is summed as exact integer cents so
    the distributed sum matches the sequential SQL oracle bit-for-bit; tiny
    group cardinality keeps the shuffle to a few rows per block (Ray
    aggregates map-side first).
    """
    ds = sf_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return _pricing_state(ds).map_batches(_pricing_finish, batch_format="pyarrow")


def _pricing_finish(batch: pa.Table) -> pa.Table:
    cnt = batch.column("count_order").cast(pa.float64())
    sum_qty = pc.divide(batch.column("qty_c").cast(pa.float64()), pa.scalar(100.0))
    return pa.table(
        {
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pc.round(sum_qty, ndigits=2),
            "sum_base_price": pc.round(
                pc.divide(batch.column("base_c").cast(pa.float64()), pa.scalar(100.0)), ndigits=2
            ),
            "sum_disc_price": pc.round(
                pc.divide(batch.column("disc_c").cast(pa.float64()), pa.scalar(100.0)), ndigits=2
            ),
            # half-away, like DuckDB round(): the quotient CAN sit on a
            # binary midpoint (e.g. 25.0/8 = 3.125), where pc.round's
            # default half-to-even diverges; the cents/100 sites above
            # are immune (≤2 decimals exact) and keep the default.
            "avg_qty": pc.round(
                pc.divide(sum_qty, cnt),
                ndigits=2,
                round_mode="half_towards_infinity",
            ),
            "count_order": batch.column("count_order"),
        }
    )


def incremental_pricing(sf_dir: str, *, cutoff: str = "1997-06-01") -> rd.Dataset:
    """Materialized-view maintenance for the pricing summary: the
    lakehouse refresh path that AVOIDS rescanning the base — combine the
    view's stored aggregate STATE with the delta slice's state instead.

    Gated instance splits lineitem at ``l_shipdate < cutoff`` (the "already
    materialized" view) vs ``>= cutoff`` (the day's delta), computes each
    side's mergeable integer-cents state (`_pricing_state`), then merges by
    ONE tiny union+groupby over state rows (groups × blocks rows, never
    fact rows) and applies the same finish kernel.  Because the state is
    exact integers, the maintained view is BIT-IDENTICAL to the wholesale
    recompute — the twin is simply `pricing_summary`'s full-table SQL.  At
    production scale the view state is a stored table and only the delta
    is scanned; here both sides are derived from the split for the gate.
    """
    cut = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    ]
    ds = sf_table(sf_dir, "lineitem", columns=cols)

    def slice_side(keep_lt: bool):
        def inner(batch: pa.Table) -> pa.Table:
            m = pc.less(batch.column("l_shipdate"), cut)
            return batch.filter(m if keep_lt else pc.invert(m)).drop_columns(
                ["l_shipdate"]
            )

        return inner

    view_state = _pricing_state(ds.map_batches(slice_side(True), batch_format="pyarrow"))
    delta_state = _pricing_state(ds.map_batches(slice_side(False), batch_format="pyarrow"))
    merged = (
        view_state.union(delta_state)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("base_c", alias_name="base_c"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    return merged.map_batches(_pricing_finish, batch_format="pyarrow")


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value)."""
    ds = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour").cast(
            pa.timestamp("us")
        )
        return batch.append_column("hour", hour)

    def add_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": batch.column("hour"),
                "value_c": _cents(batch.column("value")),
            }
        )

    ds = ds.map_batches(add_window, batch_format="pyarrow").map_batches(
        add_cents, batch_format="pyarrow"
    )
    out = ds.groupby(["event_type", "hour"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value_c", alias_name="value_c"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": batch.column("hour").cast(pa.timestamp("us")),
                "n_events": batch.column("n_events"),
                "sum_value": pc.round(
                    pc.divide(batch.column("value_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding 60-minute windows every 30 minutes per event_type.

    Each event lands in exactly two windows (``floor30(ts)`` and
    ``floor30(ts) − 30min``); the per-batch flat-map emits both membership
    rows vectorized, then one small groupby aggregates.
    """
    ds = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode_windows(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch.column("ts"), multiple=30, unit="minute").cast(
            pa.timestamp("us")
        )
        prev = pc.subtract(base, pa.scalar(30 * 60 * 1_000_000, pa.duration("us")))
        et = batch.column("event_type")
        vc = _cents(batch.column("value"))
        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [et.combine_chunks(), et.combine_chunks()]
                ),
                "window_start": pa.concat_arrays(
                    [base.combine_chunks() if isinstance(base, pa.ChunkedArray) else base,
                     prev.combine_chunks() if isinstance(prev, pa.ChunkedArray) else prev]
                ),
                "value_c": pa.concat_arrays(
                    [vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc] * 2
                ),
            }
        )

    out = ds.map_batches(explode_windows, batch_format="pyarrow")
    agg = out.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value_c", alias_name="value_c")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": batch.column("window_start").cast(pa.timestamp("us")),
                "n_events": batch.column("n_events"),
                "sum_value": pc.round(
                    pc.divide(batch.column("value_c").cast(pa.float64()), pa.scalar(100.0)),
                    ndigits=2,
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(
    sf_dir: str, *, gap_minutes: int = 30, num_buckets: int = 32
) -> rd.Dataset:
    """Per-user sessionization (gap > ``gap_minutes`` starts a new session).

    Ray Data has no event-time windows; the idiom is a keyed shuffle +
    in-group ordered logic (order is data, restored by the in-group sort).
    Users are hash-bucketed so each ``map_groups`` call sessionizes a whole
    bucket of users vectorized — one Python call per bucket, not per user.
    """
    ds = sf_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((b % num_buckets).astype("int32"))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (~same_user) | (g["ts"].diff() > gap)
        g = g.assign(_new=new_session.astype("int64"))
        out = g.groupby("user_id", as_index=False).agg(
            n_events=("_new", "size"), n_sessions=("_new", "sum")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "n_sessions"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def session_paths_topk(
    sf_dir: str, *, gap_minutes: int = 30, k: int = 10, num_buckets: int = 32
) -> rd.Dataset:
    """Top-k full SESSION PATHS — each session's event types joined in
    order ('click>view>purchase') — the whole-journey complement of
    `event_transitions` (2-step) and `event_trigrams` (3-step): which
    complete visit shapes dominate, for funnel design and bot-pattern
    screening.

    Sessions are the `sessionize` gap rule verbatim (> ``gap_minutes``
    between consecutive events of a user, order ``ts, event_id``).
    Scale shape: ONE ``user_id % B`` bucket shuffle; each bucket builds
    its users' paths vectorized (sort + cumsum session ids + a single
    grouped join) and pre-counts them — the map-side combine — so the
    final path groupby moves <= distinct-paths x buckets rows.  A
    block-local top-k would be UNSOUND here (a path's count is split
    across user buckets), so the prune happens after the exact global
    fold: sort + limit over the distinct-path aggregate, total order
    (n DESC, path).  Returns (path, n) — ties broken by path asc.
    """
    ds = sf_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((b % num_buckets).astype("int32"))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (~same_user) | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        paths = (
            g.assign(_sid=sid)
            .groupby("_sid", sort=False)["event_type"]
            .agg(">".join)
        )
        out = paths.value_counts().rename_axis("path").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out[["path", "n"]]

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.sort(["n", "path"], descending=[True, False]).limit(k)


def top_sources(sf_dir: str, *, k: int = 5) -> rd.Dataset:
    """Top-k sources by total chars (sort + limit; source asc tiebreak)."""
    ds = sf_table(sf_dir, "documents", columns=["source", "n_chars"])
    agg = ds.groupby("source").aggregate(
        Sum("n_chars", alias_name="total_chars"), Count(alias_name="n_docs")
    )
    return agg.sort(["total_chars", "source"], descending=[True, False]).limit(k)


def grouped_topk(sf_dir: str, *, k: int = 3, num_buckets: int = 64) -> rd.Dataset:
    """Top-k orders per customer by (o_totalprice DESC, o_orderkey ASC),
    with the in-group rank — the distributed ``row_number() OVER
    (PARTITION BY ...) <= k`` without a global sort.

    Scale shape: each batch first prunes itself to <= k rows per customer
    seen in the batch (vectorized pandas sort + groupby.head — a map-side
    combiner, so the shuffle moves at most k rows per (customer, block)
    pair, not the whole table); the survivors are hash-bucketed by
    ``o_custkey % num_buckets`` and each bucket resolves its customers'
    final top-k in ONE vectorized call (the coarse-bucket pattern — a
    per-customer map_groups would be one Python call per customer).
    """
    ds = sf_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def _topk_frame(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = df.groupby("o_custkey", sort=False)
        df["rk"] = (g.cumcount() + 1).astype("int64")
        return df[df["rk"] <= k]

    def partial_prune(batch: pa.Table) -> pa.Table:
        df = _topk_frame(batch.to_pandas()).drop(columns=["rk"])
        df["_bkt"] = (df["o_custkey"] % num_buckets).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_topk(group: pa.Table) -> pa.Table:
        df = _topk_frame(group.to_pandas())
        return pa.Table.from_pandas(
            df[["o_custkey", "o_orderkey", "o_totalprice", "rk"]],
            preserve_index=False,
        )

    return (
        ds.map_batches(partial_prune, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )


def user_event_gaps(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Per-event previous-event timestamp and gap per user — the
    distributed ``lag() OVER (PARTITION BY user_id ORDER BY ts,
    event_id)``.

    Like ``stream_running_totals``: lag is order-local to the user, so a
    ``user_id % B`` bucket shuffle + in-bucket sort + vectorized pandas
    ``groupby.shift`` is exact with ONE all-to-all and no driver on the
    data path.  The gap is integer microseconds; each user's FIRST event
    (no predecessor) is dropped so the compared surface is null-free —
    the SQL twin applies the same ``prev_ts IS NOT NULL`` qualify.
    """
    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def bucketize(batch: pa.Table) -> pa.Table:
        import numpy as np

        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def bucket_lag(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        df["prev_ts"] = g["ts"].shift(1)
        df = df[df["prev_ts"].notna()]
        # exact integer microseconds, like DuckDB date_diff('microsecond'):
        # the float total_seconds() path loses ulps past ~104-day gaps
        gap = (df["ts"] - df["prev_ts"]).astype("timedelta64[us]").astype("int64")
        df = df.assign(gap_us=gap)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_lag, batch_format="pyarrow")
        .map_batches(
            lambda b: b.select(["event_id", "user_id", "ts", "prev_ts", "gap_us"]),
            batch_format="pyarrow",
        )
    )


def rollup_pricing(sf_dir: str) -> rd.Dataset:
    """Hierarchical ROLLUP aggregate over lineitem: revenue and row counts at
    (returnflag, linestatus), (returnflag), and grand-total levels — the
    multi-granularity summary a reporting layer derives in one pass.

    Scale shape: ONE distributed cents-integer aggregation at the finest
    level (map-side pre-aggregated by Ray's groupby, like pricing_summary);
    the coarser levels are derived from those k ≈ |flags|×|statuses| partial
    rows in a single tiny task — never a second scan.  Integer cents make
    every level's sum exact, so rounding at each level matches the SQL
    ``GROUP BY ROLLUP`` twin bit-for-bit.  NULL dimension values mark
    rolled-up levels, exactly like SQL.
    """
    ds = sf_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "rev_c": _cents(rev),
            }
        )

    fine = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev_c", alias_name="rev_c"), Count(alias_name="n_items"))
    )

    def rollup(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l1 = df.groupby("l_returnflag", as_index=False).agg(
            rev_c=("rev_c", "sum"), n_items=("n_items", "sum")
        )
        l1["l_linestatus"] = None
        l0 = pd.DataFrame(
            {
                "l_returnflag": [None],
                "l_linestatus": [None],
                "rev_c": [df["rev_c"].sum()],
                "n_items": [df["n_items"].sum()],
            }
        )
        out = pd.concat([df, l1, l0], ignore_index=True)[
            ["l_returnflag", "l_linestatus", "rev_c", "n_items"]
        ]
        out["sum_disc_price"] = (out["rev_c"] / 100.0).round(2)
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
                "sum_disc_price": pa.array(out["sum_disc_price"], pa.float64()),
                "n_items": pa.array(out["n_items"], pa.int64()),
            }
        )

    # The finest aggregate is k rows (k = flag×status cardinality) — one
    # block (materialized: count() below is then free metadata, no second
    # execution); the rollup derivation is a single small task, not a scan.
    fine = fine.materialize()
    if fine.count() == 0:
        # SQL ROLLUP over an empty table still emits the grand-total
        # grouping set (one all-NULL row, count 0) — match it.
        return rd.from_arrow(
            pa.table(
                {
                    "l_returnflag": pa.array([None], pa.string()),
                    "l_linestatus": pa.array([None], pa.string()),
                    "sum_disc_price": pa.array([None], pa.float64()),
                    "n_items": pa.array([0], pa.int64()),
                }
            )
        )
    return fine.repartition(1).map_batches(
        rollup, batch_format="pyarrow", batch_size=None
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(
    sf_dir: str,
    *,
    stages: tuple[str, ...] = FUNNEL_STAGES,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Ordered funnel analysis (product-analytics classic): for every user
    with at least one ``stages[0]`` event, the greedy first-occurrence walk
    through the stage sequence — ``t1 = min ts of stage 1``, ``t_k = min ts
    of stage k strictly after t_{k-1}`` — plus how many stages the user
    completed.  Strictly ordered (a click BEFORE the first view does not
    count), which is exactly what the chained min-after-join SQL twin
    expresses.

    Scale shape: the funnel is order-local to the user, so ONE
    ``user_id % B`` bucket shuffle of the narrow (user_id, ts, event_type)
    projection — events of other types are dropped BEFORE the shuffle —
    then a vectorized per-bucket kernel: sort by (user, ts), one
    ``np.minimum.reduceat`` per stage over a sentinel-masked timestamp
    array.  No driver on the data path; same shape as `user_event_gaps`.

    Returns (user_id, t_view, t_click, t_purchase, stages_completed)
    sorted by user_id; missing stages are NULL timestamps.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    stage_list = list(stages)
    _INF = np.int64(2**62)

    def bucketize(batch: pa.Table) -> pa.Table:
        # contract: rows with null user/ts are ignored (is_in also drops
        # null event_type — its result is null there and filter drops it)
        keep = pc.and_(
            pc.is_in(batch.column("event_type"), value_set=pa.array(stage_list)),
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            ),
        )
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def bucket_funnel(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        tsv = (
            group.column("ts").combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        enc = pc.dictionary_encode(group.column("event_type").combine_chunks())
        codes = np.asarray(enc.indices, dtype=np.int64)
        code_of = {t: i for i, t in enumerate(enc.dictionary.to_pylist())}
        order = np.lexsort((tsv, uid))
        uid, tsv, codes = uid[order], tsv[order], codes[order]
        new = (
            np.concatenate([[True], uid[1:] != uid[:-1]])
            if len(uid)
            else np.array([], bool)
        )
        starts = np.nonzero(new)[0]
        run_id = np.cumsum(new) - 1
        users = uid[starts]
        n_users = len(users)
        prev = np.full(n_users, -_INF, dtype=np.int64)  # stage-0 threshold
        stage_times: list[np.ndarray] = []
        for k, st in enumerate(stage_list):
            sc = code_of.get(st, -1)
            cand = np.where(
                (codes == sc) & (tsv > prev[run_id]), tsv, _INF
            )
            tk = (
                np.minimum.reduceat(cand, starts)
                if len(starts)
                else np.empty(0, np.int64)
            )
            stage_times.append(tk)
            prev = tk  # users that missed stage k carry _INF: nothing later
        found1 = stage_times[0] < _INF
        users = users[found1]
        cols: dict[str, pa.Array] = {"user_id": pa.array(users, pa.int64())}
        completed = np.zeros(len(users), dtype=np.int64)
        for k, st in enumerate(stage_list):
            tk = stage_times[k][found1]
            ok = tk < _INF
            completed += ok
            cols[f"t_{st}"] = pa.array(
                np.where(ok, tk, 0), pa.int64()
            ).cast(pa.timestamp("us"))
            # null out the missing stages
            cols[f"t_{st}"] = pc.if_else(
                pa.array(ok), cols[f"t_{st}"], pa.nulls(len(users), pa.timestamp("us"))
            )
        cols["stages_completed"] = pa.array(completed, pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_funnel, batch_format="pyarrow")
        .sort("user_id")
    )


def cohort_retention(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Weekly cohort retention (the analytics classic paired with
    `event_funnel`): users are cohorted by the ISO week of their FIRST
    event; for every (cohort_week, week_offset) cell, how many cohort
    members were active that many weeks later.

    Scale shape: per-batch map-side distinct of the narrow (user, week)
    projection, ONE ``user_id % B`` bucket shuffle (first-week and active
    weeks are user-local), per-bucket vectorized cell partials, then a
    cells-sized groupby sum (weeks x offsets — tiny at any corpus).

    Week truncation is DuckDB's ``date_trunc('week', ts)`` — Monday 00:00
    — computed in integer day arithmetic (1970-01-01 was a Thursday), so
    the twin matches exactly.  Returns (cohort_week, week_offset, n_users)
    sorted by (cohort_week, week_offset).
    """
    import numpy as np

    US_PER_DAY = 86_400_000_000

    ds = sf_table(sf_dir, "events", columns=["user_id", "ts"])

    def user_weeks(batch: pa.Table) -> pa.Table:
        # contract: rows with null user/ts are ignored
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        tsv = batch.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = np.floor_divide(tsv, US_PER_DAY)
        monday = day - (day + 3) % 7  # 1970-01-01 = Thursday; Monday-trunc
        wk = monday * US_PER_DAY
        # distinct (user, wk) via lexsort + adjacent mask — exact at any
        # week range (a scalar composite key would need week-index bounds)
        # and measurably faster than np.unique(axis=0)'s row-view sort
        order = np.lexsort((wk, uid))
        su, sw = uid[order], wk[order]
        first = (
            np.concatenate([[True], (su[1:] != su[:-1]) | (sw[1:] != sw[:-1])])
            if len(su)
            else np.array([], bool)
        )
        su, sw = su[first], sw[first]
        return pa.table(
            {
                "user_id": pa.array(su),
                "wk": pa.array(sw),
                "_bkt": pa.array((su % num_buckets).astype(np.int32)),
            }
        )

    def bucket_cells(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        wk = group.column("wk").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        # distinct (user, wk) pairs may repeat across input batches
        keep = np.concatenate([[True], (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])]) if len(uid) else np.array([], bool)
        uid, wk = uid[keep], wk[keep]
        new = np.concatenate([[True], uid[1:] != uid[:-1]]) if len(uid) else np.array([], bool)
        starts = np.nonzero(new)[0]
        run_id = np.cumsum(new) - 1
        cohort = wk[starts][run_id]  # first (minimum) week per user
        offset = (wk - cohort) // (7 * US_PER_DAY)
        # cell counts via lexsort + reduceat (the shared fold idiom)
        corder = np.lexsort((offset, cohort))
        sc, so = cohort[corder], offset[corder]
        cfirst = (
            np.concatenate([[True], (sc[1:] != sc[:-1]) | (so[1:] != so[:-1])])
            if len(sc)
            else np.array([], bool)
        )
        cstarts = np.nonzero(cfirst)[0]
        cnt = (
            np.diff(np.concatenate([cstarts, [len(sc)]]))
            if len(sc)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "cohort_us": pa.array(sc[cstarts] if len(sc) else sc),
                "week_offset": pa.array(so[cstarts] if len(so) else so),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = ds.map_batches(user_weeks, batch_format="pyarrow").materialize()
    # Compact a SMALL distinct-(user, week) set out of the read's block
    # layout before the two groupby shuffles — the dedup-module lesson:
    # hundreds of tiny blocks pay per-block fixed costs ~10x the data
    # (measured at 10M events: groupby over 312 tiny blocks 6.3 s vs
    # 1.4 s over 8; the downstream cells groupby inherits the narrow
    # layout too).  4M rows x 3 int64 cols < 100 MB — trivially
    # repartitionable; bigger pair sets keep their parallelism.
    if pairs.count() < 4_000_000 and pairs.num_blocks() > 8:
        pairs = pairs.repartition(8).materialize()
    cells = (
        pairs.groupby("_bkt")
        .map_groups(bucket_cells, batch_format="pyarrow")
        .groupby(["cohort_us", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_us").cast(pa.timestamp("us")),
                "week_offset": batch.column("week_offset").cast(pa.int64()),
                "n_users": batch.column("n_users").cast(pa.int64()),
            }
        )

    return cells.map_batches(finish, batch_format="pyarrow").sort(
        ["cohort_week", "week_offset"]
    )


def event_transitions(sf_dir: str, *, num_buckets: int = 64) -> pa.Table:
    """Per-user event-type transition matrix — the Markov-chain view of the
    event stream (next-action modeling, funnel-drop diagnosis, anomalous-
    sequence mining): for every ordered (prev_type -> next_type) pair of
    CONSECUTIVE events of one user (order = ``ts, event_id``), the global
    transition count, the prev-type outgoing total, and the transition
    probability in exact integer parts-per-million (``n * 1e6 //
    out_total`` — integer floor on both sides, no float anywhere).

    Scale shape: transitions are user-local, so ONE ``user_id % B`` bucket
    shuffle co-locates each user's stream; per-bucket vectorized
    sort + shift produces pair PARTIALS (<= |types|^2 rows per bucket — the
    map-side combine), and a tiny global groupby sums them.  The final
    probability join runs on the driver over the |types|^2-sized result —
    constant-size at any corpus, the `source_vocab_overlap` convention.

    Returns (prev_type, next_type, n, out_total, p_ppm) sorted by
    (prev_type, next_type); rows with null user/ts are ignored (none in the
    driver tables — defensive, same contract as `cohort_retention`).
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("ts")))
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = df.groupby("user_id", sort=False)["event_type"].shift(-1)
        ok = nxt.notna()
        part = (
            pd.DataFrame({"prev_type": df["event_type"][ok], "next_type": nxt[ok]})
            .groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = sorted(
        ((r["prev_type"], r["next_type"], int(r["n"])) for r in agg.take_all())
    )
    out_tot: dict[str, int] = {}
    for p, _, n in rows:
        out_tot[p] = out_tot.get(p, 0) + n
    return pa.table(
        {
            "prev_type": pa.array([r[0] for r in rows], pa.string()),
            "next_type": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "out_total": pa.array([out_tot[r[0]] for r in rows], pa.int64()),
            "p_ppm": pa.array(
                [r[2] * 1_000_000 // out_tot[r[0]] for r in rows], pa.int64()
            ),
        }
    )


def event_trigrams(sf_dir: str, *, num_buckets: int = 64) -> pa.Table:
    """Per-user 3-step event-type paths — the path-mining extension of
    `event_transitions` (which 2-step Markov view misses: 'click ->
    view -> purchase' vs 'view -> click -> purchase' have identical
    bigrams but different intents).  For every three CONSECUTIVE events
    of one user (order = ``ts, event_id``, the `event_transitions`
    convention), the global path count and its share of all trigrams in
    exact integer ppm (floor on both sides).

    Scale shape: identical to `event_transitions` — ONE ``user_id % B``
    bucket shuffle, per-bucket vectorized sort + double shift folding to
    <= |types|^3 partial rows per bucket, tiny global groupby; the
    result is constant-size at any corpus.  Returns (t1, t2, t3, n,
    p_ppm) sorted by (t1, t2, t3).
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("ts")))
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def bucket_triples(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"]
        n2 = g.shift(-1)
        n3 = g.shift(-2)
        ok = n3.notna()  # implies n2 notna (shift -1 of same group)
        part = (
            pd.DataFrame(
                {"t1": df["event_type"][ok], "t2": n2[ok], "t3": n3[ok]}
            )
            .groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_triples, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = sorted(
        ((r["t1"], r["t2"], r["t3"], int(r["n"])) for r in agg.take_all())
    )
    total = sum(r[3] for r in rows)
    return pa.table(
        {
            "t1": pa.array([r[0] for r in rows], pa.string()),
            "t2": pa.array([r[1] for r in rows], pa.string()),
            "t3": pa.array([r[2] for r in rows], pa.string()),
            "n": pa.array([r[3] for r in rows], pa.int64()),
            "p_ppm": pa.array(
                [r[3] * 1_000_000 // max(total, 1) for r in rows], pa.int64()
            ),
        }
    )


def weekday_seasonality(sf_dir: str) -> rd.Dataset:
    """Day-of-week seasonal indices of event revenue — the decomposition
    `theil_sen_daily` (trend) and `weekly_trends` (WoW deltas) leave out:
    how far each weekday's MEAN daily revenue sits from the all-days mean,
    as an exact integer ppm ratio (no float anywhere):
        idx_ppm = (Σcents_wd · n_all · 10^6) // (n_wd · Σcents_all).

    Scale shape: ONE day-keyed aggregate folds the event stream to the
    calendar-sized daily table (constant at any corpus size); the weekday
    fold and cross-multiplied ratios run on the driver in exact Python
    ints.  Returns (isodow, n_days, cents, idx_ppm) for the observed
    weekdays, isodow 1 = Monday (ISO, DuckDB ``isodow``).
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
    per_wd: dict[int, list[int]] = {}
    for r in daily:
        wd = r["day"].weekday() + 1  # ISO: Monday = 1
        a = per_wd.setdefault(wd, [0, 0])
        a[0] += 1
        a[1] += int(r["cents"])
    n_all = sum(a[0] for a in per_wd.values())
    s_all = sum(a[1] for a in per_wd.values())
    wds = sorted(per_wd)
    return rd.from_arrow(
        pa.table(
            {
                "isodow": pa.array(wds, pa.int64()),
                "n_days": pa.array([per_wd[w][0] for w in wds], pa.int64()),
                "cents": pa.array([per_wd[w][1] for w in wds], pa.int64()),
                "idx_ppm": pa.array(
                    [
                        per_wd[w][1] * n_all * 1_000_000 // (per_wd[w][0] * s_all)
                        if per_wd[w][0] * s_all > 0
                        else 0
                        for w in wds
                    ],
                    pa.int64(),
                ),
            }
        )
    )


def user_active_coverage(
    sf_dir: str, *, window_min: int = 30, num_buckets: int = 64
) -> rd.Dataset:
    """Per-user interval-union coverage (islands-and-gaps): every event
    opens a ``[ts, ts + W)`` activity window; overlapping/touching windows
    merge, and each user reports the merged-island count and the total
    covered microseconds — the activity-coverage metric behind engagement
    scoring and session-budget planning (and the same merge a storage
    compactor runs over row-group ranges).

    Scale shape: islands are user-local, so ONE ``user_id % B`` bucket
    shuffle co-locates each user's windows; per-bucket the merge is fully
    vectorized (sort by (user, start, end), per-user running max of end via
    ``groupby.cummax``, island id = cumsum of gap starts) — no per-user
    Python.  Output (user_id, n_islands, covered_us) sorted by user_id;
    exact integer microseconds end-to-end.
    """
    import numpy as np

    w_us = window_min * 60_000_000

    ds = sf_table(sf_dir, "events", columns=["user_id", "ts"])

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("ts")))
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        s = (
            batch.column("ts")
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "user_id": pa.array(uid),
                "s": pa.array(s),
                "e": pa.array(s + w_us),
                "_bkt": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    def bucket_merge(group: pa.Table) -> pa.Table:
        df = group.select(["user_id", "s", "e"]).to_pandas()
        df = df.sort_values(["user_id", "s", "e"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        prev_max = g["e"].cummax().shift(1)
        first = ~df["user_id"].duplicated()
        new_island = first | (df["s"] > prev_max.where(~first, -1))
        gid = new_island.cumsum()
        isl = df.assign(gid=gid).groupby(["user_id", "gid"], sort=False).agg(
            st=("s", "min"), en=("e", "max")
        )
        out = (
            isl.assign(cov=isl["en"] - isl["st"])
            .groupby("user_id", sort=False)
            .agg(n_islands=("cov", "size"), covered_us=("cov", "sum"))
            .reset_index()
            .astype("int64")
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_merge, batch_format="pyarrow")
        .sort("user_id")
    )


def cube_pricing(sf_dir: str) -> rd.Dataset:
    """Full GROUP BY CUBE over (returnflag, ship-year): all four grouping
    sets — (flag, year), (flag), (year), () — the cross-dimensional pivot a
    BI layer materializes; `rollup_pricing`'s hierarchical cousin.

    Same scale shape: ONE distributed cents aggregation at the finest
    granularity (map-side pre-aggregated), all coarser sets derived from
    those |flags|×|years| rows in a single tiny task.  NULLs mark the
    rolled-up dimensions; the year is an int64 so the NULL marker keeps the
    twin's BIGINT dtype.
    """
    ds = sf_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "ship_year": pc.year(batch.column("l_shipdate")).cast(pa.int64()),
                "rev_c": _cents(rev),
            }
        )

    fine = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "ship_year"])
        .aggregate(Sum("rev_c", alias_name="rev_c"), Count(alias_name="n_items"))
    ).materialize()
    if fine.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "l_returnflag": pa.array([None], pa.string()),
                    "ship_year": pa.array([None], pa.int64()),
                    "sum_disc_price": pa.array([None], pa.float64()),
                    "n_items": pa.array([0], pa.int64()),
                }
            )
        )

    def cube(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        by_flag = df.groupby("l_returnflag", as_index=False).agg(
            rev_c=("rev_c", "sum"), n_items=("n_items", "sum")
        )
        by_flag["ship_year"] = pd.array([pd.NA] * len(by_flag), dtype="Int64")
        by_year = df.groupby("ship_year", as_index=False).agg(
            rev_c=("rev_c", "sum"), n_items=("n_items", "sum")
        )
        by_year["l_returnflag"] = None
        total = pd.DataFrame(
            {
                "l_returnflag": [None],
                "ship_year": pd.array([pd.NA], dtype="Int64"),
                "rev_c": [df["rev_c"].sum()],
                "n_items": [df["n_items"].sum()],
            }
        )
        out = pd.concat([df, by_flag, by_year, total], ignore_index=True)[
            ["l_returnflag", "ship_year", "rev_c", "n_items"]
        ]
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "ship_year": pa.array(out["ship_year"], pa.int64()),
                "sum_disc_price": pa.array(
                    (out["rev_c"] / 100.0).round(2), pa.float64()
                ),
                "n_items": pa.array(out["n_items"], pa.int64()),
            }
        )

    return fine.repartition(1).map_batches(
        cube, batch_format="pyarrow", batch_size=None
    )


def time_weighted_value(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Per-user TIME-WEIGHTED average of ``value`` (last-observation-
    carried-forward integral between consecutive events) — the metric
    semantics behind billing meters, utilization dashboards and feature
    stores, where a plain mean over-weights bursty periods.

    Exactness: value becomes integer cents, inter-event gaps integer
    SECONDS (floor of the microsecond gap), and the average is one integer
    floor-division of exact sums — cents×seconds products stay far below
    2^63 at any per-user history this engine shards (documented bound:
    2e4 cents × 3e7 s × 1e4 events ≈ 6e18 needs per-user histories past
    ~10k dense years to overflow).  Users with fewer than two events have
    no interval and are excluded, like the twin's ``next_ts IS NOT NULL``.

    ONE user-bucket shuffle; per-bucket vectorized sort + shift (the
    `user_event_gaps` shape).  Returns (user_id, total_dur_s, twa_cents)
    sorted by user_id.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("ts")))
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": pa.array(uid),
                "ts_us": batch.column("ts").combine_chunks().cast(pa.int64()),
                "cents": _cents(batch.column("value")),
                "_bkt": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    def bucket_twa(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts_us", "cents"]).to_pandas()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        nxt = g["ts_us"].shift(-1)
        ok = nxt.notna()
        dur_s = ((nxt[ok] - df["ts_us"][ok]).astype("int64")) // 1_000_000
        seg = pd.DataFrame(
            {
                "user_id": df["user_id"][ok],
                "dur_s": dur_s,
                "wsum": df["cents"][ok] * dur_s,
            }
        )
        agg = seg.groupby("user_id", sort=False).agg(
            total_dur_s=("dur_s", "sum"), wsum=("wsum", "sum")
        )
        agg["twa_cents"] = agg["wsum"] // agg["total_dur_s"].clip(lower=1)
        out = agg.reset_index()[["user_id", "total_dur_s", "twa_cents"]].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_twa, batch_format="pyarrow")
        .sort("user_id")
    )


def resample_hourly_ffill(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """Per-user hourly RESAMPLE with forward fill — the gap-filling shape
    that turns an irregular event stream into a regular time grid (feature
    stores / time-series training data).  For each user, every hour from
    their first to their last event carries the running last non-null
    value (exact int cents) observed at or before that hour's final event;
    hours with no events inherit the previous hour's value; hours before
    the first non-null observation stay NULL.

    Scale shape: ONE user-bucket co-partition shuffle, then everything is
    vectorized pandas inside the bucket (sort → running ffill → last row
    per hour → arange-built grid → merge → grouped ffill).  Output is
    grid-sized (Σ per-user spans), never corpus²; per-user span bounds a
    bucket's memory the same way a user's event count already does in
    `sessionize`.

    Returns (user_id, hr, last_cents) sorted by (user_id, hr); twin is the
    generate_series × last_value(IGNORE NULLS) window SQL.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    HOUR_US = 3_600_000_000

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        uid = batch.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "bkt": pa.array(
                    uid.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "user_id": uid,
                "ts_us": batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "cents": _cents(batch.column("value")),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "hr_us": pd.Series([], dtype="int64"),
            "last_cents": pd.Series([], dtype="Int64"),
        }
    )

    def fill_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return _EMPTY
        df = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        # running last-non-null cents per user in event order
        df["run"] = df.groupby("user_id")["cents"].ffill()
        df["hr"] = df["ts_us"] // HOUR_US
        per_hr = df.groupby(["user_id", "hr"], as_index=False)["run"].last()
        # per-user inclusive hour bounds → arange-built grid (no Python loop)
        b = per_hr.groupby("user_id", as_index=False)["hr"].agg(["min", "max"])
        mn = b["min"].to_numpy(dtype=np.int64)
        counts = (b["max"].to_numpy(dtype=np.int64) - mn + 1).astype(np.int64)
        uid_rep = np.repeat(b["user_id"].to_numpy(dtype=np.int64), counts)
        offs = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        grid = pd.DataFrame({"user_id": uid_rep, "hr": np.repeat(mn, counts) + offs})
        g = grid.merge(per_hr, on=["user_id", "hr"], how="left")
        filled = g.groupby("user_id")["run"].ffill()
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "hr_us": (g["hr"] * HOUR_US).astype("int64"),
                "last_cents": filled.round().astype("Int64"),
            }
        )
        return out

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "hr": batch.column("hr_us").cast(pa.timestamp("us")),
                "last_cents": batch.column("last_cents").cast(pa.int64()),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("bkt")
        .map_groups(fill_bucket, batch_format="pandas")
        .map_batches(finish, batch_format="pyarrow")
        .sort(["user_id", "hr"])
    )


def scd2_event_type_history(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """SCD Type-2 change history: collapse each user's event stream into
    validity intervals of its ``event_type`` attribute — one row per run of
    consecutive equal values, ``valid_from`` = the run's first event ts,
    ``valid_to`` = the next run's ``valid_from`` (NULL on the open, current
    run) — the temporal-versioning shape a warehouse dimension build needs
    (`merge.snapshot_diff` covers version-to-version CDC; this covers
    within-stream history).

    Scale shape: ONE user-bucket co-partition shuffle; inside the bucket
    the run detection is a vectorized shift-compare + cumsum (no Python
    row loop), the per-run fold is a pandas groupby, and ``valid_to`` is a
    grouped shift(-1).  Output is run-count-sized.  NULL event_types
    compare via a sentinel, matching the twin's IS DISTINCT FROM.

    Returns (user_id, seg_id, event_type, valid_from, valid_to, n_events)
    sorted by (user_id, seg_id); seg_id is 1-based per user.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        uid = batch.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "bkt": pa.array(
                    uid.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "user_id": uid,
                "ts": batch.column("ts").cast(pa.timestamp("us")),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "seg_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "valid_from": pd.Series([], dtype="datetime64[us]"),
            "valid_to": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )

    _NULL_SENTINEL = "\x00<null>"

    def runs_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return _EMPTY
        df = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = df["event_type"].fillna(_NULL_SENTINEL)
        new_user = df["user_id"].ne(df["user_id"].shift())
        chg = new_user | et.ne(et.shift())
        df = df.assign(seg_id=chg.groupby(df["user_id"]).cumsum().astype("int64"))
        agg = df.groupby(["user_id", "seg_id"], as_index=False).agg(
            event_type=("event_type", "first"),
            valid_from=("ts", "first"),
            n_events=("ts", "size"),
        )
        agg["valid_to"] = agg.groupby("user_id")["valid_from"].shift(-1)
        return agg[
            ["user_id", "seg_id", "event_type", "valid_from", "valid_to", "n_events"]
        ].astype({"n_events": "int64"})

    return (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("bkt")
        .map_groups(runs_bucket, batch_format="pandas")
        .sort(["user_id", "seg_id"])
    )


def rolling_active_users(
    sf_dir: str, *, window_days: int = 7, num_buckets: int = 32
) -> rd.Dataset:
    """Rolling 7-day distinct active users per day (the WAU curve): for
    every day present in the stream, the EXACT count of distinct users
    with ≥1 event in the trailing ``window_days`` window.

    Exact windowed COUNT(DISTINCT) without a distinct-over-window engine
    primitive, in ONE shuffle: events co-partition on ``user_id % B``;
    inside the bucket everything is numpy — dedupe (day, user), expand
    each pair to the ≤``window_days`` window-end days it supports, dedupe
    (window_day, user) again (a user active twice in a window counts
    once), emit per-day partial counts.  Distinct users never collide
    across buckets (the bucket key IS the user), so bucket partials sum
    exactly; the final groupby moves days × buckets tiny rows.  Window-end
    days are restricted to days that actually occur (matching the twin's
    join against the observed-day set) via a broadcast of the ≤ span-sized
    day list.

    Returns (day, active_users) sorted by day; twin is the day-grid ×
    BETWEEN join SQL.
    """
    import numpy as np
    import ray

    ev = sf_table(sf_dir, "events", columns=["user_id", "ts"])
    DAY_US = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // DAY_US
        )
        # per-batch (day, user) dedupe before the exchange
        u = np.unique(np.stack([uid, day], axis=1), axis=0)
        return pa.table(
            {
                "bkt": pa.array((u[:, 0] % num_buckets).astype(np.int32)),
                "user_id": pa.array(u[:, 0]),
                "day": pa.array(u[:, 1]),
            }
        )

    pairs = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    # the observed-day set (span-sized: one row per distinct day) — the only
    # driver-held state, broadcast once
    days_tbl = pairs.groupby("day").aggregate(Count(alias_name="n")).take_all()
    days = np.array(sorted(r["day"] for r in days_tbl), dtype=np.int64)
    days_ref = ray.put(days)

    def window_partials(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        dset = ray.get(days_ref)
        u = np.unique(
            np.stack(
                [
                    group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False),
                    group.column("day").combine_chunks().to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        uid = np.repeat(u[:, 0], window_days)
        w = np.repeat(u[:, 1], window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(u)
        )
        keep = np.isin(w, dset)
        uw = np.unique(np.stack([uid[keep], w[keep]], axis=1), axis=0)
        wdays, counts = np.unique(uw[:, 1], return_counts=True)
        return pa.table(
            {"day": pa.array(wdays), "n": pa.array(counts.astype(np.int64))}
        )

    agg = (
        pairs.groupby("bkt")
        .map_groups(window_partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="active_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False) * DAY_US
        return pa.table(
            {
                "day": pa.array(d.astype("datetime64[us]")),
                "active_users": batch.column("active_users").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("day")


def debounce_events(
    sf_dir: str, *, gap_us: int = 300_000_000, num_buckets: int = 32
) -> rd.Dataset:
    """Event DEBOUNCE: drop repeats of the same (user, event_type) arriving
    within ``gap_us`` (5 min default) of the previous KEPT-OR-DROPPED
    occurrence — the lag-gap hygiene filter (bot bursts, double clicks)
    an event pipeline runs before sessionization.  Note the semantics are
    lag-based (gap to the immediately PRECEDING event, kept or not), which
    is exactly `lag(ts) OVER (PARTITION BY user_id, event_type ...)` — the
    SQL-twin-able variant of throttling.

    ONE user-bucket co-partition shuffle ((user, type) pairs never split
    across buckets), vectorized shift-compare inside.  Returns the kept
    (event_id, user_id, ts) rows sorted by event_id.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("user_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        uid = batch.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "bkt": pa.array(
                    uid.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": uid,
                "ts": batch.column("ts").cast(pa.timestamp("us")),
                "event_type": batch.column("event_type"),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
        }
    )

    def keep_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return _EMPTY
        df = group.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        same = df["user_id"].eq(df["user_id"].shift()) & df["event_type"].eq(
            df["event_type"].shift()
        ) & df["event_type"].notna() & df["event_type"].shift().notna()
        # null event_type partitions: SQL PARTITION BY groups NULLs together
        both_null = (
            df["user_id"].eq(df["user_id"].shift())
            & df["event_type"].isna()
            & df["event_type"].shift().isna()
        )
        same = same | both_null
        # exact integer µs gap (the float total_seconds() path can drift a
        # microsecond vs the twin's timestamp subtraction — ADVICE r3)
        tsu = df["ts"].astype("int64")
        gap = tsu - tsu.shift(fill_value=0)
        keep = ~same | (gap > gap_us)
        out = df[keep][["event_id", "user_id", "ts"]]
        return out.reset_index(drop=True)

    return (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("bkt")
        .map_groups(keep_bucket, batch_format="pandas")
        .sort("event_id")
    )


def moving_event_stats(sf_dir: str, *, frame: int = 7) -> rd.Dataset:
    """Bounded-frame moving window: per (event_type, day), the day's count
    and exact-cents value plus the trailing ``frame``-row sums (ROWS 6
    PRECEDING .. CURRENT over observed days) — the moving-average /
    burst-baseline shape, complementing the UNBOUNDED frames in
    `stream_running_totals`.

    The heavy lifting is the daily pre-aggregation (one groupby of
    types × days tiny rows out of the corpus scan); the rolling sums run
    per type on span-bounded groups via cumsum differences — exact int64,
    no float rolling kernels.  Returns (event_type, day, n_events,
    value_cents, n_7d, cents_7d) sorted by (event_type, day); twin is the
    bounded ROWS window SQL.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        day = pc.floor_temporal(batch.column("ts"), unit="day").cast(pa.timestamp("us"))
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "cents": _cents(batch.column("value")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    daily = (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "day"])
        .aggregate(Sum("one", alias_name="n_events"), Sum("cents", alias_name="value_cents"))
    )

    _EMPTY = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64()),
            "n_7d": pa.array([], pa.int64()),
            "cents_7d": pa.array([], pa.int64()),
        }
    )

    def roll(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return _EMPTY
        df = group.sort_values("day", kind="mergesort").reset_index(drop=True)
        n = df["n_events"].fillna(0).astype("int64").to_numpy()
        c = df["value_cents"].fillna(0).astype("int64").to_numpy()
        cn, cc = np.cumsum(n), np.cumsum(c)
        shift_n = np.concatenate([[0] * min(frame, len(n)), cn[:-frame] if len(n) > frame else []]).astype(np.int64)
        shift_c = np.concatenate([[0] * min(frame, len(c)), cc[:-frame] if len(c) > frame else []]).astype(np.int64)
        df["n_7d"] = (cn - shift_n).astype("int64")
        df["cents_7d"] = (cc - shift_c).astype("int64")
        df["n_events"] = df["n_events"].astype("int64")
        # all-null day: the daily SUM is NULL in the twin — preserve it
        # (the trailing sums above already 0-fill, matching window-SUM
        # null-skipping).  Emit an EXPLICIT Arrow schema: the pandas
        # round-trip otherwise drifts to datetime64[s] / Int64 dtypes and
        # the compare sees a schema mismatch on identical values.
        return pa.table(
            {
                "event_type": pa.array(df["event_type"].astype(str), pa.string()),
                "day": pa.Array.from_pandas(
                    df["day"].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "n_events": pa.array(df["n_events"].to_numpy(), pa.int64()),
                "value_cents": pa.Array.from_pandas(
                    df["value_cents"].astype("Int64"), type=pa.int64()
                ),
                "n_7d": pa.array(df["n_7d"].to_numpy(), pa.int64()),
                "cents_7d": pa.array(df["cents_7d"].to_numpy(), pa.int64()),
            }
        )

    return (
        daily.groupby("event_type")
        .map_groups(roll, batch_format="pandas")
        .sort(["event_type", "day"])
    )


PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_user_event_counts(sf_dir: str) -> rd.Dataset:
    """PIVOT: reshape the long (user, event_type) stream into one wide row
    per user with a count column per type — the feature-vector layout a
    model join consumes (long→wide is the reshape half the engine was
    missing next to `cube_pricing`'s wide→summary).

    Map-side: each batch folds to per-user count VECTORS (numpy add.at
    into a users × types matrix — the pivot happens before the exchange,
    so the shuffle moves one row per user per batch, already wide); the
    groupby then just sums the typed columns.  Unknown types are counted
    in ``n_other`` so schema stays fixed (the twin's ELSE bucket).

    Returns (user_id, n_click, n_error, n_purchase, n_signup, n_view,
    n_other) sorted by user_id; twin is FILTER-aggregate SQL.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["user_id", "event_type"])
    tmap = {t: i for i, t in enumerate(PIVOT_EVENT_TYPES)}
    other = len(PIVOT_EVENT_TYPES)

    def widen(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("user_id")))
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_pylist()
        cols = np.array([tmap.get(t, other) for t in et], dtype=np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        mat = np.zeros((len(uu), other + 1), dtype=np.int64)
        np.add.at(mat, (inv, cols), 1)
        out = {"user_id": pa.array(uu)}
        for i, t in enumerate(PIVOT_EVENT_TYPES):
            out[f"n_{t}"] = pa.array(mat[:, i])
        out["n_other"] = pa.array(mat[:, other])
        return pa.table(out)

    aggs = [
        Sum(f"n_{t}", alias_name=f"n_{t}") for t in PIVOT_EVENT_TYPES
    ] + [Sum("n_other", alias_name="n_other")]
    agg = (
        ev.map_batches(widen, batch_format="pyarrow", batch_size=65536)
        .groupby("user_id")
        .aggregate(*aggs)
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch.column("user_id").cast(pa.int64())}
        for t in PIVOT_EVENT_TYPES:
            cols[f"n_{t}"] = batch.column(f"n_{t}").cast(pa.int64())
        cols["n_other"] = batch.column("n_other").cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount")


def unpivot_lineitem_measures(sf_dir: str) -> rd.Dataset:
    """UNPIVOT (melt): the wide lineitem measure columns into long
    (measure, value) form, then the per-measure summary — the inverse
    reshape of `pivot_user_event_counts`, proving both directions of the
    long↔wide pair.

    The melt is a per-batch column stack (pure Arrow take/concat — rows ×
    measures long rows never leave the batch: the summary fold happens
    map-side and only measure-count partials reach the exchange).  Money
    stays exact int cents.  Returns (measure, n_values, n_nulls,
    sum_cents) sorted by measure; twin is the UNION-ALL melt SQL.
    """
    import numpy as np

    ds = sf_table(sf_dir, "lineitem", columns=list(UNPIVOT_MEASURES))

    def melt_fold(batch: pa.Table) -> pa.Table:
        names, nv, nn, sc = [], [], [], []
        for m in UNPIVOT_MEASURES:
            col = batch.column(m)
            n_null = int(pc.sum(pc.is_null(col).cast(pa.int8())).as_py() or 0)
            cents = _cents(col.cast(pa.float64()))
            s = pc.sum(cents).as_py() or 0
            names.append(m)
            nv.append(batch.num_rows - n_null)
            nn.append(n_null)
            sc.append(int(s))
        return pa.table(
            {
                "measure": pa.array(names, pa.string()),
                "n_values": pa.array(nv, pa.int64()),
                "n_nulls": pa.array(nn, pa.int64()),
                "sum_cents": pa.array(sc, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(melt_fold, batch_format="pyarrow", batch_size=65536)
        .groupby("measure")
        .aggregate(
            Sum("n_values", alias_name="n_values"),
            Sum("n_nulls", alias_name="n_nulls"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "measure": batch.column("measure"),
                "n_values": batch.column("n_values").cast(pa.int64()),
                "n_nulls": batch.column("n_nulls").cast(pa.int64()),
                "sum_cents": batch.column("sum_cents").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("measure")


ATTRIBUTION_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days


def last_touch_attribution(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Last-touch marketing attribution: each purchase is credited to the
    SAME user's most recent click STRICTLY before it and within a 7-day
    lookback window (the standard conversion-credit rule).

    Tie rules are total: "most recent" = max (ts, event_id) among
    qualifying clicks; an equal-timestamp click does NOT qualify (strict
    <).  The gap is exact integer microseconds.  Purchases with no
    qualifying click are dropped so the compared surface is null-free
    (the `user_event_gaps` convention — DuckDB's pandas bridge would
    otherwise float-ify a nullable BIGINT).

    Scale shape: clicks and purchases ride one column-pruned filtered
    scan; a ``user_id % B`` bucket shuffle co-locates each user, and the
    per-bucket kernel is a vectorized sorted-merge (groupby-ffill of the
    click frontier onto purchase rows) — ONE all-to-all, no driver on the
    data path.  Returns (event_id, user_id, ts, click_event_id, click_ts,
    gap_us) for every purchase, sorted by event_id.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("event_type"), pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def attribute(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        # order clicks AFTER purchases at equal ts so "strictly before"
        # falls out of the frontier shift; among clicks, (ts, event_id)
        # ascending makes the frontier the max qualifying click
        df["_is_click"] = (df["event_type"] == "click").astype("int8")
        df = df.sort_values(
            ["user_id", "ts", "_is_click", "event_id"], kind="mergesort"
        )
        click_id = df["event_id"].where(df["_is_click"] == 1)
        click_ts = df["ts"].where(df["_is_click"] == 1)
        df["click_event_id"] = click_id.groupby(df["user_id"], sort=False).ffill()
        df["click_ts"] = click_ts.groupby(df["user_id"], sort=False).ffill()
        out = df[(df["event_type"] == "purchase") & df["click_ts"].notna()].copy()
        gap = (out["ts"] - out["click_ts"]).astype("timedelta64[us]").astype("int64")
        out = out.assign(gap_us=gap)
        out = out[out["gap_us"] <= ATTRIBUTION_WINDOW_US]
        out["click_event_id"] = out["click_event_id"].astype("int64")
        return pa.Table.from_pandas(
            out[["event_id", "user_id", "ts", "click_event_id", "click_ts", "gap_us"]],
            preserve_index=False,
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(attribute, batch_format="pyarrow")
        .sort("event_id")
    )


def weekly_trends(sf_dir: str) -> rd.Dataset:
    """Week-over-week trend deltas per event type: each observed ISO week's
    exact counts/cents plus the deltas against the type's PREVIOUS observed
    week — the reporting-layer trend surface next to `moving_event_stats`'
    bounded frames.  A type's first observed week has no predecessor and is
    dropped (the null-free-surface convention).

    Scale shape: the corpus collapses map-side into (type, week) partials
    (one groupby of types × weeks tiny rows); the lag runs per type on the
    aggregate rows in a trivially small task.  Week truncation is the
    integer Monday arithmetic shared with `cohort_retention`, matching
    ``date_trunc('week', ts)`` exactly.

    Returns (event_type, week, n_events, value_cents, delta_n,
    delta_cents) sorted by (event_type, week).
    """
    import numpy as np

    US_PER_DAY = 86_400_000_000
    ev = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        tsv = batch.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = np.floor_divide(tsv, US_PER_DAY)
        monday = day - (day + 3) % 7  # 1970-01-01 = Thursday; Monday-trunc
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "wk": pa.array(monday * US_PER_DAY),
                "cents": _cents(batch.column("value")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    weekly = (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "wk"])
        .aggregate(
            Sum("one", alias_name="n_events"), Sum("cents", alias_name="value_cents")
        )
    )

    def lag(group: pd.DataFrame) -> pa.Table:
        df = group.sort_values("wk", kind="mergesort").reset_index(drop=True)
        n = df["n_events"].astype("int64")
        c = df["value_cents"].fillna(0).astype("int64")
        prev_n, prev_c = n.shift(1), c.shift(1)
        keep = prev_n.notna()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"][keep].astype(str), pa.string()),
                "week": pa.array(
                    df["wk"][keep].astype("int64").to_numpy(), pa.timestamp("us")
                ),
                "n_events": pa.array(n[keep].to_numpy(), pa.int64()),
                "value_cents": pa.array(c[keep].to_numpy(), pa.int64()),
                "delta_n": pa.array(
                    (n[keep] - prev_n[keep]).astype("int64").to_numpy(), pa.int64()
                ),
                "delta_cents": pa.array(
                    (c[keep] - prev_c[keep]).astype("int64").to_numpy(), pa.int64()
                ),
            }
        )

    return (
        weekly.groupby("event_type")
        .map_groups(lag, batch_format="pandas")
        .sort(["event_type", "week"])
    )


def props_field_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured payload extraction: pull the integer ``k`` field
    out of the JSON ``props`` column with ONE Arrow RE2 kernel per batch
    (the vectorized path for fixed-shape JSON — a full parser is only
    needed for polymorphic payloads) and aggregate per event type.
    Events whose props carry no integer ``k`` count as misses, not
    errors.

    Shuffle-free map + one types-sized aggregate.  Returns (event_type,
    n_events, n_with_k, k_sum, k_min, k_max) sorted by event_type —
    exact int64 everywhere; identical RE2 twin.
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        props = pc.fill_null(batch.column("props").combine_chunks(), "")
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        valid = pc.is_valid(m)
        ks = pc.if_else(
            valid, pc.cast(pc.struct_field(m, "k"), pa.int64(), safe=False), None
        )
        df = pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": ks,
                "has_k": valid,
            }
        ).to_pandas()
        g = df.groupby("event_type", sort=False)
        out = g.agg(
            n_events=("k", "size"),
            n_with_k=("has_k", "sum"),
            k_sum=("k", lambda s: int(s.dropna().sum())),
            k_min=("k", "min"),
            k_max=("k", "max"),
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(out["event_type"].astype(str), pa.string()),
                "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
                "n_with_k": pa.array(out["n_with_k"].to_numpy(np.int64)),
                "k_sum": pa.array(out["k_sum"].to_numpy(np.int64)),
                "k_min": pa.Array.from_pandas(out["k_min"], type=pa.int64()),
                "k_max": pa.Array.from_pandas(out["k_max"], type=pa.int64()),
            }
        )

    agg = (
        ev.map_batches(extract, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_with_k", alias_name="n_with_k"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "n_with_k": batch.column("n_with_k").cast(pa.int64()),
                "k_sum": batch.column("k_sum").cast(pa.int64()),
                "k_min": batch.column("k_min").cast(pa.int64()),
                "k_max": batch.column("k_max").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("event_type")


FUNNEL_PCTS = (50, 90)


def funnel_latency_quantiles(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Exact conversion-latency percentiles per funnel stage pair
    (view→click, click→purchase, view→purchase): the time-to-convert
    distribution a product team reads next to `event_funnel`'s counts.
    Percentile rank is pinned to ``k = max(1, ceil(q·N))``-th smallest
    (the `winsorized_pricing` convention — no interpolation ambiguity),
    over exact integer-µs gaps.

    Scale shape: the funnel walk itself is the existing one-shuffle
    bucketed kernel; gaps ride a (pair, 63−bit_length(gap)) range bucket
    — monotone in the gap, so bucket order IS value order — and the
    selection is the two-pass distributed rank: per-bucket counts give
    exclusive offsets, each bucket emits only its rank-k50/k90 hits.  No
    global sort, no whole-pair task.

    Returns (stage_pair, n, p50_us, p90_us) sorted by stage_pair.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Count

    funnel = event_funnel(sf_dir, num_buckets=num_buckets)

    def gaps(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_pair, out_gap = [], []
        for a, b, name in (
            ("t_view", "t_click", "view->click"),
            ("t_click", "t_purchase", "click->purchase"),
            ("t_view", "t_purchase", "view->purchase"),
        ):
            sel = df[a].notna() & df[b].notna()
            g = (df.loc[sel, b] - df.loc[sel, a]).astype("timedelta64[us]")
            out_pair.extend([name] * int(sel.sum()))
            out_gap.extend(g.astype("int64").tolist())
        gap = np.array(out_gap, dtype=np.int64)
        vb = 63 - np.frompyfunc(int.bit_length, 1, 1)(
            np.maximum(gap, 1).astype(object)
        ).astype(np.int64)
        return pa.table(
            {
                "stage_pair": pa.array(out_pair, pa.string()),
                "gap_us": pa.array(gap),
                "vbkt": pa.array(vb),
            }
        )

    gapped = funnel.map_batches(gaps, batch_format="pyarrow").materialize()
    parts = (
        gapped.groupby(["stage_pair", "vbkt"]).aggregate(Count(alias_name="m")).take_all()
    )
    # bucket order: 63 - bit_length DESCENDS as gap grows, so ascending
    # gap order = DESCENDING vbkt — accumulate offsets in that order
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["stage_pair"], -r["vbkt"])):
        offsets[(r["stage_pair"], r["vbkt"])] = totals.get(r["stage_pair"], 0)
        totals[r["stage_pair"]] = totals.get(r["stage_pair"], 0) + r["m"]
    import math

    ks = {
        p: {s: max(1, math.ceil(p / 100.0 * n)) for s, n in totals.items()}
        for p in FUNNEL_PCTS
    }
    ref = ray.put((offsets, ks))

    def select(group: pa.Table) -> pa.Table:
        off, kk = ray.get(ref)
        pair = group.column("stage_pair")[0].as_py()
        base = off[(pair, int(group.column("vbkt")[0].as_py()))]
        g = group.column("gap_us").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        rows = []
        for p in FUNNEL_PCTS:
            k = kk[p][pair]
            local = k - base
            if 1 <= local <= len(g):
                rows.append((pair, p, int(g[order[local - 1]])))
        if not rows:
            return pa.table(
                {
                    "stage_pair": pa.array([], pa.string()),
                    "pct": pa.array([], pa.int64()),
                    "value": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "stage_pair": pa.array([r[0] for r in rows], pa.string()),
                "pct": pa.array([r[1] for r in rows], pa.int64()),
                "value": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    hits = (
        gapped.groupby(["stage_pair", "vbkt"])
        .map_groups(select, batch_format="pyarrow")
        .take_all()
    )  # ≤ pairs × pcts rows
    by_pair: dict[str, dict[int, int]] = {}
    for r in hits:
        by_pair.setdefault(r["stage_pair"], {})[r["pct"]] = r["value"]
    pairs = sorted(totals)
    return rd.from_arrow(
        pa.table(
            {
                "stage_pair": pa.array(pairs, pa.string()),
                "n": pa.array([totals[p] for p in pairs], pa.int64()),
                "p50_us": pa.array([by_pair[p][50] for p in pairs], pa.int64()),
                "p90_us": pa.array([by_pair[p][90] for p in pairs], pa.int64()),
            }
        )
    )


def linear_attribution(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Linear multi-touch attribution: every click of the same user
    strictly before a purchase and within the 7-day window shares the
    conversion credit equally — the multi-touch counterpart of
    `last_touch_attribution`.  Credit is exact integer ppm: each
    qualifying click gets ``⌊10⁶/k⌋`` and the MOST RECENT one also takes
    the remainder, so every purchase's credit sums to exactly 10⁶.

    Scale shape: one ``user_id % B`` bucket shuffle; the per-user kernel
    finds each purchase's click window with two ``searchsorted`` probes
    (no pair materialization beyond the bounded window) and folds
    credits per click in-task — a click's credits are complete inside
    its user, so no second shuffle exists.  Returns (click_event_id,
    user_id, n_purchases, credit_ppm_total) sorted by click_event_id;
    window-join twin.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"), pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def credit(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        out_cid, out_uid, out_np, out_cr = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            cl = g[g["event_type"] == "click"].sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            pu = g[g["event_type"] == "purchase"]
            if not len(cl) or not len(pu):
                continue
            cts = cl["ts"].to_numpy()
            cid = cl["event_id"].to_numpy()
            n_pur = np.zeros(len(cl), dtype=np.int64)
            cr = np.zeros(len(cl), dtype=np.int64)
            for pts in pu["ts"].to_numpy():
                lo = np.searchsorted(cts, pts - np.timedelta64(7, "D"), side="left")
                hi = np.searchsorted(cts, pts, side="left")
                k = hi - lo
                if k <= 0:
                    continue
                base = 1_000_000 // k
                n_pur[lo:hi] += 1
                cr[lo:hi] += base
                cr[hi - 1] += 1_000_000 % k  # remainder to the most recent
            sel = n_pur > 0
            out_cid.extend(cid[sel].tolist())
            out_uid.extend([int(uid)] * int(sel.sum()))
            out_np.extend(n_pur[sel].tolist())
            out_cr.extend(cr[sel].tolist())
        return pa.table(
            {
                "click_event_id": pa.array(out_cid, pa.int64()),
                "user_id": pa.array(out_uid, pa.int64()),
                "n_purchases": pa.array(out_np, pa.int64()),
                "credit_ppm_total": pa.array(out_cr, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(credit, batch_format="pyarrow")
        .sort("click_event_id")
    )


def u_shaped_attribution(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution: the
    FIRST and LAST qualifying click each take 40% of a purchase's credit
    and the middle clicks split the remaining 20% — the third standard
    rule beside `last_touch_attribution` and `linear_attribution`.

    Exact ppm with conservation: k=1 → 10⁶; k=2 → 500 000 each; k≥3 →
    first 400 000, last 400 000, each middle ⌊200 000/(k−2)⌋ with the
    remainder to the LATEST middle — every purchase distributes exactly
    10⁶.  Window/tie rules are identical to the other two (strictly
    before, ≤7 days, order by (ts, event_id)).

    Same one-shuffle scale shape as `linear_attribution` (searchsorted
    windows, in-user credit fold).  Returns (click_event_id, user_id,
    n_purchases, credit_ppm_total) sorted by click_event_id;
    window-function twin.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"), pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def credit(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        out_cid, out_uid, out_np, out_cr = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            cl = g[g["event_type"] == "click"].sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            pu = g[g["event_type"] == "purchase"]
            if not len(cl) or not len(pu):
                continue
            cts = cl["ts"].to_numpy()
            cid = cl["event_id"].to_numpy()
            n_pur = np.zeros(len(cl), dtype=np.int64)
            cr = np.zeros(len(cl), dtype=np.int64)
            for pts in pu["ts"].to_numpy():
                lo = np.searchsorted(cts, pts - np.timedelta64(7, "D"), side="left")
                hi = np.searchsorted(cts, pts, side="left")
                k = hi - lo
                if k <= 0:
                    continue
                n_pur[lo:hi] += 1
                if k == 1:
                    cr[lo] += 1_000_000
                elif k == 2:
                    cr[lo] += 500_000
                    cr[hi - 1] += 500_000
                else:
                    cr[lo] += 400_000
                    cr[hi - 1] += 400_000
                    mid = 200_000 // (k - 2)
                    cr[lo + 1 : hi - 1] += mid
                    cr[hi - 2] += 200_000 - mid * (k - 2)  # remainder
            sel = n_pur > 0
            out_cid.extend(cid[sel].tolist())
            out_uid.extend([int(uid)] * int(sel.sum()))
            out_np.extend(n_pur[sel].tolist())
            out_cr.extend(cr[sel].tolist())
        return pa.table(
            {
                "click_event_id": pa.array(out_cid, pa.int64()),
                "user_id": pa.array(out_uid, pa.int64()),
                "n_purchases": pa.array(out_np, pa.int64()),
                "credit_ppm_total": pa.array(out_cr, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(credit, batch_format="pyarrow")
        .sort("click_event_id")
    )


def value_drift_audit(sf_dir: str) -> rd.Dataset:
    """Drift audit over the daily value stream per event type: the
    Kolmogorov–Smirnov-style maximum deviation between the RUNNING value
    total and a perfectly uniform accrual — where the metric's mass
    shifted (campaign start, instrumentation change, seasonality break).
    On exact integers: with daily cents ``d_j``, running total ``R_j``,
    grand total ``T`` over ``N`` days, the deviation is
    ``D_j = |N·R_j − j·T|`` (the cross-multiplied form of
    |R_j/T − j/N|) — no division anywhere; the reported day is the
    EARLIEST argmax.

    Scale shape: the corpus collapses map-side into (type, day) partials;
    the cumsum scan runs per type over days-sized aggregate rows.
    Returns (event_type, n_days, total_cents, max_dev, drift_day) sorted
    by event_type; window twin.
    """
    import numpy as np

    US_PER_DAY = 86_400_000_000
    ev = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        tsv = batch.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = np.floor_divide(tsv, US_PER_DAY) * US_PER_DAY
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pa.array(day),
                "cents": _cents(batch.column("value")),
            }
        )

    daily = (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "day"])
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def scan(group: pd.DataFrame) -> pa.Table:
        df = group.sort_values("day", kind="mergesort").reset_index(drop=True)
        c = df["cents"].fillna(0).astype("int64").to_numpy()
        n = len(c)
        total = int(c.sum())
        r = np.cumsum(c)
        j = np.arange(1, n + 1, dtype=np.int64)
        # Python ints: N·R and j·T can exceed int64 at corpus scale
        dev = [abs(n * int(rv) - int(jj) * total) for rv, jj in zip(r, j)]
        mx = max(dev)
        arg = dev.index(mx)
        return pa.table(
            {
                "event_type": pa.array(
                    [str(df["event_type"].iloc[0])], pa.string()
                ),
                "n_days": pa.array([n], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "max_dev": pa.array([str(mx)], pa.string()),
                "drift_day": pa.array(
                    [int(df["day"].iloc[arg])], pa.timestamp("us")
                ),
            }
        )

    return (
        daily.groupby("event_type")
        .map_groups(scan, batch_format="pandas")
        .sort("event_type")
    )


def ab_conversion_chisq(sf_dir: str) -> rd.Dataset:
    """A/B independence test: split users into two variants by
    ``user_id % 2`` and test whether "purchase-dominant" behaviour (a user
    fires MORE 'purchase' than 'click' events) differs between variants,
    via the 2×2 chi-square statistic computed from EXACT integer counts —
        chi2 = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    with (a, b) = (dominant, not) in variant 0 and (c, d) in variant 1.
    The experiment-analysis pass every event pipeline runs; all arithmetic
    is Python-int exact, with ONE float division at the very end (identical
    operand order to the HUGEINT twin), quantized to milli-units.

    Scale shape: per-batch map-side combine to per-user (purchases, clicks)
    partial sums, ONE user-keyed shuffle for the per-user totals, then a
    2-row aggregate — no event row survives past the first combine.
    Returns one row: (users_a, conv_a, users_b, conv_b, chi2_milli).
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        et = batch.column("event_type")
        pur = pc.equal(et, pa.scalar("purchase")).combine_chunks()
        clk = pc.equal(et, pa.scalar("click")).combine_chunks()
        t = pa.table(
            {
                "user_id": pa.array(uid),
                "pur": pa.array(pur.to_numpy(zero_copy_only=False).astype(np.int64)),
                "clk": pa.array(clk.to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )
        # batch-local sums per user: ships ≤ one row per distinct user/batch
        agg = pa.TableGroupBy(t, "user_id").aggregate([("pur", "sum"), ("clk", "sum")])
        return pa.table(
            {
                "user_id": agg.column("user_id"),
                "pur": agg.column("pur_sum").cast(pa.int64()),
                "clk": agg.column("clk_sum").cast(pa.int64()),
            }
        )

    per_user = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("user_id")
        .aggregate(Sum("pur", alias_name="pur"), Sum("clk", alias_name="clk"))
    )

    def variant_rows(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        p = batch.column("pur").combine_chunks().to_numpy(zero_copy_only=False)
        c = batch.column("clk").combine_chunks().to_numpy(zero_copy_only=False)
        var = (uid % 2).astype(np.int64)
        t = pa.table(
            {
                "variant": pa.array(var),
                "one": pa.array(np.ones(len(uid), dtype=np.int64)),
                "conv": pa.array((p > c).astype(np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "variant").aggregate([("one", "sum"), ("conv", "sum")])
        return pa.table(
            {
                "variant": agg.column("variant"),
                "users": agg.column("one_sum").cast(pa.int64()),
                "conv": agg.column("conv_sum").cast(pa.int64()),
            }
        )

    rows = (
        per_user.map_batches(variant_rows, batch_format="pyarrow")
        .groupby("variant")
        .aggregate(Sum("users", alias_name="users"), Sum("conv", alias_name="conv"))
        .take_all()  # exactly ≤ 2 rows
    )
    by_v = {int(r["variant"]): (int(r["users"]), int(r["conv"])) for r in rows}
    ua, ca = by_v.get(0, (0, 0))
    ub, cb = by_v.get(1, (0, 0))
    a, b, c, d = ca, ua - ca, cb, ub - cb
    n = a + b + c + d
    den = (a + b) * (c + d) * (a + c) * (b + d)
    if den == 0:
        chi2_milli = 0
    else:
        import numpy as np

        num = n * (a * d - b * c) ** 2
        chi2_milli = int(np.round(float(num) / float(den) * 1000))
    return rd.from_arrow(
        pa.table(
            {
                "users_a": pa.array([ua], pa.int64()),
                "conv_a": pa.array([ca], pa.int64()),
                "users_b": pa.array([ub], pa.int64()),
                "conv_b": pa.array([cb], pa.int64()),
                "chi2_milli": pa.array([chi2_milli], pa.int64()),
            }
        )
    )


def theil_sen_daily(sf_dir: str) -> rd.Dataset:
    """Robust daily-volume trend: the Theil–Sen slope (median of all
    pairwise slopes) over the (day-index, daily event count) series — the
    outlier-proof alternative to least squares for drift monitoring.

    Scale shape: ONE day-keyed aggregate reduces the event stream to a
    days-sized table (the calendar is bounded — this is a constant-size
    result at any corpus size); the O(days²) pair enumeration runs
    vectorized on that constant-size aggregate.  Selection is the LOWER
    median under the deterministic order (slope, dy, dx, i-day, j-day) —
    distinct slope fractions here always differ by ≥ 1/(dx·dx') ≫ double
    ulp at calendar magnitudes, so double ordering is exact and identical
    to the twin's.  Returns (n_days, n_pairs, slope_ppm).
    """
    import numpy as np

    ev = sf_table(sf_dir, "events", columns=["ts"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table(
            {
                "day": day,
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "day").aggregate([("one", "sum")])
        return pa.table({"day": agg.column("day"), "n": agg.column("one_sum")})

    daily = (
        ev.map_batches(day_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # calendar-sized: constant at any corpus scale
    )
    days = sorted(daily, key=lambda r: r["day"])
    d0 = days[0]["day"] if days else None
    di = np.array(
        [int((r["day"] - d0).days) for r in days], dtype=np.int64
    ) if days else np.array([], dtype=np.int64)
    cn = np.array([int(r["n"]) for r in days], dtype=np.int64)
    m = len(di)
    if m < 2:
        return rd.from_arrow(
            pa.table(
                {
                    "n_days": pa.array([m], pa.int64()),
                    "n_pairs": pa.array([0], pa.int64()),
                    "slope_ppm": pa.array([0], pa.int64()),
                }
            )
        )
    ii, jj = np.triu_indices(m, k=1)
    dy = cn[jj] - cn[ii]
    dx = di[jj] - di[ii]  # > 0 by construction
    slope = dy.astype(np.float64) / dx.astype(np.float64)
    order = np.lexsort((di[jj], di[ii], dx, dy, slope))
    pick = order[(len(order) - 1) // 2]
    slope_ppm = int(np.round(slope[pick] * 1_000_000))
    return rd.from_arrow(
        pa.table(
            {
                "n_days": pa.array([m], pa.int64()),
                "n_pairs": pa.array([len(order)], pa.int64()),
                "slope_ppm": pa.array([slope_ppm], pa.int64()),
            }
        )
    )


def markov_stationary(sf_dir: str, *, num_buckets: int = 64) -> pa.Table:
    """Stationary distribution of the event-type Markov chain — "where
    does the user flow spend its time in the long run", the equilibrium
    summary of `event_transitions` (and the quantity PageRank generalizes
    to graphs).

    Chain: states = event types appearing in any consecutive pair;
    P[i][j] = n_ij / n_i; a DANGLING state (appears only as next_type)
    gets the standard uniform-outgoing fix as integer weights (1 to every
    state, out-total K) so the matrix stays exact.  π solves π(D−N) = 0,
    Σπ = 1, computed on the driver in EXACT rational arithmetic
    (`fractions.Fraction` Gaussian elimination over the integer matrix
    (D−N)ᵀ with the normalization row replacing the last equation —
    K ≤ |event types| is tiny, the calendar-table convention) and
    quantized with Python ``round()`` (exact half-even on rationals).
    A singular system (reducible chain — out of contract for this corpus)
    falls back to the uniform distribution deterministically.

    The distributed work IS `event_transitions` (one user-bucket shuffle,
    |types|²-sized result); this operator adds only driver math.  Returns
    (event_type, out_total, pi_ppm) sorted by event_type — gated through
    `markov_stationary_digest` (pinned from the independent
    `oracle_dedup.stationary_rows`, which counts sequentially and solves
    by the Markov-chain-tree/adjugate route: diagonal cofactors of the
    same integer matrix — two exact solvers, one rational answer).
    """
    from fractions import Fraction

    trans = event_transitions(sf_dir, num_buckets=num_buckets)
    prev = trans.column("prev_type").to_pylist()
    nxt = trans.column("next_type").to_pylist()
    cnt = trans.column("n").to_pylist()
    states = sorted(set(prev) | set(nxt))
    k = len(states)
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "out_total": pa.array([], pa.int64()),
            "pi_ppm": pa.array([], pa.int64()),
        }
    )
    if k == 0:
        return empty
    idx = {s: i for i, s in enumerate(states)}
    N = [[0] * k for _ in range(k)]
    for p, q, n in zip(prev, nxt, cnt):
        N[idx[p]][idx[q]] += int(n)
    out = [sum(row) for row in N]
    for i in range(k):
        if out[i] == 0:  # dangling: uniform integer weights
            N[i] = [1] * k
            out[i] = k
    # A = D - N (zero row sums); solve yᵀ on Aᵀ with Σy = 1
    M = [
        [Fraction((out[i] if i == j else 0) - N[j][i]) for j in range(k)]
        for i in range(k)
    ]  # M = Aᵀ
    rhs = [Fraction(0)] * k
    M[k - 1] = [Fraction(1)] * k
    rhs[k - 1] = Fraction(1)
    sol: list[Fraction] | None = [Fraction(0)] * k
    for col in range(k):
        piv = next((r for r in range(col, k) if M[r][col] != 0), None)
        if piv is None:
            sol = None  # singular: reducible chain
            break
        M[col], M[piv] = M[piv], M[col]
        rhs[col], rhs[piv] = rhs[piv], rhs[col]
        inv = 1 / M[col][col]
        M[col] = [v * inv for v in M[col]]
        rhs[col] = rhs[col] * inv
        for r in range(k):
            if r != col and M[r][col] != 0:
                f = M[r][col]
                M[r] = [a - f * b for a, b in zip(M[r], M[col])]
                rhs[r] = rhs[r] - f * rhs[col]
    pis = rhs if sol is not None else [Fraction(1, k)] * k
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "out_total": pa.array(out, pa.int64()),
            "pi_ppm": pa.array(
                [int(round(p * 1_000_000)) for p in pis], pa.int64()
            ),
        }
    )


def markov_stationary_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `markov_stationary`: one row (n_states, digest),
    the order-independent md5 fold over (event_type, out_total, pi_ppm)
    rows — pinned in `oracle_sql()` from `oracle_dedup.stationary_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    t = markov_stationary(sf_dir)
    s = 0
    for et, ot, ppm in zip(
        t.column("event_type").to_pylist(),
        t.column("out_total").to_pylist(),
        t.column("pi_ppm").to_pylist(),
    ):
        s = (s + row_digest(str(et), f"{ot}\x1f{ppm}")) % DIGEST_MOD
    return pa.table(
        {
            "n_states": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([s], pa.int64()),
        }
    )


def time_decay_attribution(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Time-decay multi-touch attribution — the fourth standard credit
    rule beside last-touch / linear / U-shaped: clicks closer to the
    purchase earn exponentially more credit (1-day half-life).  To keep
    credit EXACT the decay is discretized to whole-day age buckets with
    DYADIC integer weights ``w = 2^(6 − age_days)`` (64 for the same-day
    click down to 1 for the 6-day-old one); each click gets
    ``⌊10⁶·w/Σw⌋`` ppm and the MOST RECENT click takes the remainder, so
    every purchase's credit sums to exactly 10⁶ (the `linear_attribution`
    conservation contract).

    Scale shape: identical to `linear_attribution` — one ``user_id % B``
    bucket shuffle, two searchsorted probes per purchase, credits folded
    in-task.  Returns (click_event_id, user_id, n_purchases,
    credit_ppm_total) sorted; window-join twin.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"), pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    _DAY_US = 86_400_000_000

    def credit(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        out_cid, out_uid, out_np, out_cr = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            cl = g[g["event_type"] == "click"].sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            pu = g[g["event_type"] == "purchase"]
            if not len(cl) or not len(pu):
                continue
            cts = cl["ts"].to_numpy()
            cts_us = cts.astype("datetime64[us]").astype("int64")
            cid = cl["event_id"].to_numpy()
            n_pur = np.zeros(len(cl), dtype=np.int64)
            cr = np.zeros(len(cl), dtype=np.int64)
            for pts in pu["ts"].to_numpy():
                lo = np.searchsorted(cts, pts - np.timedelta64(7, "D"), side="left")
                hi = np.searchsorted(cts, pts, side="left")
                if hi <= lo:
                    continue
                pts_us = int(pts.astype("datetime64[us]").astype("int64"))
                # 0..6 whole days; the exactly-7-day boundary click (included
                # by the >= window edge) clamps to the oldest weight
                age_d = np.minimum((pts_us - cts_us[lo:hi]) // _DAY_US, 6)
                w = (np.int64(1) << (6 - age_d)).astype(np.int64)
                sw = int(w.sum())
                base = (1_000_000 * w) // sw
                n_pur[lo:hi] += 1
                cr[lo:hi] += base
                cr[hi - 1] += 1_000_000 - int(base.sum())  # remainder, exact
            sel = n_pur > 0
            out_cid.extend(cid[sel].tolist())
            out_uid.extend([int(uid)] * int(sel.sum()))
            out_np.extend(n_pur[sel].tolist())
            out_cr.extend(cr[sel].tolist())
        return pa.table(
            {
                "click_event_id": pa.array(out_cid, pa.int64()),
                "user_id": pa.array(out_uid, pa.int64()),
                "n_purchases": pa.array(out_np, pa.int64()),
                "credit_ppm_total": pa.array(out_cr, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(credit, batch_format="pyarrow")
        .sort("click_event_id")
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def window_funnel_depth(
    sf_dir: str, *, window_hours: int = 24, num_buckets: int = 64
) -> rd.Dataset:
    """ClickHouse-style ``windowFunnel``: per user, how deep into the
    ordered stage chain view → click → purchase does the user get within
    ``window_hours`` of entering the funnel — the stage-progression
    histogram product analytics teams read daily.

    Deterministic greedy contract (what makes an exact SQL twin
    possible): the funnel anchors at the user's FIRST stage-1 event;
    each later stage matches the FIRST event of that type STRICTLY after
    the previous stage's match, still inside the window.  Depth 0 means
    the user never fired stage 1.  Output: (depth, n_users) for
    depth 0..len(stages), plus the conversion counts being derivable.

    Scale shape: the `sessionize` family — ONE ``user_id % B`` bucket
    shuffle, per-user vectorized searchsorted probes (stage lists are
    pre-sorted per bucket), tiny depth-keyed aggregate.  The twin chains
    correlated ``min(ts)`` lateral lookups — identical greedy semantics.
    """
    import numpy as np

    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    window_us = window_hours * 3_600_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"), pa.array(list(FUNNEL_STAGES)))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        )

    def depths(group: pa.Table) -> pa.Table:
        df = group.select(["event_id", "user_id", "ts", "event_type"]).to_pandas()
        counts: dict[int, int] = {}
        for _, g in df.groupby("user_id", sort=False):
            by_stage = {
                st: np.sort(
                    g.loc[g["event_type"] == st, "ts"]
                    .to_numpy()
                    .astype("datetime64[us]")
                    .astype("int64")
                )
                for st in FUNNEL_STAGES
            }
            s1 = by_stage[FUNNEL_STAGES[0]]
            if not len(s1):
                counts[0] = counts.get(0, 0) + 1
                continue
            anchor = int(s1[0])
            deadline = anchor + window_us
            depth, cur = 1, anchor
            for st in FUNNEL_STAGES[1:]:
                ts = by_stage[st]
                i = int(np.searchsorted(ts, cur, side="right"))  # strictly after
                if i < len(ts) and int(ts[i]) <= deadline:
                    cur = int(ts[i])
                    depth += 1
                else:
                    break
            counts[depth] = counts.get(depth, 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "depth": pa.array(ks, pa.int64()),
                "n_users": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(depths, batch_format="pyarrow")
        .groupby("depth")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort("depth")
    )


PSI_BUCKETS = 20
_Q40 = float(1 << 40)


def psi_value_drift(sf_dir: str) -> rd.Dataset:
    """Population Stability Index between the first and second halves of
    the event stream's value distribution — the model-monitoring drift
    score (PSI < 0.1 stable, > 0.25 shifted) computed exactly:

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    over ``PSI_BUCKETS`` equal-width buckets of the cents grid with
    Laplace +1 smoothing (p = (n1+1)/(N1+B), q = (n2+1)/(N2+B)) so
    empty buckets are well-defined; each bucket's contribution is ONE
    double expression quantized to the q40 grid (the `source_jsd_matrix`
    convention), so the 20-term sum is exact and order-free.  The halves
    split at the midpoint timestamp ``(min_ts + max_ts) // 2``
    (≤ goes to H1) — pure integer microseconds.

    Scale shape: one min/max aggregate pass, then one histogram pass
    with map-side-combined (bucket, half) int64 partials; the 20-row
    fold is driver math.  Returns one row
    (n_h1, n_h2, psi_q40) — the SQL twin recomputes wholesale.
    """
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    ev = sf_table(sf_dir, "events", columns=["ts", "value"])

    lim = ev.map_batches(
        lambda b: pa.table(
            {
                "c": _cents(b.column("value")),
                "t": pc.cast(b.column("ts"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Min("c"), Max("c"), Min("t"), Max("t"))
    cmin, cmax = int(lim["min(c)"]), int(lim["max(c)"])
    tmid = (int(lim["min(t)"]) + int(lim["max(t)"])) // 2
    rng1 = cmax - cmin + 1
    B = PSI_BUCKETS

    def hist(batch: pa.Table) -> pa.Table:
        import numpy as np

        c = np.asarray(_cents(batch.column("value")), dtype=np.int64)
        t = np.asarray(pc.cast(batch.column("ts"), pa.int64()), dtype=np.int64)
        bkt = (c - cmin) * B // rng1
        h1 = t <= tmid
        n1 = np.zeros(B, dtype=np.int64)
        n2 = np.zeros(B, dtype=np.int64)
        np.add.at(n1, bkt[h1], 1)
        np.add.at(n2, bkt[~h1], 1)
        return pa.table(
            {
                "bkt": pa.array(np.arange(B, dtype=np.int64)),
                "n1": pa.array(n1),
                "n2": pa.array(n2),
            }
        )

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby("bkt")
        .aggregate(Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2"))
        .take_all()  # exactly PSI_BUCKETS rows
    )
    n1 = {int(r["bkt"]): int(r["n1"]) for r in rows}
    n2 = {int(r["bkt"]): int(r["n2"]) for r in rows}
    N1, N2 = sum(n1.values()), sum(n2.values())
    psi_q = 0
    for b in range(B):
        p = float(n1.get(b, 0) + 1) / float(N1 + B)
        q = float(n2.get(b, 0) + 1) / float(N2 + B)
        psi_q += int(np.round((p - q) * np.log(p / q) * _Q40))
    return rd.from_arrow(
        pa.table(
            {
                "n_h1": pa.array([N1], pa.int64()),
                "n_h2": pa.array([N2], pa.int64()),
                "psi_q40": pa.array([psi_q], pa.int64()),
            }
        )
    )


def seasonal_outlier_days(sf_dir: str) -> pa.Table:
    """Weekday-deseasonalized daily revenue anomalies — "which days were
    abnormal GIVEN their weekday" (a Monday judged against Mondays), the
    ops-review complement of `weekday_seasonality`'s indices and
    `cusum_changepoint`'s single level shift.

    All-integer contract: a day d with cents x_d and weekday w is scored
    by cross-multiplication against its weekday's total S_w over n_w
    days — ``ratio_ppm = x_d·n_w·10⁶ // S_w`` (exact floor; the weekday
    mean never materializes as a float) and flagged when the day is at
    least 2× its weekday mean (``x_d·n_w ≥ 2·S_w``) or at most half of
    it (``2·x_d·n_w ≤ S_w``) — integer comparisons on both sides.

    Scale shape: the acf/cusum calendar fold — ONE day-keyed map-side-
    combined aggregate; weekday totals and flags are driver math over
    the calendar-sized series.  Returns flagged days only:
    (day, weekday, cents, ratio_ppm, direction) sorted by day, where
    direction is +1 (spike) or -1 (drop) and weekday is DuckDB's
    ``dayofweek`` (0 = Sunday).
    """
    import numpy as np
    from ray.data.aggregate import Sum

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
    # DuckDB dayofweek: 0 = Sunday; Python weekday(): 0 = Monday
    rows = [
        (r["day"], (r["day"].weekday() + 1) % 7, int(r["cents"])) for r in daily
    ]
    s_w: dict[int, int] = {}
    n_w: dict[int, int] = {}
    for _, w, c in rows:
        s_w[w] = s_w.get(w, 0) + c
        n_w[w] = n_w.get(w, 0) + 1
    out = {"day": [], "weekday": [], "cents": [], "ratio_ppm": [], "direction": []}
    for day, w, c in sorted(rows):
        sw, nw = s_w[w], n_w[w]
        if sw <= 0:
            continue
        lhs = c * nw
        if lhs >= 2 * sw:
            direction = 1
        elif 2 * lhs <= sw:
            direction = -1
        else:
            continue
        out["day"].append(day)
        out["weekday"].append(w)
        out["cents"].append(c)
        out["ratio_ppm"].append(lhs * 1_000_000 // sw)
        out["direction"].append(direction)
    return pa.table(
        {
            "day": pa.array(out["day"], pa.timestamp("us")),
            "weekday": pa.array(out["weekday"], pa.int64()),
            "cents": pa.array(out["cents"], pa.int64()),
            "ratio_ppm": pa.array(out["ratio_ppm"], pa.int64()),
            "direction": pa.array(out["direction"], pa.int64()),
        }
    )

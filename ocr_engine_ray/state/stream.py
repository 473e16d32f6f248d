"""Stateful streaming: running per-key aggregates over an ordered log.

Two implementations of the same semantics (per-event running (count, sum)
per user, in (ts, event_id) order):

- ``stream_running_totals`` — the DISTRIBUTED path and the one the driver
  gate runs: per-user cumulative sums need no global order, only per-user
  order, so the log is hash-bucketed by ``user_id % B``, each bucket is
  sorted in-task by ``(user_id, ts, event_id)``, and a vectorized pandas
  groupby-cumsum produces the running values.  One shuffle, no driver on the
  data path — this is the shape that survives 100 TB.
- ``stream_running_totals_actors`` — the cross-batch streaming-STATE
  primitive (``KeyedCounterActor``): one actor per key-hash bucket fed
  batches in time order, for semantics that genuinely need incremental
  state across an unbounded stream (Ray Data has no event-time/watermark
  machinery; see ray_guide.md "Streaming-shaped workloads").  The driver
  routes batch slices to bucket actors, which makes it a single-node funnel
  on a bounded re-run — kept as the documented streaming primitive, not the
  batch path.

Money accumulates as exact integer *cents* (``round(value*100)``, half-away
like DuckDB ``round``) so running sums are order-independent integers —
hash-identical to the SQL window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _cents_i64(values: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.fill_null(
        pc.round(pc.multiply(values, 100.0), round_mode="half_towards_infinity"),
        0.0,
    ).cast(pa.int64())


# ---------------------------------------------------------------------------
# Distributed path (the driver-gated query)
# ---------------------------------------------------------------------------


def stream_running_totals(sf_dir: str, *, num_buckets: int = 64):
    """Per-event running (count, cents-sum) per user over the event log,
    fully distributed.

    Running totals are *order-local to the user*: row r's running values
    depend only on earlier rows of the same ``user_id``.  So instead of a
    global sort + stateful scan, hash-bucket by ``user_id % B`` (every row
    of a user lands in one bucket), sort each bucket in-task by
    ``(user_id, ts, event_id)`` and compute the per-user cumulative
    count/sum with one vectorized pandas ``groupby(...).cumcount/cumsum``.
    One all-to-all (the bucket groupby); the driver never touches row data.
    ``num_buckets`` is the scale knob: size it so one user-bucket's rows fit
    a worker heap (users are hash-spread, so bucket ≈ |events| / B rows).
    Output order is unspecified (the driver compare is order-insensitive);
    sort downstream if a global order is needed.
    """
    from ..sources.tables import sf_table

    ds = sf_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_bkt", pa.array((uid % num_buckets).astype(np.int32))
        ).append_column("cents", _cents_i64(batch.column("value")))

    def bucket_running(group: pa.Table) -> pa.Table:
        df = group.select(
            ["event_id", "user_id", "ts", "value", "cents"]
        ).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        df["running_n"] = (g.cumcount() + 1).astype("int64")
        df["running_cents"] = g["cents"].cumsum().astype("int64")
        return pa.Table.from_pandas(
            df[["event_id", "user_id", "ts", "value", "running_n", "running_cents"]],
            preserve_index=False,
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_running, batch_format="pyarrow")
    )


def stream_running_totals_query(sf_dir: str):
    """Driver-gated projection: drop the raw float ``value`` column so the
    compared surface is integer/timestamp only (exact SQL window twin)."""
    ds = stream_running_totals(sf_dir)
    return ds.map_batches(
        lambda b: b.select(["event_id", "user_id", "ts", "running_n", "running_cents"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Actor-fleet streaming-state primitive
# ---------------------------------------------------------------------------


@ray.remote
class KeyedCounterActor:
    """Running (n_events, sum_cents) per key, updated batch by batch —
    the cross-batch incremental-state primitive for genuinely unbounded
    streams.  In-batch work is vectorized (pandas groupby cumsum); only the
    per-key carry-in/out of the state dict is Python, so cost scales with
    distinct keys per batch, not rows."""

    def __init__(self) -> None:
        self.counts: dict[int, int] = {}
        self.cents: dict[int, int] = {}

    def ingest(self, batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "user_id": batch.column("user_id"),
                "cents": _cents_i64(batch.column("value")),
            }
        ).to_pandas()
        g = df.groupby("user_id", sort=False)
        run_n = g.cumcount().to_numpy() + 1
        run_c = g["cents"].cumsum().to_numpy()
        # per-key carry-in from previous batches (order within the batch is
        # the arrival order — the caller's contract)
        uids = df["user_id"].to_numpy()
        carry_n = np.fromiter(
            (self.counts.get(int(u), 0) for u in uids), dtype=np.int64, count=len(uids)
        )
        carry_c = np.fromiter(
            (self.cents.get(int(u), 0) for u in uids), dtype=np.int64, count=len(uids)
        )
        run_n = run_n + carry_n
        run_c = run_c + carry_c
        # carry-out: last row per key holds the new running state
        last = g.tail(1).index.to_numpy()
        for i in last:
            self.counts[int(uids[i])] = int(run_n[i])
            self.cents[int(uids[i])] = int(run_c[i])
        return batch.append_column("running_n", pa.array(run_n)).append_column(
            "running_cents", pa.array(run_c)
        )

    def state_size(self) -> int:
        return len(self.counts)


def stream_running_totals_actors(
    sf_dir: str, *, num_buckets: int = 4, batch_rows: int = 16384
):
    """Running totals via the keyed-actor fleet (streaming-state demo).

    The log is read and globally sorted by (ts, event_id) *by Ray Data*
    (distributed sort), then streamed batch-by-batch through the driver,
    which only ROUTES each batch's bucket slices to the per-bucket state
    actors in order.  Correct, but the driver is on the data path — use
    ``stream_running_totals`` for bounded re-runs; this exists for
    unbounded-stream semantics that batch recomputation cannot express.
    """
    import ray.data as rd

    from ..sources.tables import sf_table

    ds = sf_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    ).sort(["ts", "event_id"])
    actors = [KeyedCounterActor.remote() for _ in range(num_buckets)]
    pending: list[ray.ObjectRef] = []
    for chunk in ds.iter_batches(batch_format="pyarrow", batch_size=batch_rows):
        buckets = (
            chunk.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            % num_buckets
        )
        chunk = chunk.append_column("bucket", pa.array(buckets.astype(np.int32)))
        for b in range(num_buckets):
            sub = chunk.filter(pa.compute.equal(chunk.column("bucket"), b))
            if sub.num_rows:
                pending.append(actors[b].ingest.remote(sub.drop(["bucket"])))
    if not pending:
        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "value": pa.array([], pa.float64()),
                    "running_n": pa.array([], pa.int64()),
                    "running_cents": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow_refs(pending).sort(["ts", "event_id"])


def watermark_late_events(
    sf_dir: str, *, lateness_us: int = 3_600_000_000, num_buckets: int = 32
) -> "rd.Dataset":
    """Streaming WATERMARK semantics replayed exactly: processing order is
    ``event_id`` (the arrival proxy), the watermark after event i is
    ``max(ts of events arriving ≤ i) − lateness`` (1 h default allowed
    lateness), and an event is LATE if its own timestamp is behind that
    watermark — the Flink/Beam late-data accounting a streaming ingestion
    pipeline needs, computed batch-exactly.

    The global running max over arrival order distributes as a TWO-PASS
    prefix MAX (the `packing.pack_token_stream` prefix-sum shape with max
    as the monoid): events range-bucket by ``event_id * B // (max_id+1)``
    (contiguous arrival ranges), pass 1 folds each bucket's max ts —
    B scalars to the driver — whose exclusive running max seeds pass 2's
    in-bucket ``np.maximum.accumulate``.  All timestamp math is integer
    µs.  Returns (hour, status, n) counts with status ∈ {late, ontime},
    sorted by (hour, status); twin is the running-max window SQL.
    """
    import ray

    from ..sources.tables import sf_table

    ev = sf_table(sf_dir, "events", columns=["event_id", "ts"])

    maxid = ev.max("event_id")  # Max aggregate ignores nulls

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("event_id")),
                pc.is_valid(batch.column("ts")),
            )
        )
        eid = batch.column("event_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = (
            batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "bkt": pa.array((eid * num_buckets // (maxid + 1)).astype(np.int32)),
                "event_id": pa.array(eid),
                "ts_us": pa.array(ts),
            }
        )

    prepped = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536).materialize()

    # pass 1: per-range max ts -> exclusive prefix max on the driver (B scalars)
    from ray.data.aggregate import Max

    parts = prepped.groupby("bkt").aggregate(Max("ts_us", alias_name="mx")).take_all()
    prefix: dict[int, int] = {}
    run = -(1 << 62)
    for r in sorted(parts, key=lambda r: r["bkt"]):
        prefix[r["bkt"]] = run
        run = max(run, r["mx"])
    pref_ref = ray.put(prefix)

    def label_bucket(group: pa.Table, *, ref) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "hour_us": pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pre = ray.get(ref)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        ts_o = ts[order]
        seed = pre[group.column("bkt")[0].as_py()]
        runmax = np.maximum.accumulate(np.maximum(ts_o, seed))
        wm = runmax - lateness_us
        late = ts_o < wm
        hour = ts_o // 3_600_000_000 * 3_600_000_000
        key = hour * 2 + late.astype(np.int64)
        uk, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "hour_us": pa.array(uk // 2),
                "status": pa.array(
                    ["late" if k % 2 else "ontime" for k in uk], pa.string()
                ),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        prepped.groupby("bkt")
        .map_groups(label_bucket, batch_format="pyarrow", fn_kwargs={"ref": pref_ref})
        .groupby(["hour_us", "status"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        h = batch.column("hour_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(h.astype("datetime64[us]")),
                "status": batch.column("status"),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["hour", "status"])

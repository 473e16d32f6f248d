"""Stateful streaming: incremental per-key state in keyed actors.

Ray Data has no event-time/watermark machinery; when semantics genuinely
need incremental cross-batch state (running aggregates over an ordered log),
the idiom is **one actor per key-hash bucket, fed batches in time order**
(ray_guide.md "Streaming-shaped workloads").  This module provides that
primitive:

- ``KeyedCounterActor`` — holds per-key running (count, sum) state;
  ``ingest`` applies one Arrow batch and returns the batch enriched with
  the running values *as of each row*.
- ``stream_running_totals`` — drives a bucket-actor fleet over the events
  table in global ts order and returns the per-event running totals.

Ordering is the caller's contract (the log is read sorted by ts); state is
partitioned by ``user_id % num_buckets`` so each actor owns a disjoint key
range — the same partitioning assumption the sessionize/as-of operators
document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class KeyedCounterActor:
    """Running (n_events, sum_cents) per key, updated batch by batch.

    Money accumulates as exact integer *cents* (``round(value*100)``,
    half-away like DuckDB's ``round``) so the running sums are
    order-independent integers — hash-identical to the SQL window-function
    oracle regardless of summation grouping."""

    def __init__(self) -> None:
        self.counts: dict[int, int] = {}
        self.cents: dict[int, int] = {}

    def ingest(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = batch.column("user_id").to_pylist()
        cents = (
            pc.fill_null(
                pc.round(
                    pc.multiply(batch.column("value"), 100.0),
                    round_mode="half_towards_infinity",
                ),
                0.0,
            )
            .cast(pa.int64())
            .to_pylist()
        )
        run_n = np.empty(len(keys), dtype=np.int64)
        run_c = np.empty(len(keys), dtype=np.int64)
        for i, (k, c) in enumerate(zip(keys, cents)):
            self.counts[k] = self.counts.get(k, 0) + 1
            self.cents[k] = self.cents.get(k, 0) + c
            run_n[i] = self.counts[k]
            run_c[i] = self.cents[k]
        return batch.append_column("running_n", pa.array(run_n)).append_column(
            "running_cents", pa.array(run_c)
        )

    def state_size(self) -> int:
        return len(self.counts)


def stream_running_totals(
    sf_dir: str, *, num_buckets: int = 4, batch_rows: int = 16384
):
    """Per-event running (count, sum) per user over the ts-ordered event log.

    The log is read and globally sorted by (ts, event_id) *by Ray Data*
    (distributed sort, not a driver read), then streamed batch-by-batch
    through the driver, which only ROUTES each batch's bucket slices to the
    per-bucket state actors in order — one batch in flight on the driver at
    a time, results accumulate as object refs.  Per-bucket submission order
    preserves the ordering contract; different buckets advance
    independently.  Returns the enriched events as a Dataset (built from the
    actors' output refs), re-sorted by (ts, event_id).
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


def stream_running_totals_query(sf_dir: str):
    """Driver-gated projection: drop the raw float ``value`` column so the
    compared surface is integer/timestamp only (exact SQL window twin)."""
    ds = stream_running_totals(sf_dir)
    return ds.map_batches(
        lambda b: b.select(["event_id", "user_id", "ts", "running_n", "running_cents"]),
        batch_format="pyarrow",
    )

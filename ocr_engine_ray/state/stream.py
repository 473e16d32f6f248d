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
    """Running (n_events, sum_value) per key, updated batch by batch."""

    def __init__(self) -> None:
        self.counts: dict[int, int] = {}
        self.sums: dict[int, float] = {}

    def ingest(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("user_id").to_pylist()
        vals = batch.column("value").to_pylist()
        run_n = np.empty(len(keys), dtype=np.int64)
        run_s = np.empty(len(keys), dtype=np.float64)
        for i, (k, v) in enumerate(zip(keys, vals)):
            self.counts[k] = self.counts.get(k, 0) + 1
            self.sums[k] = self.sums.get(k, 0.0) + (v or 0.0)
            run_n[i] = self.counts[k]
            run_s[i] = self.sums[k]
        return batch.append_column("running_n", pa.array(run_n)).append_column(
            "running_sum", pa.array(np.round(run_s, 6))
        )

    def state_size(self) -> int:
        return len(self.counts)


def stream_running_totals(
    sf_dir: str, *, num_buckets: int = 4, batch_rows: int = 4096
) -> pa.Table:
    """Per-event running (count, sum) per user over the ts-ordered event log.

    The log is read once, sorted globally by (ts, event_id), then routed
    batch-by-batch to per-bucket state actors IN ORDER (sequential feed per
    bucket preserves the ordering contract; different buckets advance
    independently).
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    actors = [KeyedCounterActor.remote() for _ in range(num_buckets)]
    pending: list[ray.ObjectRef] = []
    buckets = (
        t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        % num_buckets
    )
    bcol = pa.array(buckets.astype(np.int32))
    t = t.append_column("bucket", bcol)
    for start in range(0, t.num_rows, batch_rows):
        chunk = t.slice(start, batch_rows)
        for b in range(num_buckets):
            sub = chunk.filter(pa.compute.equal(chunk.column("bucket"), b))
            if sub.num_rows:
                pending.append(actors[b].ingest.remote(sub.drop(["bucket"])))
    parts = ray.get(pending)
    out = pa.concat_tables(parts)
    return out.sort_by([("ts", "ascending"), ("event_id", "ascending")])

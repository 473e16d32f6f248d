"""Z-order (Morton-curve) data-layout optimization — the storage-side
operator behind multi-dimensional pruning (Delta/Iceberg ``OPTIMIZE ZORDER
BY``, Lance spatial clustering): rewrite a table so rows near each other in
TWO dimensions land in the same output file, and emit the per-file min/max
manifest a reader prunes with.

At 100 TB the layout pass is the difference between a point query scanning
every file (time-ordered ingest spreads every user across all files) and
scanning ~sqrt-proportionally few; the manifest rows are what a catalog
stores as file statistics.

Scale shape (no global-sort operator needed):

1. one narrow projection pass derives the two dimension keys; a 4-scalar
   aggregate (min/max of both) is the ONLY global state, broadcast back;
2. each batch computes the 32-bit Morton code ``z`` (both dims scaled to
   16-bit on an exact integer grid — floor arithmetic, no floats anywhere);
3. ``zbkt = (z * B) >> 32`` is an ORDER-PRESERVING range bucket of z, so
   per-bucket counts give exclusive prefix offsets (the
   `packing.rank_by_quality` two-pass shape) and ONE groupby shuffle yields
   the exact global z-rank of every row — ``file_id = rank // file_rows``;
4. per-bucket per-file manifest partials collapse in a tiny final groupby
   (``n_rows / file_rows`` rows total at any corpus).

The SQL twin unrolls the same 16-step bit interleave (generated, the
unrolled-twin convention) over a ``row_number() OVER (ORDER BY z,
event_id)`` — bit-exact at every scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tables import sf_table

US_PER_DAY = 86_400_000_000


def _morton32(x16: np.ndarray, y16: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit int arrays into the 32-bit Morton code
    (x takes the even bit positions, y the odd)."""
    z = np.zeros(len(x16), dtype=np.int64)
    for i in range(16):
        z |= ((x16 >> i) & 1) << (2 * i)
        z |= ((y16 >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(
    sf_dir: str, *, file_rows: int = 4096, num_buckets: int = 64
) -> rd.Dataset:
    """Morton-cluster ``events`` by (user_id, day) and return the per-file
    layout manifest: (file_id, n_rows, min_user, max_user, min_day,
    max_day), sorted by file_id."""
    ds = sf_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # contract: rows with null dimension values are ignored (the twin's
        # WHERE ... IS NOT NULL) — the cohort_retention convention
        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("ts")))
        )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype("int64")
        tsv = (
            batch.column("ts")
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": pa.array(uid),
                "day": pa.array(np.floor_divide(tsv, US_PER_DAY)),
            }
        )

    narrow = ds.map_batches(project, batch_format="pyarrow").materialize()
    b = narrow.aggregate(
        Min("user_id", alias_name="minu"),
        Max("user_id", alias_name="maxu"),
        Min("day", alias_name="mind"),
        Max("day", alias_name="maxd"),
    )
    minu, maxu, mind, maxd = b["minu"], b["maxu"], b["mind"], b["maxd"]
    ru, rd_ = max(1, maxu - minu), max(1, maxd - mind)

    def zcode(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        day = batch.column("day").to_numpy(zero_copy_only=False)
        # exact integer 16-bit grid: ((x - min) * 65535) // range — every
        # product < 2^63 (ranges are day/user magnitudes), floor == trunc
        # on the non-negative values, same expression as the twin
        x16 = (uid - minu) * 65535 // ru
        y16 = (day - mind) * 65535 // rd_
        z = _morton32(x16, y16)
        zbkt = (z * num_buckets) >> 32  # order-preserving range bucket
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "day": batch.column("day"),
                "z": pa.array(z),
                "zbkt": pa.array(zbkt.astype(np.int32)),
            }
        )

    coded = narrow.map_batches(zcode, batch_format="pyarrow").materialize()
    parts = coded.groupby("zbkt").aggregate(Count(alias_name="n")).take_all()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(parts, key=lambda r: r["zbkt"]):
        offsets[r["zbkt"]] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def bucket_files(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        z = group.column("z").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        day = group.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, z))
        base = off[group.column("zbkt")[0].as_py()]
        rank = np.empty(len(z), dtype=np.int64)
        rank[order] = base + np.arange(len(z))
        fid = rank // file_rows
        # per-(file) manifest partials of this bucket
        import pandas as pd

        df = pd.DataFrame({"file_id": fid, "user_id": uid, "day": day})
        g = df.groupby("file_id").agg(
            n_rows=("user_id", "size"),
            min_user=("user_id", "min"),
            max_user=("user_id", "max"),
            min_day=("day", "min"),
            max_day=("day", "max"),
        )
        return pa.Table.from_pandas(
            g.reset_index().astype("int64"), preserve_index=False
        ).replace_schema_metadata(None)

    manifest = (
        coded.groupby("zbkt")
        .map_groups(bucket_files, batch_format="pyarrow")
        .groupby("file_id")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("min_user", alias_name="min_user"),
            Max("max_user", alias_name="max_user"),
            Min("min_day", alias_name="min_day"),
            Max("max_day", alias_name="max_day"),
        )
    )

    def cast_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {c: batch.column(c).cast(pa.int64()) for c in batch.column_names}
        )

    return manifest.map_batches(cast_cols, batch_format="pyarrow").sort("file_id")


def zorder_sql(*, file_rows: int = 4096) -> str:
    """The twin: same integer grid, the 16-step interleave unrolled, a
    window row_number in (z, event_id) order, file grouping."""
    inter = " + ".join(
        f"(((x16 >> {i}) & 1) << {2 * i}) + (((y16 >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return f"""
        WITH d AS (
          SELECT event_id, user_id,
                 epoch_us(ts) // {US_PER_DAY} AS day
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        b AS (
          SELECT min(user_id) AS minu,
                 greatest(max(user_id) - min(user_id), 1) AS ru,
                 min(day) AS mind,
                 greatest(max(day) - min(day), 1) AS rdy
          FROM d
        ),
        s AS (
          SELECT event_id, user_id, day,
                 (user_id - minu) * 65535 // ru AS x16,
                 (day - mind) * 65535 // rdy AS y16
          FROM d, b
        ),
        z AS (
          SELECT event_id, user_id, day, {inter} AS z FROM s
        ),
        r AS (
          SELECT user_id, day,
                 row_number() OVER (ORDER BY z, event_id) - 1 AS rk
          FROM z
        )
        SELECT (rk // {file_rows})::BIGINT AS file_id,
               count(*)::BIGINT AS n_rows,
               min(user_id)::BIGINT AS min_user,
               max(user_id)::BIGINT AS max_user,
               min(day)::BIGINT AS min_day,
               max(day)::BIGINT AS max_day
        FROM r GROUP BY 1 ORDER BY 1
    """

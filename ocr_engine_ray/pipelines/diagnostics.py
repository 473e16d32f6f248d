"""Shuffle-planning diagnostics: key-skew report with a salting
recommendation.

Every wide operation in this engine (`groupby`, bucketed joins, the
dedup/CC shuffles) assumes keys spread across partitions; ONE hot key turns
an all-to-all exchange into a single straggler task.  `skew_report` is the
planning pass a 100 TB job runs FIRST: exact per-key row counts, the
heavy-hitter head, and the integer salt factor (`ceil(max_key_rows ×
partitions / total_rows)`) that bounds any salted sub-key to roughly the
mean partition load — the number you pass to a salted aggregation /
hot-key-split join.

Scale shape: per-batch ``np.unique`` partials (the shuffle moves
distinct-keys-per-batch rows, never raw rows), the `fold.fold_by_key`
bucket fold (groupby-aggregate over high-cardinality int keys is ~40×
slower), then three constant-size reductions: a 3-scalar aggregate, a
map-side top-k prune, and the k-row head — nothing corpus-sized anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..sources.tables import sf_table
from .fold import fold_int_sums_by_key


def skew_report(
    sf_dir: str,
    *,
    table: str = "lineitem",
    key: str = "l_partkey",
    top_k: int = 8,
    num_partitions: int = 256,
) -> pa.Table:
    """Exact key-distribution head of ``table.key``: one row per top-k key
    by (count DESC, key ASC) carrying the global scalars —
    (rank, key, n_rows_key, pct_ppm, total_rows, n_keys, max_key_rows,
    salt_factor).  All integer arithmetic; sorted by rank."""
    ds = sf_table(sf_dir, table, columns=[key])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null keys are ignored (the twin's GROUP BY would keep a NULL
        # group; a skew plan for the null key is meaningless — filter on
        # both sides)
        batch = batch.filter(pc.is_valid(batch.column(key)))
        k = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(k.astype(np.int64), return_counts=True)
        return pa.table(
            {"key": pa.array(vals), "n": pa.array(cnt.astype(np.int64))}
        )

    folded = fold_int_sums_by_key(
        ds.map_batches(partial, batch_format="pyarrow"), key="key", cols=["n"]
    ).materialize()

    s = folded.aggregate(
        Sum("n", alias_name="total"),
        Count(alias_name="n_keys"),
        Max("n", alias_name="mx"),
    )
    total, n_keys, mx = int(s["total"]), int(s["n_keys"]), int(s["mx"])
    salt = (mx * num_partitions + total - 1) // total  # ceil, exact ints

    def local_head(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -n))[:top_k]
        return pa.table({"key": pa.array(k[order]), "n": pa.array(n[order])})

    head = sorted(
        (
            (-r["n"], r["key"])
            for r in folded.map_batches(local_head, batch_format="pyarrow").take_all()
        )
    )[:top_k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(head) + 1), pa.int64()),
            "key": pa.array([k for _, k in head], pa.int64()),
            "n_rows_key": pa.array([-n for n, _ in head], pa.int64()),
            "pct_ppm": pa.array(
                [(-n) * 1_000_000 // total for n, _ in head], pa.int64()
            ),
            "total_rows": pa.array([total] * len(head), pa.int64()),
            "n_keys": pa.array([n_keys] * len(head), pa.int64()),
            "max_key_rows": pa.array([mx] * len(head), pa.int64()),
            "salt_factor": pa.array([salt] * len(head), pa.int64()),
        }
    )


def skew_report_sql(
    *,
    table: str = "lineitem",
    key: str = "l_partkey",
    top_k: int = 8,
    num_partitions: int = 256,
) -> str:
    """The twin: per-key counts, scalar cross join, row_number head —
    same (count DESC, key ASC) order and ceil/floor integer arithmetic."""
    return f"""
        WITH c AS (
          SELECT {key} AS key, count(*)::BIGINT AS n FROM {table}
          WHERE {key} IS NOT NULL GROUP BY 1
        ),
        s AS (
          SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys,
                 max(n)::BIGINT AS mx
          FROM c
        ),
        t AS (
          SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rk FROM c
        )
        SELECT rk::BIGINT AS rank, t.key::BIGINT AS key, n AS n_rows_key,
               (n * 1000000 // total)::BIGINT AS pct_ppm,
               total AS total_rows, n_keys, mx AS max_key_rows,
               ((mx * {num_partitions} + total - 1) // total)::BIGINT AS salt_factor
        FROM t, s WHERE rk <= {top_k} ORDER BY rk
    """

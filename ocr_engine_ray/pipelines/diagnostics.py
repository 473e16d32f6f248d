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
import pyarrow.compute as pc
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


_FK_RELATIONS: tuple[tuple[str, str, str, str, str], ...] = (
    # (relation label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def referential_integrity_audit(
    sf_dir: str, *, num_buckets: int = 32
) -> rd.Dataset:
    """Foreign-key ORPHAN audit across every relationship in the star
    schema, in one operator — the ingestion-validation pass next to
    `skew_report` and `profile.profile_columns` (a new data drop with
    dangling keys corrupts every downstream join silently).

    All four relations ride ONE tagged union stream: child batches fold to
    per-(relation, key) row counts map-side (the exchange moves distinct
    keys per batch, never raw rows), parent batches emit their distinct
    keys; one (relation, key-hash) bucket groupby counts child rows whose
    key has no parent row in the bucket (a key lands wholly in its bucket,
    so the anti-join is exact).  NULL child keys are counted separately —
    they are not orphans (SQL joins drop them without a violation).

    Returns (relation, n_child_rows, n_null_keys, n_orphan_rows,
    n_orphan_keys) sorted by relation; twin is a UNION ALL of LEFT-JOIN
    audits.
    """
    import functools

    streams = []
    for rel, child_t, child_k, parent_t, parent_k in _FK_RELATIONS:
        child = sf_table(sf_dir, child_t, columns=[child_k])
        parent = sf_table(sf_dir, parent_t, columns=[parent_k])
        streams.append(
            child.map_batches(
                functools.partial(
                    _fk_child_rows, rel=rel, key_col=child_k, num_buckets=num_buckets
                ),
                batch_format="pyarrow",
                batch_size=65536,
            )
        )
        streams.append(
            parent.map_batches(
                functools.partial(
                    _fk_parent_rows, rel=rel, key_col=parent_k, num_buckets=num_buckets
                ),
                batch_format="pyarrow",
                batch_size=65536,
            )
        )
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.union(s)

    partials = unioned.groupby(["relation", "bkt"]).map_groups(
        _fk_bucket_audit, batch_format="pyarrow"
    )
    agg = partials.groupby("relation").aggregate(
        Sum("n_child_rows", alias_name="n_child_rows"),
        Sum("n_null_keys", alias_name="n_null_keys"),
        Sum("n_orphan_rows", alias_name="n_orphan_rows"),
        Sum("n_orphan_keys", alias_name="n_orphan_keys"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "relation": batch.column("relation"),
                "n_child_rows": batch.column("n_child_rows").cast(pa.int64()),
                "n_null_keys": batch.column("n_null_keys").cast(pa.int64()),
                "n_orphan_rows": batch.column("n_orphan_rows").cast(pa.int64()),
                "n_orphan_keys": batch.column("n_orphan_keys").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("relation")


def _fk_child_rows(
    batch: pa.Table, *, rel: str, key_col: str, num_buckets: int
) -> pa.Table:
    import pyarrow.compute as pc

    col = batch.column(key_col)
    n_null = int(pc.sum(pc.is_null(col).cast(pa.int8())).as_py() or 0)
    keys = col.filter(pc.is_valid(col)).cast(pa.int64()).to_numpy(zero_copy_only=False)
    uk, counts = (
        np.unique(keys, return_counts=True) if len(keys) else (np.array([], np.int64), np.array([], np.int64))
    )
    n = len(uk)
    return pa.table(
        {
            "relation": pa.array([rel] * (n + 1), pa.string()),
            "bkt": pa.array(
                np.concatenate([uk % num_buckets, [0]]).astype(np.int32)
            ),
            "key": pa.array(np.concatenate([uk, [-1]]).astype(np.int64)),
            # kind 0 = child partial, 1 = parent key, 2 = null-count carrier
            "kind": pa.array([0] * n + [2], pa.int8()),
            "n": pa.array(
                np.concatenate([counts, [n_null]]).astype(np.int64)
            ),
        }
    )


def _fk_parent_rows(
    batch: pa.Table, *, rel: str, key_col: str, num_buckets: int
) -> pa.Table:
    import pyarrow.compute as pc

    col = batch.column(key_col)
    keys = col.filter(pc.is_valid(col)).cast(pa.int64()).to_numpy(zero_copy_only=False)
    uk = np.unique(keys)
    return pa.table(
        {
            "relation": pa.array([rel] * len(uk), pa.string()),
            "bkt": pa.array((uk % num_buckets).astype(np.int32)),
            "key": pa.array(uk),
            "kind": pa.array([1] * len(uk), pa.int8()),
            "n": pa.array(np.ones(len(uk), dtype=np.int64)),
        }
    )


def _fk_bucket_audit(group: pa.Table) -> pa.Table:
    rel = group.column("relation")[0].as_py()
    kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
    key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
    n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
    child = kind == 0
    nulls = int(n[kind == 2].sum())
    parents = np.unique(key[kind == 1])
    ck, cn = key[child], n[child]
    n_child = int(cn.sum())
    if len(ck):
        orphan_mask = ~np.isin(ck, parents)
        # a key can appear in many child batches — orphan keys dedupe
        orphan_keys = int(len(np.unique(ck[orphan_mask])))
        orphan_rows = int(cn[orphan_mask].sum())
    else:
        orphan_keys = orphan_rows = 0
    return pa.table(
        {
            "relation": pa.array([rel], pa.string()),
            "n_child_rows": pa.array([n_child + nulls], pa.int64()),
            "n_null_keys": pa.array([nulls], pa.int64()),
            "n_orphan_rows": pa.array([orphan_rows], pa.int64()),
            "n_orphan_keys": pa.array([orphan_keys], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# Deequ-style constraint validation
# --------------------------------------------------------------------------

# (check_name, table, kind, column, params) — one spec drives BOTH the
# engine pass and the generated SQL twin, so the two can't drift.
_CHECKS: tuple = (
    ("customer.c_custkey.unique", "customer", "unique", "c_custkey", None),
    ("customer.c_mktsegment.complete", "customer", "complete", "c_mktsegment", None),
    ("events.ts.complete", "events", "complete", "ts", None),
    ("events.user_id.complete", "events", "complete", "user_id", None),
    ("lineitem.l_discount.range", "lineitem", "range", "l_discount", (0.0, 1.0)),
    ("lineitem.l_quantity.positive", "lineitem", "positive", "l_quantity", None),
    ("lineitem.l_returnflag.in_set", "lineitem", "in_set", "l_returnflag",
     ("A", "N", "R")),
    ("orders.o_orderkey.unique", "orders", "unique", "o_orderkey", None),
    ("orders.o_orderstatus.in_set", "orders", "in_set", "o_orderstatus",
     ("F", "O", "P")),
    ("orders.o_totalprice.positive", "orders", "positive", "o_totalprice", None),
    ("part.p_size.range", "part", "range", "p_size", (1, 50)),
)


def _check_partials(
    batch: pa.Table, *, table: str, num_buckets: int
) -> pa.Table:
    """Per-batch partial rows for every check on ``table``.

    Scalar checks emit ONE (check_name, n=batch_rows, viol) row;
    uniqueness checks additionally emit their batch-DISTINCT keys as
    (check_name, bkt=key%B, key, is_key=1) rows with a scalar row of
    viol=batch_rows — after the bucket fold credits −(global distinct),
    the sum is exactly count(*) − count(DISTINCT col).
    """
    import pyarrow.compute as pc

    names: list[str] = []
    bkts: list[np.ndarray] = []
    keys: list[np.ndarray] = []
    ns: list[np.ndarray] = []
    viols: list[np.ndarray] = []
    is_key: list[np.ndarray] = []
    m = batch.num_rows

    def scalar_row(name: str, viol: int) -> None:
        names.append(name)
        bkts.append(np.array([0], np.int64))
        keys.append(np.array([0], np.int64))
        ns.append(np.array([m], np.int64))
        viols.append(np.array([viol], np.int64))
        is_key.append(np.array([0], np.int64))

    for name, tbl, kind, col_name, params in _CHECKS:
        if tbl != table:
            continue
        col = batch.column(col_name)
        if kind == "complete":
            scalar_row(name, col.null_count)
        elif kind == "positive":
            v = pc.fill_null(pc.less_equal(col, 0), False)
            scalar_row(name, int(pc.sum(v).as_py() or 0))
        elif kind == "range":
            lo, hi = params
            bad = pc.or_(pc.less(col, lo), pc.greater(col, hi))
            scalar_row(name, int(pc.sum(pc.fill_null(bad, False)).as_py() or 0))
        elif kind == "in_set":
            ok = pc.is_in(col, value_set=pa.array(list(params)))
            bad = pc.and_(pc.is_valid(col), pc.invert(ok))
            scalar_row(name, int(pc.sum(bad).as_py() or 0))
        elif kind == "unique":
            scalar_row(name, m)  # credit −distinct lands after the fold
            valid = col.filter(pc.is_valid(col)).cast(pa.int64())
            uk = np.unique(valid.to_numpy(zero_copy_only=False))
            if len(uk):
                names.extend([name] * len(uk))
                bkts.append((uk % num_buckets).astype(np.int64))
                keys.append(uk)
                ns.append(np.zeros(len(uk), np.int64))
                viols.append(np.zeros(len(uk), np.int64))
                is_key.append(np.ones(len(uk), np.int64))
    return pa.table(
        {
            "check_name": pa.array(names, pa.string()),
            "bkt": pa.array(np.concatenate(bkts) if bkts else np.array([], np.int64)),
            "key": pa.array(np.concatenate(keys) if keys else np.array([], np.int64)),
            "n": pa.array(np.concatenate(ns) if ns else np.array([], np.int64)),
            "viol": pa.array(
                np.concatenate(viols) if viols else np.array([], np.int64)
            ),
            "is_key": pa.array(
                np.concatenate(is_key) if is_key else np.array([], np.int64)
            ),
        }
    )


def _check_bucket_fold(group: pa.Table) -> pa.Table:
    """One (check_name, bkt) group → summed scalar partials plus the
    −distinct credit for uniqueness keys."""
    name = group.column("check_name")[0].as_py()
    is_key = group.column("is_key").combine_chunks().to_numpy(zero_copy_only=False)
    n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
    viol = group.column("viol").combine_chunks().to_numpy(zero_copy_only=False)
    key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
    scal = is_key == 0
    n_sum = int(n[scal].sum())
    viol_sum = int(viol[scal].sum())
    d = int(len(np.unique(key[~scal])))
    return pa.table(
        {
            "check_name": pa.array([name], pa.string()),
            "n": pa.array([n_sum], pa.int64()),
            "viol": pa.array([viol_sum - d], pa.int64()),
        }
    )


def validate_constraints(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """Deequ-style data-quality constraint suite (Schelter et al. 2018)
    over the star schema: completeness, key uniqueness, value ranges and
    set membership, validated in ONE tagged union stream — the ingestion
    contract check beside `profile_columns` and
    `referential_integrity_audit`.

    Scale shape: each table is scanned once with only its checked columns
    (column-pruned read); scalar checks fold map-side to one partial row
    per batch; uniqueness ships batch-DISTINCT keys through a key-hash
    bucket groupby (a key lands wholly in its bucket, so
    count(*) − count(DISTINCT) is an exact sum of bucket terms).  NULLs
    violate only completeness — range/set checks skip them, matching SQL
    comparison semantics.

    Returns (check_name, n_rows, n_violations, passed) sorted by
    check_name.
    """
    import functools

    from ray.data.aggregate import Sum

    tables = sorted({tbl for _, tbl, _, _, _ in _CHECKS})
    cols_by_table = {
        t: sorted({c for _, tbl, _, c, _ in _CHECKS if tbl == t}) for t in tables
    }
    streams = []
    for t in tables:
        src = sf_table(sf_dir, t, columns=cols_by_table[t])
        streams.append(
            src.map_batches(
                functools.partial(_check_partials, table=t, num_buckets=num_buckets),
                batch_format="pyarrow",
                batch_size=65536,
            )
        )
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.union(s)

    agg = (
        unioned.groupby(["check_name", "bkt"])
        .map_groups(_check_bucket_fold, batch_format="pyarrow")
        .groupby("check_name")
        .aggregate(Sum("n", alias_name="n"), Sum("viol", alias_name="viol"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        viol = batch.column("viol").cast(pa.int64())
        return pa.table(
            {
                "check_name": batch.column("check_name"),
                "n_rows": batch.column("n").cast(pa.int64()),
                "n_violations": viol,
                "passed": pc.equal(viol, 0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("check_name")


def validate_constraints_sql() -> str:
    """The UNION-ALL twin generated from the same ``_CHECKS`` spec."""
    parts = []
    for name, tbl, kind, col, params in _CHECKS:
        if kind == "complete":
            v = f"(count(*) - count({col}))"
        elif kind == "unique":
            v = f"(count(*) - count(DISTINCT {col}))"
        elif kind == "positive":
            v = f"count(*) FILTER (WHERE {col} IS NOT NULL AND {col} <= 0)"
        elif kind == "range":
            lo, hi = params
            v = (
                f"count(*) FILTER (WHERE {col} IS NOT NULL "
                f"AND ({col} < {lo} OR {col} > {hi}))"
            )
        elif kind == "in_set":
            vals = ", ".join(f"'{x}'" for x in params)
            v = f"count(*) FILTER (WHERE {col} IS NOT NULL AND {col} NOT IN ({vals}))"
        parts.append(
            f"SELECT '{name}' AS check_name, count(*)::BIGINT AS n_rows,\n"
            f"       {v}::BIGINT AS n_violations FROM {tbl}"
        )
    union = "\nUNION ALL\n".join(parts)
    return (
        "SELECT check_name, n_rows, n_violations, (n_violations = 0) AS passed\n"
        f"FROM (\n{union}\n)\nORDER BY check_name"
    )


EMB_EXPECTED_DIM = 64


def embedding_health(sf_dir: str, *, expected_dim: int = EMB_EXPECTED_DIM) -> rd.Dataset:
    """Vector-column health audit — the `validate_constraints` analog for
    the embedding table: null vectors, wrong dimensionality, NaN/Inf
    components, zero-norm rows (each a way a similarity index silently
    corrupts).  One column-pruned pass, constant-size partials.

    Returns a single row (n_rows, n_null, n_wrong_dim, n_nonfinite,
    n_zero_norm, dim_expected).
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    emb = sf_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        n = batch.num_rows
        n_null = col.null_count
        valid = col.filter(pc.is_valid(col)).combine_chunks()
        lens = np.asarray(pc.list_value_length(valid), dtype=np.int64)
        wrong = int((lens != expected_dim).sum())
        nonfin = zero = 0
        ok = lens == expected_dim
        if ok.any():
            rows = valid.filter(pa.array(ok))
            m = np.asarray(pc.list_flatten(rows), dtype=np.float64).reshape(
                -1, expected_dim
            )
            finite = np.isfinite(m).all(axis=1)
            nonfin = int((~finite).sum())
            norms = np.abs(m[finite]).sum(axis=1)
            zero = int((norms == 0).sum())
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "n_null": pa.array([n_null], pa.int64()),
                "n_wrong_dim": pa.array([wrong], pa.int64()),
                "n_nonfinite": pa.array([nonfin], pa.int64()),
                "n_zero_norm": pa.array([zero], pa.int64()),
            }
        )

    agg = emb.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_null", alias_name="n_null"),
        Sum("n_wrong_dim", alias_name="n_wrong_dim"),
        Sum("n_nonfinite", alias_name="n_nonfinite"),
        Sum("n_zero_norm", alias_name="n_zero_norm"),
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_rows": pa.array([int(agg["n_rows"] or 0)], pa.int64()),
                "n_null": pa.array([int(agg["n_null"] or 0)], pa.int64()),
                "n_wrong_dim": pa.array([int(agg["n_wrong_dim"] or 0)], pa.int64()),
                "n_nonfinite": pa.array([int(agg["n_nonfinite"] or 0)], pa.int64()),
                "n_zero_norm": pa.array([int(agg["n_zero_norm"] or 0)], pa.int64()),
                "dim_expected": pa.array([expected_dim], pa.int64()),
            }
        )
    )


RANGE_PLAN_PARTS = 16


def range_partition_plan(
    sf_dir: str,
    *,
    table: str = "lineitem",
    num_parts: int = RANGE_PLAN_PARTS,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Range-partitioner PLAN for a distributed sort/write on the
    extended-price cents key: the P−1 boundary values at exact ranks
    ``k_i = ⌈i·N/P⌉`` (exact integer ceil) plus, per boundary, how many rows actually fall
    at-or-below it — the skew-aware split a range exchange needs BEFORE
    moving data (`skew_report`'s sibling for ordered keys; ties make a
    naive equal-count split impossible, and ``n_le − rank`` is exactly
    the tie mass the executor must plan around).

    Scale shape: two column-pruned passes — (1) the two-pass distributed
    rank selection on ``63 − bit_length(v)`` range buckets (monotone in
    the value, so bucket order IS value order; no global sort) emits only
    the boundary hits; (2) per-batch ``searchsorted`` partials against
    the broadcast boundaries fold to P−1 exact counts.

    Returns (idx, rank, boundary_cents, n_le) for idx 1..P−1, sorted.
    """
    import math

    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    ds = sf_table(sf_dir, table, columns=["l_extendedprice"])

    def vals(batch: pa.Table) -> pa.Table:
        v = np.round(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vb = 63 - np.frompyfunc(int.bit_length, 1, 1)(
            np.maximum(v, 1).astype(object)
        ).astype(np.int64)
        return pa.table({"v": pa.array(v), "vbkt": pa.array(vb)})

    valued = ds.map_batches(vals, batch_format="pyarrow").materialize()
    parts = valued.groupby("vbkt").aggregate(Count(alias_name="m")).take_all()
    offsets: dict[int, int] = {}
    total = 0
    for r in sorted(parts, key=lambda r: -r["vbkt"]):  # ascending value order
        offsets[r["vbkt"]] = total
        total += r["m"]
    # exact integer ceil — no float rank at any N
    ranks = [
        max(1, (i * total + num_parts - 1) // num_parts)
        for i in range(1, num_parts)
    ]
    ref = ray.put((offsets, ranks))

    def select(group: pa.Table) -> pa.Table:
        off, ks = ray.get(ref)
        base = off[int(group.column("vbkt")[0].as_py())]
        v = group.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        rows = []
        for i, k in enumerate(ks, start=1):
            local = k - base
            if 1 <= local <= len(v):
                rows.append((i, k, int(v[order[local - 1]])))
        return pa.table(
            {
                "idx": pa.array([r[0] for r in rows], pa.int64()),
                "rank": pa.array([r[1] for r in rows], pa.int64()),
                "boundary_cents": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    hits = sorted(
        (
            (r["idx"], r["rank"], r["boundary_cents"])
            for r in valued.groupby("vbkt")
            .map_groups(select, batch_format="pyarrow")
            .take_all()
        )
    )
    bounds = np.array([h[2] for h in hits], dtype=np.int64)
    bref = ray.put(bounds)

    def le_counts(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        v = np.sort(batch.column("v").combine_chunks().to_numpy(zero_copy_only=False))
        n_le = np.searchsorted(v, b, side="right").astype(np.int64)
        return pa.table(
            {
                "idx": pa.array(np.arange(1, len(b) + 1, dtype=np.int64)),
                "n_le": pa.array(n_le),
            }
        )

    from ray.data.aggregate import Sum

    le = (
        valued.map_batches(le_counts, batch_format="pyarrow")
        .groupby("idx")
        .aggregate(Sum("n_le", alias_name="n_le"))
        .take_all()
    )
    le_by_idx = {int(r["idx"]): int(r["n_le"]) for r in le}
    return rd.from_arrow(
        pa.table(
            {
                "idx": pa.array([h[0] for h in hits], pa.int64()),
                "rank": pa.array([h[1] for h in hits], pa.int64()),
                "boundary_cents": pa.array([h[2] for h in hits], pa.int64()),
                "n_le": pa.array([le_by_idx[h[0]] for h in hits], pa.int64()),
            }
        )
    )


def coverage_audit(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """CHILDLESS-parent audit — the complement of
    `referential_integrity_audit`'s orphan check: for every star-schema
    relationship, how many parent rows have no child at all (dead dims,
    customers who never ordered, nations with no suppliers — the
    coverage side of referential health).

    Same tagged-union scale shape: children fold to batch-distinct keys
    map-side, parents ship their keys; one (relation, key-hash) bucket
    groupby counts parents whose key never appears on the child side
    (a key lands wholly in its bucket — exact anti-join).

    Returns (relation, n_parent_rows, n_covered, n_childless) sorted by
    relation; LEFT-JOIN twin.
    """
    import functools

    import pyarrow.compute as pc

    streams = []
    for rel, child_t, child_k, parent_t, parent_k in _FK_RELATIONS:
        child = sf_table(sf_dir, child_t, columns=[child_k])
        parent = sf_table(sf_dir, parent_t, columns=[parent_k])

        def child_rows(batch: pa.Table, *, rel=rel, key_col=child_k) -> pa.Table:
            col = batch.column(key_col)
            keys = (
                col.filter(pc.is_valid(col))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            uk = np.unique(keys)
            return pa.table(
                {
                    "relation": pa.array([rel] * len(uk), pa.string()),
                    "bkt": pa.array((uk % num_buckets).astype(np.int32)),
                    "key": pa.array(uk),
                    "kind": pa.array(np.zeros(len(uk), np.int8)),
                }
            )

        def parent_rows(batch: pa.Table, *, rel=rel, key_col=parent_k) -> pa.Table:
            keys = (
                batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    "relation": pa.array([rel] * len(keys), pa.string()),
                    "bkt": pa.array((keys % num_buckets).astype(np.int32)),
                    "key": pa.array(keys),
                    "kind": pa.array(np.ones(len(keys), np.int8)),
                }
            )

        streams.append(child.map_batches(child_rows, batch_format="pyarrow"))
        streams.append(parent.map_batches(parent_rows, batch_format="pyarrow"))
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.union(s)

    def audit(group: pa.Table) -> pa.Table:
        rel = group.column("relation")[0].as_py()
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        child_keys = np.unique(key[kind == 0])
        parents = key[kind == 1]
        covered = np.isin(parents, child_keys)
        return pa.table(
            {
                "relation": pa.array([rel], pa.string()),
                "n_parent_rows": pa.array([len(parents)], pa.int64()),
                "n_covered": pa.array([int(covered.sum())], pa.int64()),
                "n_childless": pa.array([int((~covered).sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        unioned.groupby(["relation", "bkt"])
        .map_groups(audit, batch_format="pyarrow")
        .groupby("relation")
        .aggregate(
            Sum("n_parent_rows", alias_name="n_parent_rows"),
            Sum("n_covered", alias_name="n_covered"),
            Sum("n_childless", alias_name="n_childless"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "relation": batch.column("relation"),
                "n_parent_rows": batch.column("n_parent_rows").cast(pa.int64()),
                "n_covered": batch.column("n_covered").cast(pa.int64()),
                "n_childless": batch.column("n_childless").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("relation")


def coverage_audit_sql() -> str:
    """The UNION-ALL twin generated from the same ``_FK_RELATIONS``."""
    parts = []
    for rel, child_t, child_k, parent_t, parent_k in _FK_RELATIONS:
        parts.append(
            f"SELECT '{rel}' AS relation, count(*)::BIGINT AS n_parent_rows,\n"
            f"       count(c.k)::BIGINT AS n_covered,\n"
            f"       (count(*) - count(c.k))::BIGINT AS n_childless\n"
            f"FROM {parent_t} p LEFT JOIN\n"
            f"  (SELECT DISTINCT {child_k} AS k FROM {child_t}\n"
            f"   WHERE {child_k} IS NOT NULL) c ON p.{parent_k} = c.k"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{union}\n) ORDER BY relation"


FD_CANDIDATES = (
    # (name, table, lhs, rhs) — candidate functional dependencies to audit
    ("orderkey_determines_status", "lineitem", "l_orderkey", "l_linestatus"),
    ("partkey_determines_brand_flag", "lineitem", "l_partkey", "l_returnflag"),
    ("custkey_determines_priority", "orders", "o_custkey", "o_orderpriority"),
)


def fd_violation_audit(sf_dir: str) -> rd.Dataset:
    """Functional-dependency discovery audit (the Metanome/profiling-suite
    primitive): for each CANDIDATE dependency X → Y, how many X-groups
    map to more than one Y — zero violations means the FD holds and the
    column pair is a normalization/partitioning opportunity; a high rate
    certifies the columns as independent.

    Scale shape: per candidate, ONE map-side-combined pass emits distinct
    (x, y) pairs per batch (the profiler convention — value payloads are
    md5'd above 32 chars is unnecessary here: keys are ints/short enums),
    a single ``groupby(x-hash-bucket)`` fold counts distinct y per x
    inside the bucket (an x lands wholly in one bucket) and emits
    bucket-sized partials.  All-integer output
    (fd_name, n_groups, n_violating, violation_ppm — ppm is integer
    floor on both sides).  Candidates run as a tagged union in one
    pipeline per TABLE, so a table is scanned once no matter how many
    FDs it hosts.  Returns rows sorted by fd_name.
    """
    from ray.data.aggregate import Sum

    by_table: dict[str, list[tuple[str, str, str]]] = {}
    for name, table, lhs, rhs in FD_CANDIDATES:
        by_table.setdefault(table, []).append((name, lhs, rhs))

    parts: list[rd.Dataset] = []
    for table, cands in sorted(by_table.items()):
        cols = sorted({c for _, l, r in cands for c in (l, r)})
        ds = sf_table(sf_dir, table, columns=cols)

        def pair_partials(batch: pa.Table, *, cands=tuple(cands)) -> pa.Table:
            names, bkts, xs, ys = [], [], [], []
            for name, lhs, rhs in cands:
                x = batch.column(lhs).to_numpy(zero_copy_only=False).astype("int64")
                yarr = batch.column(rhs)
                yenc = pc.dictionary_encode(yarr.combine_chunks())
                yi = np.asarray(yenc.indices, dtype=np.int64)
                ydic = [str(v) for v in yenc.dictionary.to_pylist()]
                ny = max(len(ydic), 1)
                uk = np.unique(x * ny + yi)  # batch-distinct (x, y)
                ux = (uk // ny).astype(np.int64)
                uy = (uk % ny).astype(np.int64)
                names.extend([name] * len(uk))
                bkts.extend((ux % 64).tolist())
                xs.extend(ux.tolist())
                ys.extend(ydic[int(i)] for i in uy)
            return pa.table(
                {
                    "fd_name": pa.array(names, pa.string()),
                    "bkt": pa.array(bkts, pa.int64()),
                    "x": pa.array(xs, pa.int64()),
                    "y": pa.array(ys, pa.string()),
                }
            )

        def bucket_fold(group: pa.Table) -> pa.Table:
            # one (fd_name, bkt) per group: distinct-y count per x
            name = group.column("fd_name")[0].as_py()
            x = group.column("x").combine_chunks().to_numpy(zero_copy_only=False)
            yenc = pc.dictionary_encode(group.column("y").combine_chunks())
            yi = np.asarray(yenc.indices, dtype=np.int64)
            ny = max(len(yenc.dictionary), 1)
            uxy = np.unique(x * ny + yi)  # distinct (x, y) across batches
            ux, ycnt = np.unique(uxy // ny, return_counts=True)
            return pa.table(
                {
                    "fd_name": pa.array([name], pa.string()),
                    "n_groups": pa.array([len(ux)], pa.int64()),
                    "n_violating": pa.array([int((ycnt > 1).sum())], pa.int64()),
                }
            )

        parts.append(
            ds.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["fd_name", "bkt"])
            .map_groups(bucket_fold, batch_format="pyarrow")
        )

    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    agg = union.groupby("fd_name").aggregate(
        Sum("n_groups", alias_name="n_groups"),
        Sum("n_violating", alias_name="n_violating"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_groups").to_numpy(zero_copy_only=False)
        v = batch.column("n_violating").to_numpy(zero_copy_only=False)
        ppm = np.where(n > 0, v * 1_000_000 // np.maximum(n, 1), 0)
        return batch.append_column("violation_ppm", pa.array(ppm, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow").sort("fd_name")


FOOTPRINT_TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def parquet_footprint(sf_dir: str) -> rd.Dataset:
    """Storage-layout audit across every driver table from PARQUET FOOTERS
    ONLY — per (table, column): compressed bytes, uncompressed bytes,
    row-group count and row count, the lakehouse capacity/compression
    report (what an ops review reads before re-partitioning or
    re-encoding a table).  No data page is ever read: each task opens one
    file's metadata (O(KB) per table at any corpus size — with
    directory-per-table layouts this maps over the file manifest).

    Scale shape: the table list fans out as a tiny Dataset; one task per
    file reads the footer.  All-integer output; gated via
    `parquet_footprint_digest` (pinned at the gate corpus — byte sizes
    are corpus constants), and pytest cross-checks the numbers against
    DuckDB's independent ``parquet_metadata()`` reader at both SFs.
    Returns (table, column, n_row_groups, n_rows, compressed_bytes,
    uncompressed_bytes) sorted.
    """
    import pyarrow.parquet as pq

    tables = rd.from_items([{"table": t} for t in FOOTPRINT_TABLES])

    def footer(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("table", "column", "n_row_groups", "n_rows",
                               "compressed_bytes", "uncompressed_bytes")}
        for t in batch.column("table").to_pylist():
            md = pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata
            agg: dict[str, list[int]] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    a = agg.setdefault(name, [0, 0])
                    a[0] += int(col.total_compressed_size)
                    a[1] += int(col.total_uncompressed_size)
            for name in sorted(agg):
                out["table"].append(t)
                out["column"].append(name)
                out["n_row_groups"].append(md.num_row_groups)
                out["n_rows"].append(md.num_rows)
                out["compressed_bytes"].append(agg[name][0])
                out["uncompressed_bytes"].append(agg[name][1])
        return pa.table(
            {
                "table": pa.array(out["table"], pa.string()),
                "column": pa.array(out["column"], pa.string()),
                "n_row_groups": pa.array(out["n_row_groups"], pa.int64()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "compressed_bytes": pa.array(out["compressed_bytes"], pa.int64()),
                "uncompressed_bytes": pa.array(out["uncompressed_bytes"], pa.int64()),
            }
        )

    return (
        tables.repartition(len(FOOTPRINT_TABLES))
        .map_batches(footer, batch_format="pyarrow")
        .sort(["table", "column"])
    )


def parquet_footprint_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `parquet_footprint`: (n_rows, digest)."""
    from .fold import fold_int_sums_by_key  # noqa: F401  (module convention)
    from ..pipelines.interpret import DIGEST_MOD, row_digest

    rows = parquet_footprint(sf_dir).take_all()
    dg = 0
    for r in rows:
        pay = "\x1f".join(
            str(r[c])
            for c in ("n_row_groups", "n_rows", "compressed_bytes",
                      "uncompressed_bytes")
        )
        dg = (dg + row_digest(f"{r['table']}\x1f{r['column']}", pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- rendezvous (HRW) placement planner -------------------------------------
RENDEZVOUS_WORKERS = 16


def rendezvous_plan(
    sf_dir: str, *, n_workers: int = RENDEZVOUS_WORKERS
) -> rd.Dataset:
    """Rendezvous / highest-random-weight placement (Thaler & Ravishankar
    1996 — the consistent-hashing scheme behind cache/shard routers):
    assign every source to ``argmax_w md5(source ␟ w)`` and report the
    per-source load the plan moves there.  The HRW property the pytest
    pins: adding a worker relocates ONLY the keys that move TO the new
    worker — every other assignment is untouched (no ring-rebalance
    churn), which is what makes the plan usable for incremental cluster
    resizes at 100 TB.

    Exactness: the weight is the md5 hex string itself (DuckDB ``md5``
    returns the same hex; max over ASCII hex strings is identical in
    both engines, and collisions would need an md5 break).  One corpus
    pass emits per-batch (source, n_docs, n_chars) partials with the
    argmax computed per DISTINCT source via the dictionary; a
    sources-sized aggregate folds.  Returns (source, worker, n_docs,
    n_chars) sorted by source.
    """
    import hashlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def assign(src: str) -> int:
        best_w, best_h = 0, ""
        for w in range(n_workers):
            h = hashlib.md5(f"{src}\x1f{w}".encode("utf-8")).hexdigest()
            if h > best_h:
                best_w, best_h = w, h
        return best_w

    def partials(batch: pa.Table) -> pa.Table:
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        nchars = np.asarray(
            pc.utf8_length(pc.fill_null(batch.column("text").combine_chunks(), "")),
            dtype=np.int64,
        )
        ns = len(senc.dictionary)
        n_docs = np.bincount(si, minlength=ns).astype(np.int64)
        n_ch = np.zeros(ns, np.int64)
        np.add.at(n_ch, si, nchars)
        workers = np.fromiter(
            (assign(s) for s in senc.dictionary.to_pylist()),
            dtype=np.int64,
            count=ns,
        )
        return pa.table(
            {
                "source": senc.dictionary,
                "worker": pa.array(workers),
                "n_docs": pa.array(n_docs),
                "n_chars": pa.array(n_ch),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "worker"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "worker": batch.column("worker").cast(pa.int64()),
                "n_docs": batch.column("n_docs").cast(pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def rendezvous_plan_sql(n_workers: int = RENDEZVOUS_WORKERS) -> str:
    """Generated twin: the same argmax over md5 hex via ``arg_max`` on a
    generated worker series."""
    return f"""
        WITH s AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 sum(length(coalesce(text, '')))::BIGINT AS n_chars
          FROM documents GROUP BY 1
        ),
        a AS (
          SELECT s.source,
                 arg_max(w.w, md5(s.source || chr(31) || w.w::VARCHAR))::BIGINT
                   AS worker
          FROM s CROSS JOIN (
            SELECT unnest(generate_series(0, {n_workers - 1})) AS w
          ) w
          GROUP BY s.source
        )
        SELECT s.source, a.worker, s.n_docs, s.n_chars
        FROM s JOIN a USING (source)
        ORDER BY source
    """


# --- Merkle partition manifest ----------------------------------------------
MERKLE_BUCKETS = 64


def merkle_manifest(
    sf_dir: str, *, num_buckets: int = MERKLE_BUCKETS
) -> rd.Dataset:
    """Two-level Merkle manifest of the corpus: per-document leaf hashes
    ``md5(doc_id ␟ text)`` fold into per-bucket digests
    (``bucket = doc_id % B``), which fold into one root — the
    content-addressed summary that lets two replicas (or two runs of an
    incremental pipeline) agree on WHICH partitions differ by comparing
    B+1 rows instead of re-reading 100 TB (`extraction_delta` finds the
    changed docs; this finds the changed partitions first).

    Deterministic by construction: leaves concatenate in (doc_id) order
    inside a bucket, buckets in bucket order — so the manifest is a pure
    content function, independent of batching (pytest-pinned: editing
    ONE document changes exactly its bucket row and the root).  One
    bucket shuffle; the root folds B rows on the driver.  Returns
    (level, bucket, n_docs, digest) — B ``leaf``-level rows plus one
    ``root`` row (bucket = −1) — sorted by (level, bucket); full md5
    string_agg twin.
    """
    import hashlib

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def leaves(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        hx = [
            hashlib.md5(f"{int(d)}\x1f{t or ''}".encode("utf-8")).hexdigest()
            for d, t in zip(did, texts)
        ]
        return pa.table(
            {
                "bucket": pa.array((did % num_buckets).astype(np.int64)),
                "doc_id": pa.array(did.astype(np.int64)),
                "h": pa.array(hx, pa.string()),
            }
        )

    def bucket_digest(group: pa.Table) -> pa.Table:
        import hashlib

        b = group.column("bucket")[0].as_py()
        did = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        hx = group.column("h").to_pylist()
        order = np.argsort(did, kind="stable")
        cat = "".join(hx[i] for i in order)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "n_docs": pa.array([len(did)], pa.int64()),
                "digest": pa.array(
                    [hashlib.md5(cat.encode("utf-8")).hexdigest()], pa.string()
                ),
            }
        )

    rows = (
        ds.map_batches(leaves, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_digest, batch_format="pyarrow")
        .take_all()
    )  # ≤ B rows
    rows.sort(key=lambda r: r["bucket"])
    root = hashlib.md5("".join(r["digest"] for r in rows).encode("utf-8")).hexdigest()
    lvl = ["leaf"] * len(rows) + ["root"]
    bkt = [r["bucket"] for r in rows] + [-1]
    nd = [r["n_docs"] for r in rows] + [sum(r["n_docs"] for r in rows)]
    dg = [r["digest"] for r in rows] + [root]
    return rd.from_arrow(
        pa.table(
            {
                "level": pa.array(lvl, pa.string()),
                "bucket": pa.array(bkt, pa.int64()),
                "n_docs": pa.array(nd, pa.int64()),
                "digest": pa.array(dg, pa.string()),
            }
        )
    )


def merkle_manifest_sql(num_buckets: int = MERKLE_BUCKETS) -> str:
    """Generated twin: the same two-level md5 fold via ordered string_agg."""
    return f"""
        WITH leaf AS (
          SELECT doc_id % {num_buckets} AS bucket, doc_id,
                 md5(doc_id::VARCHAR || chr(31) || coalesce(text, '')) AS h
          FROM documents
        ),
        b AS (
          SELECT bucket, count(*)::BIGINT AS n_docs,
                 md5(string_agg(h, '' ORDER BY doc_id)) AS digest
          FROM leaf GROUP BY bucket
        ),
        r AS (
          SELECT 'root' AS level, -1::BIGINT AS bucket,
                 sum(n_docs)::BIGINT AS n_docs,
                 md5(string_agg(digest, '' ORDER BY bucket)) AS digest
          FROM b
        )
        SELECT 'leaf' AS level, bucket, n_docs, digest FROM b
        UNION ALL
        SELECT * FROM r
        ORDER BY level, bucket
    """

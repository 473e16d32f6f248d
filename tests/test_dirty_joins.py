"""Dirty-input join semantics (ADVICE r1): orders with custkeys missing
from customer must be DROPPED (inner-join), matching the SQL oracles even
on referential-integrity violations."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def dirty_sf(tmp_path):
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING", "AUTO", "AUTO"]),
                "c_name": pa.array(["a", "b", "c"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    # custkey 999 violates RI; customer 3 has no orders
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2, 999], pa.int64()),
                "o_totalprice": pa.array([10.0, 20.5, 7.25, 99.0]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    # user 2 has events → its orders are NOT "inactive"
    pq.write_table(
        pa.table({"user_id": pa.array([2, 2], pa.int64())}),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def _sql(sf: str, q: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(q).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestDirtyJoins:
    def test_mktsegment_drops_orphan_orders(self, dirty_sf):
        import __ray_entry__ as e
        from ocr_engine_ray.pipelines.joins import mktsegment_revenue

        got = _canon(mktsegment_revenue(dirty_sf).to_pandas())
        exp = _canon(_sql(dirty_sf, e.oracle_sql()["mktsegment_revenue"]))
        pd.testing.assert_frame_equal(got, exp)
        assert 99.0 not in got["total_revenue"].values  # orphan dropped

    def test_inactive_customers_anti_join(self, dirty_sf):
        import __ray_entry__ as e
        from ocr_engine_ray.pipelines.joins import inactive_customer_orders

        got = _canon(inactive_customer_orders(dirty_sf).to_pandas())
        exp = _canon(_sql(dirty_sf, e.oracle_sql()["inactive_customer_orders"]))
        pd.testing.assert_frame_equal(got, exp)


def test_nation_revenue_matches_twin_all_regions(ray_session):
    """Q5 analog: every region + a different date range reproduces the
    DuckDB 5-table join exactly (not just the gated ASIA/96-98 instance)."""
    import duckdb

    from ocr_engine_ray.pipelines.joins import nation_revenue

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for region, y0, y1 in [("AMERICA", 1995, 2002), ("EUROPE", 1997, 1999)]:
        got = [
            (r["n_name"], r["revenue"])
            for r in nation_revenue(sf, region=region, year_from=y0, year_to=y1).take_all()
        ]
        want = con.execute(
            f"""
            SELECT n_name,
                   round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
                         / 100.0, 2) AS revenue
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            WHERE r_name = '{region}'
              AND o_orderdate >= TIMESTAMP '{y0}-01-01'
              AND o_orderdate < TIMESTAMP '{y1}-01-01'
            GROUP BY 1 ORDER BY revenue DESC, n_name
            """
        ).fetchall()
        assert got == [tuple(w) for w in want], region


@pytest.mark.usefixtures("ray_session")
class TestFullOuterReconciliation:
    def test_all_three_classes(self, tmp_path):
        import datetime as dt

        import pyarrow.parquet as _pq

        from ocr_engine_ray.pipelines.joins import customer_order_reconciliation

        d = tmp_path / "fo"
        d.mkdir(parents=True, exist_ok=True)
        # customers 1, 2, 3; orders for 1 (x2), 2, and dangling key 99
        _pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 2, 99], pa.int64()),
                    "o_totalprice": pa.array([10.0, 20.0, 5.0, 7.0], pa.float64()),
                }
            ),
            str(d / "orders.parquet"),
        )
        _pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
            str(d / "customer.parquet"),
        )
        got = {r["presence"]: r for r in customer_order_reconciliation(str(d)).take_all()}
        assert got["both"]["n_keys"] == 2
        assert got["both"]["n_orders"] == 3
        assert got["both"]["order_cents"] == 3500
        assert got["customer_only"]["n_keys"] == 1
        assert got["customer_only"]["n_orders"] == 0
        assert got["order_only"]["n_keys"] == 1
        assert got["order_only"]["order_cents"] == 700

    def test_orders_only_no_customers(self, tmp_path):
        import pyarrow.parquet as _pq

        from ocr_engine_ray.pipelines.joins import customer_order_reconciliation

        d = tmp_path / "oo"
        d.mkdir(parents=True, exist_ok=True)
        _pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([5], pa.int64()),
                    "o_totalprice": pa.array([1.0], pa.float64()),
                }
            ),
            str(d / "orders.parquet"),
        )
        _pq.write_table(
            pa.table({"c_custkey": pa.array([], pa.int64())}),
            str(d / "customer.parquet"),
        )
        got = customer_order_reconciliation(str(d)).take_all()
        assert len(got) == 1
        assert got[0]["presence"] == "order_only"

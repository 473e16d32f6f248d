"""Long→wide pivot (pipelines/analytics.py:pivot_user_event_counts)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import pivot_user_event_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def long_sf(tmp_path):
    rows = [
        (1, "click"), (1, "click"), (1, "view"),
        (2, "purchase"), (2, "weird_type"), (2, None),  # → n_other
        (None, "click"),                                 # dropped
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestPivot:
    def test_wide_counts(self, long_sf):
        rows = {
            r["user_id"]: (r["n_click"], r["n_view"], r["n_purchase"], r["n_other"])
            for r in pivot_user_event_counts(long_sf).take_all()
        }
        assert rows == {1: (2, 1, 0, 0), 2: (0, 0, 1, 2)}

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = pivot_user_event_counts(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["pivot_user_event_counts"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_row_totals_match_event_counts(self):
        df = pivot_user_event_counts(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(
            "SELECT count(*) FROM events WHERE user_id IS NOT NULL"
        ).fetchone()[0]
        wide_cols = [c for c in df.columns if c.startswith("n_")]
        assert int(df[wide_cols].to_numpy().sum()) == want


@pytest.mark.usefixtures("ray_session")
class TestUnpivot:
    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        from ocr_engine_ray.pipelines.analytics import unpivot_lineitem_measures

        got = unpivot_lineitem_measures(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
        )
        want = con.execute(e.oracle_sql()["unpivot_lineitem_measures"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_nulls_fold(self, tmp_path):
        from ocr_engine_ray.pipelines.analytics import unpivot_lineitem_measures

        pq.write_table(
            pa.table(
                {
                    "l_quantity": pa.array([1.0, None, 3.0], pa.float64()),
                    "l_extendedprice": pa.array([None, None, None], pa.float64()),
                    "l_discount": pa.array([0.05, 0.10, 0.0], pa.float64()),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        rows = {
            r["measure"]: (r["n_values"], r["n_nulls"], r["sum_cents"])
            for r in unpivot_lineitem_measures(str(tmp_path)).take_all()
        }
        assert rows == {
            "l_quantity": (2, 1, 400),
            "l_extendedprice": (0, 3, 0),
            "l_discount": (3, 0, 15),
        }

"""Profiler histograms (pipelines/profile.py:profile_histograms)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import profile_histograms

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestProfileHistograms:
    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = profile_histograms(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
        )
        want = con.execute(e.oracle_sql()["profile_histograms"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bin_bounds_partition_the_range(self):
        df = profile_histograms(SF).to_pandas()
        for _, g in df.groupby("col_name"):
            g = g.sort_values("bin")
            # bounds are contiguous for adjacent bins present in the data
            for (_, a), (_, b) in zip(g.iterrows(), g.iloc[1:].iterrows()):
                if b["bin"] == a["bin"] + 1:
                    assert b["lo_q"] == a["hi_q"] + 1
            assert (g["lo_q"] <= g["hi_q"]).all()
            assert g["bin"].between(0, 15).all()

    def test_counts_total_to_nonnull_rows(self):
        df = profile_histograms(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
        )
        for c in ("l_quantity", "l_extendedprice", "l_discount"):
            want = con.execute(f"SELECT count({c}) FROM lineitem").fetchone()[0]
            assert df[df["col_name"] == c]["n"].sum() == want

    def test_nulls_and_constant_column(self, tmp_path):
        # a constant column lands entirely in bin 0 (width 1); nulls skipped
        rows = [
            {"l_quantity": 5.0, "l_extendedprice": None, "l_discount": 0.02},
            {"l_quantity": 5.0, "l_extendedprice": 10.0, "l_discount": None},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "lineitem.parquet"))
        df = profile_histograms(str(tmp_path)).to_pandas()
        q = df[df["col_name"] == "l_quantity"]
        assert q["bin"].tolist() == [0] and q["n"].tolist() == [2]
        assert df[df["col_name"] == "l_extendedprice"]["n"].sum() == 1

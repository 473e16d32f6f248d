"""Column profiler: planted nulls/duplicates corpus + bucket invariance.
The sf-scale twin equality runs via scripts/compare_oracle.py
(`profile_lineitem`)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import profile_columns

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(
        (r["col_name"], r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in ds.take_all()
    )


class TestProfile:
    def test_planted_nulls_and_dupes(self, ray_session, tmp_path):
        t = pa.table(
            {
                "a": pa.array([1, 1, 2, None, None], pa.int64()),
                "b": pa.array(["x", "x", "x", "x", None], pa.string()),
                "c": pa.array([0.5, -0.5, 0.5, 2.25, 2.25], pa.float64()),
            }
        )
        d = tmp_path / "prof"
        d.mkdir()
        pq.write_table(t, str(d / "t.parquet"))
        got = _rows(profile_columns(str(d), table="t"))
        assert got == [
            ("a", 5, 2, 2),  # nulls excluded from distinct, 1 and 2 remain
            ("b", 5, 1, 1),
            ("c", 5, 0, 3),  # 0.5 != -0.5
        ]

    def test_bucket_invariance_and_sf_sanity(self, ray_session):
        a = _rows(profile_columns(SF, table="orders"))
        b = _rows(profile_columns(SF, table="orders", num_buckets=5))
        assert a == b
        by_col = {c: (r, n, d) for c, r, n, d in a}
        n_rows = by_col["o_orderkey"][0]
        # orderkey is the primary key: fully distinct, never null
        assert by_col["o_orderkey"] == (n_rows, 0, n_rows)

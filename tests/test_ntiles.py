"""NTILE quality quartiles (pipelines/packing.py:quality_ntiles)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.packing import quality_ntiles

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestQualityNtiles:
    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = quality_ntiles(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = con.execute(e.oracle_sql()["quality_ntiles"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_uneven_and_tiny_sources(self, tmp_path):
        # n=5 with 4 tiles → sizes 2,1,1,1; n=2 (< tiles) → tiles 1,2 only —
        # the NTILE integer-split edge cases, checked against DuckDB's NTILE
        rows = [
            {"doc_id": i, "source": "big", "text": "w " * (i + 1)} for i in range(5)
        ] + [
            {"doc_id": 10 + i, "source": "tiny", "text": "x " * (i + 1)}
            for i in range(2)
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = quality_ntiles(str(d)).to_pandas()
        big = got[got["source"] == "big"]
        assert big["n_docs"].tolist() == [2, 1, 1, 1]
        tiny = got[got["source"] == "tiny"]
        assert tiny["tile"].tolist() == [1, 2]
        assert tiny["n_docs"].tolist() == [1, 1]

    def test_tile_totals_match_source_counts(self):
        got = quality_ntiles(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = dict(
            con.execute("SELECT source, count(*) FROM documents GROUP BY 1").fetchall()
        )
        assert got.groupby("source")["n_docs"].sum().to_dict() == want

"""Entity-resolution golden records (pipelines/fuzzy.py:entity_golden_records)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.fuzzy import entity_golden_records

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def er_sf(tmp_path):
    """Transitive chain (A~B, B~C but NOT A~C directly), a separate pair,
    and singletons that must not appear."""
    rows = [
        {"c_custkey": 1, "c_name": "smith johx"},   # dist 1 from key 2
        {"c_custkey": 2, "c_name": "smith john"},
        {"c_custkey": 3, "c_name": "smith johnn"},  # dist 1 from key 2, 2 from key 1
        {"c_custkey": 10, "c_name": "acme corp"},
        {"c_custkey": 11, "c_name": "acme core"},   # dist 1 from 10
        {"c_custkey": 20, "c_name": "zzz unique zzz"},
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "customer.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestGoldenRecords:
    def test_transitive_closure_and_survivorship(self, er_sf):
        rows = [
            (r["canonical_key"], r["n_members"], r["canonical_name"])
            for r in entity_golden_records(er_sf).take_all()
        ]
        # chain {1,2,3} folds to canonical 1; pair {10,11} to 10; 20 absent
        assert rows == [
            (1, 3, "smith johx"),
            (10, 2, "acme corp"),
        ]

    def test_matches_registered_twin(self, er_sf):
        import __ray_entry__ as e

        got = entity_golden_records(er_sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{er_sf}/customer.parquet')"
        )
        want = con.execute(e.oracle_sql()["entity_golden_records"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = entity_golden_records(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
        )
        want = con.execute(e.oracle_sql()["entity_golden_records"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

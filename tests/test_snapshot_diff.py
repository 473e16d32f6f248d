"""CDC snapshot diff (pipelines/merge.py:snapshot_diff)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_engine_ray.pipelines.merge import snapshot_diff


@pytest.fixture()
def diff_sf(tmp_path):
    rows = [
        # 0: %7, %11, %13 all hit -> deleted wins (%11) in the derived v2
        {"doc_id": 0, "text": "zero", "lang": "en", "source": "s", "n_chars": 4},
        {"doc_id": 7, "text": "seven", "lang": "en", "source": "s", "n_chars": 5},
        {"doc_id": 11, "text": "eleven", "lang": "en", "source": "s", "n_chars": 6},
        {"doc_id": 13, "text": "thirteen", "lang": "en", "source": "s", "n_chars": 8},
        {"doc_id": 3, "text": None, "lang": None, "source": "s", "n_chars": 0},
        {"doc_id": 5, "text": "five", "lang": "en", "source": "s", "n_chars": 4},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestSnapshotDiff:
    def test_derived_v2_matches_oracle(self, diff_sf):
        got = sorted(
            (r["doc_id"], r["change"]) for r in snapshot_diff(diff_sf).take_all()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{diff_sf}/documents.parquet')"
        )
        import __ray_entry__ as entrymod

        want = [
            (r[0], r[1])
            for r in con.execute(entrymod.oracle_sql()["snapshot_diff"]).fetchall()
        ]
        assert got == sorted(want)
        # the planted structure: 0 and 11 deleted, 7 updated, 13 inserts
        # 1000013, null-columned doc 3 UNCHANGED (null-safe compare)
        changes = dict(got)
        assert changes[0] == "deleted" and changes[11] == "deleted"
        assert changes[7] == "updated"
        assert changes[1000013] == "inserted" and changes[1000000] == "inserted"
        assert 3 not in changes and 5 not in changes

    def test_explicit_v2_identical_snapshot_is_empty(self, diff_sf):
        base = rd.read_parquet(f"{diff_sf}/documents.parquet")
        assert snapshot_diff(diff_sf, v2=base).take_all() == []

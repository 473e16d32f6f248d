"""Character-hygiene audit over planted dirty documents."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import encoding_audit

DIRTY = [
    ("web", "clean words only"),
    ("web", "bad\x00byte and bell\x07here"),          # 2 control
    ("web", "moji�bake��"),             # 3 replacement
    ("pdf", "non breaking space"),           # 2 nbsp
    ("pdf", "zero​width‍ and bom ﻿"),   # 3 zero-width
    ("pdf", "tab\tand\nnewline\rare fine"),            # tolerated controls
    ("pdf", None),
]


def _write(d):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in DIRTY], pa.string()),
                "text": pa.array([r[1] for r in DIRTY], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestEncodingAudit:
    def test_planted_counts(self, tmp_path):
        sf = _write(tmp_path / "d")
        got = {r["source"]: r for r in encoding_audit(sf).take_all()}
        web, pdf = got["web"], got["pdf"]
        assert (web["n_control"], web["n_replacement"]) == (2, 3)
        assert (web["n_nbsp"], web["n_zero_width"]) == (0, 0)
        assert web["n_docs_flagged"] == 2
        assert (pdf["n_control"], pdf["n_nbsp"], pdf["n_zero_width"]) == (0, 2, 3)
        assert pdf["n_docs_flagged"] == 2  # \t\n\r doc and null doc are clean

    def test_matches_duckdb_twin(self, tmp_path):
        sf = _write(tmp_path / "t")
        import __ray_entry__ as entry

        sql = entry.oracle_sql()["encoding_audit"]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(sql).fetch_arrow_table().to_pandas()
        got = (
            encoding_audit(sf)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert got.equals(want.sort_values("source").reset_index(drop=True))

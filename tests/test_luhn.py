"""Luhn-validated PII number scan."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.tagger import _luhn_ok, luhn_pii_scan

VALID_PAN = "4539578763621486"    # passes Luhn
INVALID_PAN = "4539578763621487"  # off-by-one: fails


def test_luhn_kernel():
    assert _luhn_ok(VALID_PAN)
    assert not _luhn_ok(INVALID_PAN)
    assert _luhn_ok("79927398713")  # the canonical Luhn test vector


def _write(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestLuhnScan:
    def test_planted_pans(self, tmp_path):
        rows = [
            ("a", f"card {VALID_PAN} charged"),
            ("a", f"typo {INVALID_PAN} here"),
            ("a", "short 12345 run and 123456789012 too short"),
            ("b", f"two: {VALID_PAN} and {VALID_PAN}"),
            ("b", None),
        ]
        sf = _write(tmp_path / "p", rows)
        got = {r["source"]: r for r in luhn_pii_scan(sf).take_all()}
        a, b = got["a"], got["b"]
        assert (a["n_digit_runs"], a["n_luhn_valid"], a["n_docs_flagged"]) == (2, 1, 1)
        assert (b["n_digit_runs"], b["n_luhn_valid"], b["n_docs_flagged"]) == (2, 2, 1)
        assert a["n_docs"] == 3 and b["n_docs"] == 2

    def test_matches_duckdb_twin(self, tmp_path):
        rows = [
            ("s", f"{VALID_PAN} mid 79927398713x and 4111111111111111"),
            ("t", f"run {INVALID_PAN}{''} plus 1234567890123 (13 digits)"),
        ]
        sf = _write(tmp_path / "t", rows)
        import __ray_entry__ as entry

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = (
            con.execute(entry.oracle_sql()["luhn_pii_scan"])
            .fetch_arrow_table()
            .to_pandas()
        )
        got = luhn_pii_scan(sf).to_pandas()
        assert got.equals(want)

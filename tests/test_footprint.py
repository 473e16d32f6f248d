"""Parquet footer storage audit."""

from __future__ import annotations

import re

import duckdb
import pytest

from ocr_engine_ray.pipelines.diagnostics import (
    FOOTPRINT_TABLES,
    parquet_footprint,
    parquet_footprint_digest,
)

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["parquet_footprint_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


@pytest.mark.usefixtures("ray_session")
class TestFootprint:
    def test_literal_matches_recompute(self):
        t = parquet_footprint_digest(SF_GATE)
        assert _pinned() == (
            t.column("n_rows")[0].as_py(),
            t.column("digest")[0].as_py(),
        )

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", SF_GATE])
    def test_matches_duckdb_metadata_reader(self, sf):
        rows = parquet_footprint(sf).take_all()
        con = duckdb.connect()
        for table in FOOTPRINT_TABLES:
            want = {
                # DuckDB renders nested paths "a, list, element";
                # pyarrow renders "a.list.element" — same path
                k.replace(", ", "."): v
                for k, v in con.execute(
                    f"""SELECT path_in_schema,
                               sum(total_compressed_size)::BIGINT
                        FROM parquet_metadata('{sf}/{table}.parquet')
                        GROUP BY 1"""
                ).fetchall()
            }
            got = {
                r["column"]: r["compressed_bytes"]
                for r in rows
                if r["table"] == table
            }
            assert got == want, table

"""Pareto-frontier skyline selection (pipelines/profile.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import quality_pareto_frontier

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted_sf(tmp_path):
    """Hand-solvable skyline on (maximize distinct tokens, minimize length).

    doc 0: nw=2, dt=2  — frontier (nothing shorter with >= richness)
    doc 1: nw=4, dt=2  — dominated by doc 0 (same dt, longer)
    doc 2: nw=4, dt=4  — frontier (richer than anything shorter)
    doc 3: nw=4, dt=4  — duplicate point of doc 2 → ALSO frontier
    doc 4: nw=6, dt=3  — dominated by doc 2 (shorter AND richer)
    doc 5: nw=6, dt=6  — frontier
    """
    texts = {
        0: "a b",
        1: "a b a b",
        2: "a b c d",
        3: "a b c d",
        4: "a b c a b c",
        5: "a b c d e f",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestSkyline:
    def test_planted_frontier(self, planted_sf):
        got = [r["doc_id"] for r in quality_pareto_frontier(planted_sf).take_all()]
        assert got == [0, 2, 3, 5]

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = quality_pareto_frontier(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = con.execute(e.oracle_sql()["quality_pareto_frontier"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert 0 < len(got) < 500  # non-degenerate

    def test_block_split_invariance(self, tmp_path):
        """Same planted corpus as one-row-per-file: every local skyline is
        a singleton, so phase 2 must re-derive the frontier from raw
        candidates — exercises the two-phase merge for real."""
        texts = {0: "a b", 1: "a b a b", 2: "a b c d",
                 3: "a b c d", 4: "a b c a b c", 5: "a b c d e f"}
        d = tmp_path / "documents.parquet"
        d.mkdir()
        for k, t in texts.items():
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([k], pa.int64()),
                        "text": pa.array([t], pa.string()),
                    }
                ),
                str(d / f"part-{k}.parquet"),
            )
        got = [r["doc_id"] for r in quality_pareto_frontier(str(tmp_path)).take_all()]
        assert got == [0, 2, 3, 5]

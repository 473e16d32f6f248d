"""Per-source exact-duplicate rate."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import dedup_rate_by_source


@pytest.mark.usefixtures("ray_session")
class TestDedupRate:
    def test_planted_rates(self, tmp_path):
        d = tmp_path / "r"
        d.mkdir()
        rows = (
            [("a", "same text")] * 4
            + [("a", "unique one")]
            + [("b", "x"), ("b", "y"), ("b", None), ("b", "")]
        )
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
        got = {r["source"]: r for r in dedup_rate_by_source(str(d)).take_all()}
        a = got["a"]
        assert (a["n_docs"], a["n_distinct"]) == (5, 2)
        assert a["dup_rate_ppm"] == 3 * 1_000_000 // 5
        b = got["b"]
        # null and '' normalize to the same key (the exact_dedup rule)
        assert (b["n_docs"], b["n_distinct"]) == (4, 3)

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        x = dedup_rate_by_source(sf, num_buckets=2).to_pandas()
        y = dedup_rate_by_source(sf, num_buckets=32).to_pandas()
        assert x.equals(y)

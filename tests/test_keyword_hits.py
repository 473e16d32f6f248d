"""Dictionary keyword tagging."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import keyword_hits


def _write_docs(d, rows):
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
class TestKeywordHits:
    def test_counts_and_doc_flags(self, tmp_path):
        sf = _write_docs(
            tmp_path / "k",
            [
                ("a", "spark spark and sparkle"),  # 3 non-overlapping 'spark'
                ("a", "no hits here"),
                ("b", "merge then merge"),
                ("b", None),
            ],
        )
        got = {
            (r["source"], r["keyword"]): (r["n_docs"], r["n_hits"])
            for r in keyword_hits(sf, keywords=("spark", "merge")).take_all()
        }
        assert got[("a", "spark")] == (1, 3)
        assert got[("a", "merge")] == (0, 0)
        assert got[("b", "merge")] == (1, 2)
        assert got[("b", "spark")] == (0, 0)

    def test_overlapping_keyword_convention(self, tmp_path):
        # non-overlapping left-to-right: 'aa' in 'aaaa' counts twice
        sf = _write_docs(tmp_path / "o", [("s", "aaaa")])
        got = keyword_hits(sf, keywords=("aa",)).take_all()
        assert got[0]["n_hits"] == 2

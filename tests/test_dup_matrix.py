"""Cross-source near-duplication contamination matrix."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import cross_source_dup_matrix


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


LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.mark.usefixtures("ray_session")
class TestDupMatrix:
    def test_planted_cross_and_within(self, tmp_path):
        sf = _write_docs(
            tmp_path / "m",
            [
                ("web", LONG),          # 0
                ("books", LONG),        # 1  cross web×books
                ("web", LONG),          # 2  within web (and × 0,1)
                ("web", "totally different words here that match nothing at all"),
                ("code", "def f(x): return x plus one and then some more tokens"),
            ],
        )
        got = {
            (r["source_a"], r["source_b"]): r["n_pairs"]
            for r in cross_source_dup_matrix(sf).take_all()
        }
        # pairs: (0,1) web×books, (0,2) web×web, (1,2) books×web
        assert got[("books", "web")] == 2
        assert got[("web", "web")] == 1
        assert ("code", "code") not in got

    def test_no_dups_empty(self, tmp_path):
        sf = _write_docs(
            tmp_path / "e",
            [
                ("a", "one two three four five six"),
                ("b", "seven eight nine ten eleven twelve"),
            ],
        )
        assert cross_source_dup_matrix(sf).count() == 0

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = cross_source_dup_matrix(sf, num_buckets=3).to_pandas()
        b = cross_source_dup_matrix(sf, num_buckets=32).to_pandas()
        assert a.equals(b)

"""HLL set-algebra vocabulary overlap."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import vocab_sketch_rows
from ocr_engine_ray.pipelines.textstats import (
    vocab_overlap_sketch,
    vocab_sketch_digest,
)

SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (registers + estimates + digest
    recomputed wholesale), not a pinned literal — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con.execute(e.oracle_sql()["vocab_sketch_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes (different digests)
    assert _computed(SF_GATE) == vocab_sketch_rows(SF_GATE)
    assert _computed("/root/testdata/sf0.001") == vocab_sketch_rows(
        "/root/testdata/sf0.001"
    )


def _write(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestVocabSketch:
    def test_disjoint_and_identical(self, tmp_path):
        # a/b share every token; c is disjoint
        rows = [
            ("a", "alpha beta gamma delta"),
            ("b", "alpha beta gamma delta"),
            ("c", "uno dos tres cuatro"),
        ]
        sf = _write(tmp_path / "d", rows)
        got = {
            (r["source_a"], r["source_b"]): r
            for r in vocab_overlap_sketch(sf).to_pylist()
        }
        ab = got[("a", "b")]
        assert ab["est_union"] == ab["est_a"] == ab["est_b"]
        assert ab["jaccard_ppm"] == 1_000_000
        ac = got[("a", "c")]
        assert ac["est_inter"] == 0 and ac["jaccard_ppm"] == 0

    def test_estimates_close_to_truth(self, tmp_path):
        # 600 tokens in a, 600 in b, 200 shared -> ~1.6% HLL error
        a_toks = [f"w{i}" for i in range(600)]
        b_toks = [f"w{i}" for i in range(400, 1000)]
        rows = [("a", " ".join(a_toks)), ("b", " ".join(b_toks))]
        sf = _write(tmp_path / "e", rows)
        r = vocab_overlap_sketch(sf).to_pylist()[0]
        assert abs(r["est_a"] - 600) / 600 < 0.06
        assert abs(r["est_union"] - 1000) / 1000 < 0.06
        assert abs(r["est_inter"] - 200) / 200 < 0.35  # IE error compounds

    def test_engine_matches_sequential_twin(self):
        sf = "/root/testdata/sf0.001"
        t = vocab_sketch_digest(sf)
        eng = (t.column("n_pairs")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == vocab_sketch_rows(sf)

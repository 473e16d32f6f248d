"""RAKE keyphrase extraction."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import rake_rows
from ocr_engine_ray.pipelines.textstats import rake_digest, rake_keyphrases

SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (`_RAKE_SQL`) — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con.execute(e.oracle_sql()["rake_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes
    assert _computed(SF_GATE) == rake_rows(SF_GATE)
    assert _computed("/root/testdata/sf0.001") == rake_rows(
        "/root/testdata/sf0.001"
    )


def _write(d, texts):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestRake:
    def test_stopword_split_and_scoring(self, tmp_path):
        # "machine learning" co-occur (degree boost); "rust" stands alone
        texts = [
            "the machine learning model is a machine learning tool",
            "rust for the win",
        ] * 3
        sf = _write(tmp_path / "r", texts)
        t = rake_keyphrases(sf)
        phrases = t.column("phrase").to_pylist()
        assert "machine learning model" in phrases or "machine learning tool" in phrases
        # multiword phrases outrank single words (degree/freq favors runs)
        assert " " in phrases[0]
        # stopwords never appear inside phrases
        for p in phrases:
            assert not ({"the", "is", "a", "for"} & set(p.split()))

    def test_engine_matches_sequential_twin(self, tmp_path):
        texts = ["alpha beta the gamma delta of beta alpha", "gamma of alpha beta"]
        sf = _write(tmp_path / "m", texts)
        t = rake_digest(sf)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == rake_rows(sf)

    def test_gate_scale_agreement(self):
        sf = "/root/testdata/sf0.001"
        t = rake_digest(sf)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == rake_rows(sf)

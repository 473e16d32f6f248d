"""Per-source Flesch reading-ease from exact RE2 counter sums."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import readability_by_source


def _write_docs(d, rows):
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
class TestReadability:
    def test_known_counts(self, tmp_path):
        # "go on. we sit!" -> words 4, sentences 2 ([.] and [!]),
        # vowel groups: o, o, e, i -> 4
        sf = _write_docs(tmp_path / "k", [("A", "go on. we sit!")])
        r = readability_by_source(sf).take_all()[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (4, 2, 4)
        want = 206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (4.0 / 4.0)
        assert r["fre_ppm"] == int(np.round(want * 1_000_000))

    def test_degenerate_sources(self, tmp_path):
        # B: no sentence punctuation -> one sentence per doc (fallback);
        # C: empty text (no words) -> score 0
        sf = _write_docs(
            tmp_path / "d", [("B", "plain words no period"), ("C", "")]
        )
        got = {r["source"]: r for r in readability_by_source(sf).take_all()}
        assert got["B"]["n_sentences"] == 1
        # vowel groups: pl(ai)n, w(o)rds, n(o), p(e)r(io)d -> 5
        want = 206.835 - 1.015 * (4.0 / 1.0) - 84.6 * (5.0 / 4.0)
        assert got["B"]["fre_ppm"] == int(np.round(want * 1_000_000))
        assert got["C"]["fre_ppm"] == 0

    def test_null_text_and_multidoc_sum(self, tmp_path):
        rows = [("A", "a cat sat."), ("A", None), ("A", "it ran! far?")]
        sf = _write_docs(tmp_path / "n", rows)
        r = readability_by_source(sf).take_all()[0]
        # words: 3 + 0 + 3; sentences: 1 + 1 (null fallback) + 2;
        # vowel groups: a,a,a + i,a,a
        assert (r["n_docs"], r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            3, 6, 4, 6,
        )

    def test_case_class_not_casefold(self, tmp_path):
        # Y counts as a vowel in both cases; consonant-only words give 0
        sf = _write_docs(tmp_path / "y", [("A", "MY gym. BRR!")])
        r = readability_by_source(sf).take_all()[0]
        assert r["n_syllables"] == 2  # Y, y — BRR has none

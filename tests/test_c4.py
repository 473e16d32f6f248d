"""C4 line/page cleaning heuristics (Raffel et al. 2020 §2.2)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.decontam import c4_quality_filters

_TOK = re.compile(r"[^ \t\n\f\r]+")  # RE2 \S


def _naive(doc_id: int, text: str):
    n_lines = kept_lines = kept_words = n_sentences = 0
    for raw in (text or "").split("\n"):
        lt = raw.rstrip(" \t\r")
        n_lines += 1
        nw = len(_TOK.findall(lt))
        kept = (
            bool(re.search(r'[.!?"]$', lt))
            and nw >= 5
            and "javascript" not in lt.lower()
        )
        if kept:
            kept_lines += 1
            kept_words += nw
            n_sentences += len(re.findall(r"[.!?]", lt))
    keep = (
        kept_lines >= 1
        and n_sentences >= 3
        and "lorem ipsum" not in (text or "").lower()
        and "{" not in (text or "")
    )
    return (doc_id, n_lines, kept_lines, kept_words, n_sentences, keep)


CASES = [
    (0, "A good long sentence here. Plus more!\nAnd a third one right here today."),
    (1, "short line.\nno terminal punct here at all\nWords words words words words."),
    (2, "This page uses javascript to render. And yet more text follows here!"),
    (3, "Curly { brace page with fine sentences. One more here. And a third one."),
    (4, "Lorem Ipsum filler text would be dropped. Always. By the page filter."),
    (5, ""),
    (6, 'He said "stop right there my good friend." Then? Then we went home now.'),
    (7, "tab trailing line ends well here.\t\nanother full sentence is right here."),
]


@pytest.mark.usefixtures("ray_session")
class TestC4Filters:
    def test_matches_naive_on_planted(self, tmp_path):
        d = tmp_path / "c4"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([c[0] for c in CASES], pa.int64()),
                    "text": pa.array([c[1] for c in CASES], pa.string()),
                    "lang": pa.array(["en"] * len(CASES)),
                    "source": pa.array(["s"] * len(CASES)),
                    "n_chars": pa.array([len(c[1]) for c in CASES], pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = [tuple(r.values()) for r in c4_quality_filters(str(d)).take_all()]
        want = [_naive(i, t) for i, t in CASES]
        assert got == want
        by_id = {r[0]: r[5] for r in got}
        assert by_id[0] is True  # clean multi-sentence page
        assert by_id[1] is False  # only one kept line -> 1 sentence < 3
        assert by_id[2] is False  # javascript line dropped -> too few sentences
        assert by_id[3] is False  # curly brace page
        assert by_id[4] is False  # lorem ipsum page
        assert by_id[5] is False  # empty
        assert by_id[6] is True  # quote-terminated line kept
        assert by_id[7] is False  # 2 kept lines but only 2 sentences

    def test_matches_naive_on_corpus(self):
        sf = "/root/testdata/sf0.001"
        rows = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        want = sorted(_naive(r["doc_id"], r["text"]) for r in rows)
        got = [tuple(r.values()) for r in c4_quality_filters(sf).take_all()]
        assert got == want

    def test_null_text_survives(self, tmp_path):
        d = tmp_path / "n"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([None], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = c4_quality_filters(str(d)).take_all()
        assert got == [
            {
                "doc_id": 1,
                "n_lines": 1,
                "kept_lines": 0,
                "kept_words": 0,
                "n_sentences": 0,
                "c4_keep": False,
            }
        ]

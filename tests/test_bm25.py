"""BM25 ranked retrieval on the 2^40 integer grid."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.index import BM25_B, BM25_K1, bm25_sql, bm25_topk

_TOK = re.compile(r"[^ \t\n\f\r]+")


def _naive(rows, query: str, k: int = 20):
    words = sorted(set(query.split()))
    docs = {r["doc_id"]: _TOK.findall(r["text"] or "") for r in rows}
    n = len(docs)
    tot = sum(len(t) for t in docs.values())
    df = {w: sum(1 for t in docs.values() if w in t) for w in words}
    scores = {}
    for d, toks in docs.items():
        dl = len(toks)
        s, hit = 0, False
        for w in words:
            tf = toks.count(w)
            if tf == 0 or df[w] == 0:
                continue
            hit = True
            idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            term = (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl * n) / float(tot)))
            )
            s += int(np.round(term * 1099511627776.0))
        if hit:  # docs without any query term are not retrieved
            scores[d] = s
    head = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(head)]


def _write_docs(d, texts):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def test_matches_naive_on_corpus(self):
        sf = "/root/testdata/sf0.001"
        rows = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        want = _naive(rows, "sort query data")
        got = [tuple(r.values()) for r in bm25_topk(sf).to_pylist()]
        assert got == want

    def test_ranking_semantics(self, tmp_path):
        # doc 0 mentions the rare term; doc 1 spams a common one; doc 2 none
        sf = _write_docs(
            tmp_path / "r",
            [
                "zebra walks home common common",
                "common common common common common",
                "nothing relevant here at all",
                "common zebra",
            ],
        )
        got = bm25_topk(sf, query="zebra common", k=4).to_pylist()
        ids = [r["doc_id"] for r in got]
        # both zebra docs outrank the spam doc; the no-hit doc 2 is not
        # retrieved at all
        assert set(ids[:2]) == {0, 3}
        assert ids[2] == 1
        assert len(got) == 3

    def test_missing_term_is_ignored(self, tmp_path):
        sf = _write_docs(tmp_path / "m", ["alpha beta", "beta gamma"])
        got = bm25_topk(sf, query="beta qqqqq", k=2).to_pylist()
        want = _naive(
            [{"doc_id": 0, "text": "alpha beta"}, {"doc_id": 1, "text": "beta gamma"}],
            "beta qqqqq",
            k=2,
        )
        assert [tuple(r.values()) for r in got] == want

    def test_bucket_invariance_and_twin(self, tmp_path):
        import duckdb

        sf = _write_docs(
            tmp_path / "t",
            [f"w{i % 7} filler sort data " + "pad " * (i % 11) for i in range(60)],
        )
        a = bm25_topk(sf, num_buckets=3)
        b = bm25_topk(sf, num_buckets=64)
        assert a.equals(b)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(bm25_sql()).df()
        assert a.to_pandas().equals(want)

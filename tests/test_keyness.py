"""Keyness: per-source log-odds-ratio top terms."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import keyness_log_odds

_TOK = re.compile(r"[^ \t\n\f\r]+")
_Q40 = 1099511627776.0


def _naive(rows, top_k=10):
    from collections import Counter, defaultdict

    tc: Counter = Counter()
    for r in rows:
        for w in _TOK.findall(r["text"] or ""):
            tc[(r["source"], w)] += 1
    gt: Counter = Counter()
    st: Counter = Counter()
    for (s, w), c in tc.items():
        gt[w] += c
        st[s] += c
    n = sum(st.values())
    v = len(gt)
    per_source = defaultdict(list)
    for (s, w), c in tc.items():
        yr = gt[w] - c
        nr = n - st[s]
        z = (
            (
                math.log((c + 1.0) / (st[s] + v - c - 1.0))
                - math.log((yr + 1.0) / (nr + v - yr - 1.0))
            )
            / math.sqrt(1.0 / (c + 1.0) + 1.0 / (yr + 1.0))
            * _Q40
        )
        per_source[s].append((int(np.round(z)), w))
    out = []
    for s in sorted(per_source):
        ranked = sorted(per_source[s], key=lambda t: (-t[0], t[1]))[:top_k]
        for i, (zq, w) in enumerate(ranked, start=1):
            out.append((s, i, w, zq))
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
class TestKeyness:
    def test_exclusive_token_tops_its_source(self, tmp_path):
        rows = (
            [{"source": "a", "text": "common words here plus shibboleth"}] * 5
            + [{"source": "b", "text": "common words here plus ordinary"}] * 5
        )
        sf = _write_docs(tmp_path / "x", rows)
        got = [tuple(r.values()) for r in keyness_log_odds(sf).take_all()]
        assert got == _naive(rows)
        top = {r[0]: r[2] for r in got if r[1] == 1}
        assert top == {"a": "shibboleth", "b": "ordinary"}

    def test_matches_naive_on_real_data(self):
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["source", "text"]
        )
        rows = t.to_pylist()
        got = [
            tuple(r.values())
            for r in keyness_log_odds("/root/testdata/sf0.001").take_all()
        ]
        assert got == _naive(rows)

    def test_bucket_invariance(self, tmp_path):
        rows = [
            {"source": f"s{i % 3}", "text": f"tok{i % 7} tok{i % 5} shared"}
            for i in range(40)
        ]
        sf = _write_docs(tmp_path / "b", rows)
        a = [tuple(r.values()) for r in keyness_log_odds(sf, num_buckets=3).take_all()]
        b = [tuple(r.values()) for r in keyness_log_odds(sf, num_buckets=64).take_all()]
        assert a == b == _naive(rows)

    def test_top_k_cut(self, tmp_path):
        rows = [
            {"source": "a", "text": " ".join(f"w{i}" for i in range(30))},
            {"source": "b", "text": "other things entirely"},
        ]
        sf = _write_docs(tmp_path / "k", rows)
        got = [tuple(r.values()) for r in keyness_log_odds(sf, top_k=4).take_all()]
        assert got == _naive(rows, top_k=4)
        assert max(r[1] for r in got) <= 4

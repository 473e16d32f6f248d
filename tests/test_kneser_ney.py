"""Interpolated Kneser-Ney bigram scoring."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.lm import kneser_ney_score

_TOK = re.compile(r"[^ \t\n\f\r]+")
_Q = float(1 << 40)


def _naive(rows):
    bigs = {}
    for r in rows:
        toks = _TOK.findall(r["text"] or "")
        bigs[r["doc_id"]] = list(zip(toks, toks[1:]))
    c12: Counter = Counter()
    for bs in bigs.values():
        c12.update(bs)
    c1: Counter = Counter()
    n1p: Counter = Counter()
    cont: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p[w1] += 1
        cont[w2] += 1
    npairs = len(c12)
    q = {
        pair: int(
            np.round(
                math.log(
                    (c - 0.75) / float(c1[pair[0]])
                    + ((0.75 * n1p[pair[0]]) / float(c1[pair[0]]))
                    * (cont[pair[1]] / float(npairs))
                )
                * _Q
            )
        )
        for pair, c in c12.items()
    }
    out = []
    for d in sorted(bigs):
        bs = bigs[d]
        if not bs:
            continue
        lq = sum(q[p] for p in bs)
        out.append((d, len(bs), lq, round(lq / len(bs) / _Q, 6)))
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
class TestKneserNey:
    def test_matches_naive_reference(self, tmp_path):
        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog",
            "on the mat sat the cat",
            "one-token",
            "",
        ]
        sf = _write_docs(tmp_path / "a", texts)
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        got = [tuple(r.values()) for r in kneser_ney_score(sf).take_all()]
        assert got == _naive(rows)
        # docs with < 2 tokens are absent
        assert {r[0] for r in got} == {0, 1, 2, 3}

    def test_matches_naive_on_real_data(self):
        rows = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        got = [
            tuple(r.values())
            for r in kneser_ney_score("/root/testdata/sf0.001").take_all()
        ]
        assert got == _naive(rows)

    def test_bucket_invariance(self, tmp_path):
        texts = [f"w{i % 5} w{(i + 1) % 7} w{(i + 2) % 3} shared tail" for i in range(25)]
        sf = _write_docs(tmp_path / "b", texts)
        a = [tuple(r.values()) for r in kneser_ney_score(sf, num_buckets=3).take_all()]
        b = [tuple(r.values()) for r in kneser_ney_score(sf, num_buckets=64).take_all()]
        assert a == b

    def test_continuation_beats_raw_frequency(self, tmp_path):
        # "francisco" only ever follows "san" (1 continuation context);
        # "common" follows many words.  After an UNSEEN-ish context, KN's
        # continuation weighting must prefer "common" even though
        # "francisco" is more frequent overall — the defining KN property,
        # visible through the interpolated term of a shared context.
        texts = (
            ["san francisco"] * 8
            + ["very common", "so common", "quite common", "rather common"]
            + ["x common", "x francisco"]  # shared context "x"
        )
        sf = _write_docs(tmp_path / "kn", texts)
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        got = {r["doc_id"]: r["logprob_q"] for r in kneser_ney_score(sf).take_all()}
        assert got == {r[0]: r[2] for r in _naive(rows)}
        # doc "x common" (id 12) must outscore "x francisco" (id 13):
        # same context total, same pair count, but cont(common) >> cont(francisco)
        assert got[12] > got[13]

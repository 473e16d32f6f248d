"""Naive-Bayes source classifier: independent sequential reference + bucket
invariance.

The sequential oracle here is a from-scratch Counter/float implementation of
multinomial NB with Laplace smoothing on the same quantized-ln grid — it
shares no code with the distributed token-bucket pass, so agreement pins the
cross-source expansion, the per-source constants, and the argmax tie-break
independently of the SQL twin (which `scripts/compare_oracle.py` checks).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest
import pyarrow.parquet as pq

from ocr_engine_ray.pipelines.classify import nb_source_classify

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\f\r]+")
_S = float(1 << 40)


def _qln(x: float) -> int:
    return round(math.log(x) * _S)


def _naive_confusion(rows):
    docs = [r for r in rows if r["source"] is not None]
    names = sorted({r["source"] for r in docs})
    c_ts: dict = defaultdict(Counter)  # source -> token counts
    vocab = set()
    for r in docs:
        toks = _TOK.findall(r["text"] or "")
        c_ts[r["source"]].update(toks)
        vocab.update(toks)
    v = len(vocab)
    d_s = Counter(r["source"] for r in docs)
    d_tot = sum(d_s.values())
    pr = {s: _qln(d_s[s] / d_tot) for s in names}
    n_s = {s: sum(c_ts[s].values()) for s in names}
    l2 = {s: _qln(n_s[s] + v) for s in names}
    conf: Counter = Counter()
    for r in docs:
        toks = Counter(_TOK.findall(r["text"] or ""))
        n_d = sum(toks.values())
        best = None
        for s in names:  # name order ⇒ ties keep the lexically smallest
            score = pr[s] - n_d * l2[s]
            for t, c in toks.items():
                cts = c_ts[s][t]
                if cts:
                    score += c * _qln(cts + 1)
            if best is None or score > best[0]:
                best = (score, s)
        conf[(r["source"], best[1])] += 1
    return {k: n for k, n in conf.items()}


@pytest.mark.usefixtures("ray_session")
class TestNBClassify:
    def test_matches_naive_reference(self):
        rows = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
        ).to_pylist()
        want = _naive_confusion(rows)
        got = {
            (r["source"], r["pred_source"]): r["n_docs"]
            for r in nb_source_classify(SF).take_all()
        }
        assert got == want

    def test_bucket_invariance(self):
        a = sorted(
            map(tuple, (r.values() for r in nb_source_classify(SF).take_all()))
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in nb_source_classify(SF, num_buckets=7).take_all()
                ),
            )
        )
        assert a == b

"""Pairwise Spearman agreement between per-doc quality signals."""

from __future__ import annotations

import re
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import _SIGNALS, signal_agreement

_TOK = re.compile(r"[^ \t\n\f\r]+")
_AL = re.compile(r"[A-Za-z]")

SF = "/root/testdata/sf0.001"


def _naive(rows):
    sigs = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        t = r["text"] or ""
        toks = _TOK.findall(t)
        sigs.append(
            {
                "doc_id": r["doc_id"],
                "n_chars": len(t),
                "n_tokens": len(toks),
                "n_distinct_tokens": len(set(toks)),
                "n_alpha_chars": len(_AL.findall(t)),
            }
        )
    n = len(sigs)
    ranks = {}
    for s in _SIGNALS:
        order = sorted(range(n), key=lambda i: (sigs[i][s], sigs[i]["doc_id"]))
        rk = [0] * n
        for pos, i in enumerate(order, start=1):
            rk[i] = pos
        ranks[s] = rk
    out = []
    for a, b in combinations(_SIGNALS, 2):
        sd2 = sum((x - y) ** 2 for x, y in zip(ranks[a], ranks[b]))
        den = n * (n * n - 1)
        rho = int(np.round((1.0 - float(6 * sd2) / float(den)) * 1e6)) if den else 0
        out.append((a, b, n, str(sd2), rho))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
class TestSignalAgreement:
    def test_matches_naive_on_real_data(self):
        rows = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        got = [tuple(r.values()) for r in signal_agreement(SF).take_all()]
        assert got == _naive(rows)

    def test_perfectly_monotone_signals(self, tmp_path):
        # texts of strictly growing length made of one repeated letter:
        # all four signals rank identically except distinct (constant 1,
        # ranks by doc_id = same order) -> every rho is 1.0
        d = tmp_path / "m"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array([("a " * (i + 1)).strip() for i in range(10)]),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = signal_agreement(str(d)).take_all()
        assert all(r["rho_ppm"] == 1_000_000 for r in got)

    def test_anticorrelated_signal(self, tmp_path):
        # chars grow while alpha chars shrink -> rho(chars, alpha) = -1
        d = tmp_path / "x"
        d.mkdir()
        texts = ["9" * (2 * i + 2) + "z" * (12 - i) for i in range(6)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = {
            (r["sig_a"], r["sig_b"]): r["rho_ppm"]
            for r in signal_agreement(str(d)).take_all()
        }
        assert got[("n_chars", "n_alpha_chars")] == -1_000_000

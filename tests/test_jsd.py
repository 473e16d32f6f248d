"""Jensen–Shannon divergence matrix between sources."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import source_jsd_matrix

Q40 = 1099511627776.0


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _naive_jsd_q40(tok_a, tok_b):
    from collections import Counter

    ca, cb = Counter(tok_a), Counter(tok_b)
    na, nb = sum(ca.values()), sum(cb.values())
    total = 0
    for t in set(ca) | set(cb):
        p = ca.get(t, 0) / na
        q = cb.get(t, 0) / nb
        m = (p + q) / 2.0
        if p > 0:
            total += int(np.round(0.5 * p * np.log(p / m) * Q40))
        if q > 0:
            total += int(np.round(0.5 * q * np.log(q / m) * Q40))
    return total


@pytest.mark.usefixtures("ray_session")
class TestSourceJSD:
    def test_identical_sources_zero_disjoint_ln2(self, tmp_path):
        sf = _write_docs(
            tmp_path / "j",
            [
                ("a", "x y z x"),
                ("b", "x y z x"),       # identical to a -> JSD 0
                ("c", "p q r s"),       # disjoint from a -> JSD ln 2
            ],
        )
        got = {
            (r["source_a"], r["source_b"]): r["jsd_q40"]
            for r in source_jsd_matrix(sf).take_all()
        }
        assert got[("a", "b")] == 0
        ln2_q = got[("a", "c")]
        assert abs(ln2_q / Q40 - np.log(2)) < 1e-9

    def test_matches_naive(self, tmp_path):
        rows = [
            ("a", "the quick brown fox the"),
            ("a", "jumps over the lazy dog"),
            ("b", "the quick red fox runs"),
            ("c", "lorem ipsum dolor sit amet the"),
        ]
        sf = _write_docs(tmp_path / "n", rows)
        texts = {}
        for s, t in rows:
            texts.setdefault(s, []).extend(t.split())
        got = {
            (r["source_a"], r["source_b"]): r["jsd_q40"]
            for r in source_jsd_matrix(sf).take_all()
        }
        for (a, b), v in got.items():
            assert v == _naive_jsd_q40(texts[a], texts[b]), (a, b)

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = source_jsd_matrix(sf, num_buckets=3).to_pandas()
        b = source_jsd_matrix(sf, num_buckets=64).to_pandas()
        assert a.equals(b)

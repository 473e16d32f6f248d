"""DSIR importance-selection tests: planted-domain selection, the batch
feature kernel vs a per-doc naive reference, and the DuckDB twin."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_ray.pipelines import dsir

# target domain talks about databases; the matching raw docs reuse that
# vocabulary, the off-domain ones don't — weights must separate them.
_TARGET = [
    "btree index scan plans the query over sorted pages",
    "hash join builds the probe table before the scan starts",
    "query planner picks the index scan when pages are sorted",
]
_ON_DOMAIN = [
    "the planner uses a btree index scan over sorted pages",
    "probe table hash join with a query scan",
]
_OFF_DOMAIN = [
    "seagulls wheel over the harbor at dawn crying loudly",
    "the violin section tuned quietly before the overture began",
]


def _write(tmp_path) -> str:
    rows = []
    for i, t in enumerate(_TARGET):
        rows.append({"doc_id": i, "text": t, "lang": "en", "source": "src0",
                     "n_chars": len(t)})
    for j, t in enumerate(_ON_DOMAIN + _OFF_DOMAIN):
        rows.append({"doc_id": 100 + j, "text": t, "lang": "en",
                     "source": "src1", "n_chars": len(t)})
    rows.append({"doc_id": 200, "text": "", "lang": "en", "source": "src1",
                 "n_chars": 0})  # featureless: never selected
    d = tmp_path / "dsir"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def _naive_features(text: str, num_buckets: int) -> dict[int, int]:
    import re

    toks = re.findall(r"[^ \t\n\f\r]+", text or "")
    feats = ["u:" + t for t in toks] + [
        f"b:{a} {b}" for a, b in zip(toks, toks[1:])
    ]
    out: dict[int, int] = {}
    for f in feats:
        b = int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % num_buckets
        out[b] = out.get(b, 0) + 1
    return out


class TestFeatureKernel:
    def test_handwritten(self):
        r, b, c = dsir.doc_feature_counts_batch(["a b a", "", "x"], num_buckets=7)
        got = {}
        for ri, bi, ci in zip(r.tolist(), b.tolist(), c.tolist()):
            got.setdefault(ri, {})[bi] = ci
        assert got.get(0) == _naive_features("a b a", 7)
        assert 1 not in got
        assert got.get(2) == _naive_features("x", 7)

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    max_size=30,
                ),
                st.sampled_from(["a b a b", "  x ", "\tq\nw", "solo"]),
            ),
            max_size=8,
        )
    )
    def test_matches_naive(self, texts):
        r, b, c = dsir.doc_feature_counts_batch(texts, num_buckets=13)
        got: dict[int, dict[int, int]] = {}
        for ri, bi, ci in zip(r.tolist(), b.tolist(), c.tolist()):
            got.setdefault(ri, {})[bi] = ci
        for i, t in enumerate(texts):
            assert got.get(i, {}) == _naive_features(t or "", 13)
        # rows nondecreasing (the scoring reduceat relies on it)
        assert (np.diff(r) >= 0).all()


class TestDsirSelect:
    def test_planted_domain_ranking(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        got = dsir.dsir_select(sf, k=4).take_all()
        ids = [row["doc_id"] for row in got]
        # on-domain docs outrank off-domain ones; empty doc absent entirely
        assert set(ids[:2]) == {100, 101}
        assert 200 not in ids
        scores = {row["doc_id"]: row["logw_q"] for row in got}
        assert min(scores[100], scores[101]) > max(scores[102], scores[103])

    def test_k_larger_than_pool(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        got = dsir.dsir_select(sf, k=100).take_all()
        # 4 scoreable raw docs (the empty one has no features)
        assert len(got) == 4

    def test_matches_duckdb_twin(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        sf = _write(tmp_path)
        got = dsir.dsir_select(sf, k=50).take_all()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(entry.oracle_sql()["dsir_select"]).fetchall()
        assert [
            (row["doc_id"], row["n_feats"], row["logw_q"]) for row in got
        ] == [tuple(w) for w in want]

    def test_bucket_count_invariance_of_ranking(self, ray_session, tmp_path):
        """The RANKING is stable across feature-space sizes on separable
        domains (scores differ — the hash space changes — but who wins
        must not)."""
        sf = _write(tmp_path)
        a = [r["doc_id"] for r in dsir.dsir_select(sf, k=4).take_all()]
        b = [
            r["doc_id"]
            for r in dsir.dsir_select(sf, k=4, num_buckets=8192).take_all()
        ]
        assert set(a[:2]) == set(b[:2]) == {100, 101}


def test_null_source_rows_ignored(ray_session, tmp_path):
    """Null-source docs count in NEITHER model and are never selected —
    exactly the SQL twin's NULL-false comparisons."""
    import duckdb

    import __ray_entry__ as entry

    rows = [
        {"doc_id": 0, "text": _TARGET[0], "lang": "en", "source": "src0",
         "n_chars": 1},
        {"doc_id": 1, "text": _ON_DOMAIN[0], "lang": "en", "source": "src1",
         "n_chars": 1},
        {"doc_id": 2, "text": _OFF_DOMAIN[0], "lang": "en", "source": None,
         "n_chars": 1},
    ]
    d = tmp_path / "nullsrc"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = dsir.dsir_select(str(d), k=50).take_all()
    assert [r["doc_id"] for r in got] == [1]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(entry.oracle_sql()["dsir_select"]).fetchall()
    assert [(r["doc_id"], r["n_feats"], r["logw_q"]) for r in got] == [
        tuple(w) for w in want
    ]

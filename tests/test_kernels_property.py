"""Hypothesis property tests for the fourth-continuation pure kernels
(no Ray session needed): Morton interleave vs a from-scratch bit walk,
postings extraction vs naive split positions, and phrase-twin SQL
generation vs a naive sliding-window counter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_ray.pipelines.index import _postings_batch
from ocr_engine_ray.pipelines.layout import _morton32


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)), max_size=50))
def test_morton_matches_bit_walk(pairs):
    x = np.array([p[0] for p in pairs], dtype=np.int64)
    y = np.array([p[1] for p in pairs], dtype=np.int64)
    got = _morton32(x, y)

    def naive(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got.tolist() == [naive(a, b) for a, b in pairs]
    # order preservation on the diagonal: z is monotonic in (x, y) jointly
    # quantized — check the corners only (full monotonicity is false for
    # Morton, by design)
    if len(pairs):
        assert _morton32(np.array([0]), np.array([0]))[0] == 0
        assert _morton32(np.array([0xFFFF]), np.array([0xFFFF]))[0] == 0xFFFFFFFF


_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)
_doc = st.lists(_token, max_size=12).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(_doc, max_size=8))
def test_postings_match_naive_split(texts):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    t = _postings_batch(batch)
    got = list(
        zip(
            t.column("token").to_pylist(),
            t.column("doc_id").to_pylist(),
            t.column("pos").to_pylist(),
        )
    )
    want = [
        (tok, i, p + 1)
        for i, text in enumerate(texts)
        for p, tok in enumerate(text.split())
    ]
    assert sorted(got) == sorted(want)
    # positions are 1-based and contiguous per doc
    per_doc: dict[int, list[int]] = {}
    for _tok, d, p in got:
        per_doc.setdefault(d, []).append(p)
    for d, ps in per_doc.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.lists(st.sampled_from("pq"), min_size=0, max_size=10).map(" ".join), max_size=6),
    st.lists(st.sampled_from("pq"), min_size=1, max_size=3).map(" ".join),
)
def test_phrase_twin_sql_matches_naive(texts, phrase):
    """The GENERATED positional-join SQL (any phrase length) == the naive
    sliding-window count, on adversarially repetitive two-token corpora."""
    import duckdb

    from ocr_engine_ray.pipelines.index import phrase_search_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = con.execute(phrase_search_sql(phrase)).fetchall()
    words = phrase.split()
    want = []
    for i, t in enumerate(texts):
        toks = t.split()
        n = sum(
            1
            for j in range(len(toks) - len(words) + 1)
            if toks[j : j + len(words)] == words
        )
        if n:
            want.append((i, n))
    assert [tuple(g) for g in got] == want

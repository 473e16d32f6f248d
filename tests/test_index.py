"""Inverted index + phrase search: scan == index-path == SQL twin on real
and planted corpora, overlapping occurrences, duplicate phrase tokens,
partition pruning, and the naive Python recount."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines import index as ix

SF = "/root/testdata/sf0.001"


def _pairs(tbl: pa.Table) -> list[tuple[int, int]]:
    return list(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("n_matches").to_pylist())
    )


def _scan(sf: str, phrase: str) -> list[tuple[int, int]]:
    return [
        (r["doc_id"], r["n_matches"])
        for r in ix.phrase_search(sf, phrase=phrase).take_all()
    ]


def _naive(sf: str, phrase: str) -> list[tuple[int, int]]:
    """From-scratch recount: Python split + sliding window."""
    words = phrase.split()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (text or "").split()
        n = sum(
            1
            for i in range(len(toks) - len(words) + 1)
            if toks[i : i + len(words)] == words
        )
        if n:
            out.append((did, n))
    return sorted(out)


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("invidx") / "idx")
    ix.build_inverted_index(SF, d)
    return d


def test_scan_matches_naive(ray_session):
    for phrase in ["sort query", "the sort query", "order order"]:
        assert _scan(SF, phrase) == _naive(SF, phrase), phrase


def test_index_matches_scan(built_index):
    for phrase in ["sort query", "the sort query", "order order", "a the a"]:
        assert _pairs(ix.search_index(built_index, phrase)) == _scan(SF, phrase)


def test_zero_match_phrase(built_index):
    assert _pairs(ix.search_index(built_index, "sort sort sort sort sort")) == _scan(
        SF, "sort sort sort sort sort"
    ) == []


def test_partition_pruning(built_index):
    """A one-token query touches only that token's bucket directory."""
    import zlib

    b = zlib.crc32(b"sort") % 32
    only = sorted(glob.glob(os.path.join(built_index, f"bucket={b}", "*.parquet")))
    assert only, "expected postings for a corpus word"
    n_dirs = len(glob.glob(os.path.join(built_index, "bucket=*")))
    assert n_dirs > 1  # pruning is real: other buckets exist and are skipped
    got = _pairs(ix.search_index(built_index, "sort"))
    assert got == _scan(SF, "sort")


def test_planted_overlaps(ray_session, tmp_path):
    """Overlapping occurrences each count: 'a a a a' contains 'a a' 3x;
    whitespace runs and leading space don't shift positions."""
    rows = [
        {"doc_id": 1, "text": "a a a a", "lang": "en", "source": "s", "n_chars": 7},
        {"doc_id": 2, "text": "  b a\t\ta  c", "lang": "en", "source": "s", "n_chars": 11},
        {"doc_id": 3, "text": "a", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 4, "text": "", "lang": "en", "source": "s", "n_chars": 0},
    ]
    d = tmp_path / "ovl"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    assert _scan(str(d), "a a") == [(1, 3), (2, 1)]
    idx = str(tmp_path / "ovlidx")
    ix.build_inverted_index(str(d), idx)
    assert _pairs(ix.search_index(idx, "a a")) == [(1, 3), (2, 1)]


def test_twin_on_planted(ray_session, tmp_path):
    import duckdb

    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in enumerate(
            ["x y x y x", "y x y", "x x y y x y", "zz x y", "x  y"]
        )
    ]
    d = tmp_path / "twin"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    for phrase in ["x y", "x y x", "y"]:
        want = [tuple(w) for w in con.execute(ix.phrase_search_sql(phrase)).fetchall()]
        assert _scan(str(d), phrase) == want, phrase

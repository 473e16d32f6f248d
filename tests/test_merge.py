"""MERGE upsert: planted update/insert/passthrough semantics, a custom
updates Dataset, twin equality, and bucket invariance."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ocr_engine_ray.pipelines.merge import MERGE_UPSERT_SQL, merge_upsert


def _write(tmp_path, rows) -> str:
    d = tmp_path / "mrg"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def _doc(i, text, lang="en", source="s", n=0):
    return {"doc_id": i, "text": text, "lang": lang, "source": source, "n_chars": n}


def test_custom_updates_semantics(ray_session, tmp_path):
    sf = _write(tmp_path, [_doc(1, "a"), _doc(2, "b"), _doc(3, "c")])
    updates = rd.from_arrow(
        pa.Table.from_pylist(
            [_doc(2, "B-REVISED", n=9), _doc(10, "NEW", source="fresh")]
        )
    )
    got = {r["doc_id"]: (r["text"], r["source"], r["n_chars"])
           for r in merge_upsert(sf, updates).take_all()}  # dict: order-free
    assert got == {
        1: ("a", "s", 0),             # passthrough
        2: ("B-REVISED", "s", 9),     # matched -> replaced
        3: ("c", "s", 0),             # passthrough
        10: ("NEW", "fresh", 0),      # unmatched update -> inserted
    }


def test_demo_delta_matches_twin_planted(ray_session, tmp_path):
    import duckdb

    rows = [_doc(i, f"text {i}", n=i * 3) for i in [0, 1, 7, 13, 14, 26, 91]]
    sf = _write(tmp_path, rows)
    got = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in merge_upsert(sf).take_all()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = [tuple(w) for w in con.execute(MERGE_UPSERT_SQL).fetchall()]
    assert got == want
    # doc 91 is both revised (91 % 7 == 0) and spawns an insert (91 % 13 == 0)
    d = dict((g[0], g[1]) for g in got)
    assert d[91] == "rev2:text 91"
    assert d[1_000_091] == "new doc 91"


def test_bucket_invariance(ray_session, tmp_path):
    sf = _write(tmp_path, [_doc(i, f"t{i}") for i in range(40)])
    key = lambda r: r["doc_id"]
    a = sorted(merge_upsert(sf, num_buckets=2).take_all(), key=key)
    b = sorted(merge_upsert(sf, num_buckets=32).take_all(), key=key)
    assert a == b

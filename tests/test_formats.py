"""Interchange-format round-trip gates (NDJSON / CSV): the digest must
survive serialize → shard → parse for content that actually stresses the
escapers — embedded quotes, commas, CR/LF, tabs, unicode, empty and null
text."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.sources import formats

_TEXTS: dict[int, str | None] = {
    0: "plain words",
    1: 'comma, "quoted", more',
    2: "line1\nline2\r\nline3",
    3: "",
    4: "unicode: héllo 中文  sep",
    5: "123 456",
    6: "tab\there",
    7: None,
}


def _write(tmp_path) -> str:
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "s",
         "n_chars": len(t or "")}
        for i, t in _TEXTS.items()
    ]
    d = tmp_path / "fmt"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "orc", "feather"])
def test_roundtrip_digest_matches_twin(ray_session, tmp_path, fmt):
    import duckdb

    import __ray_entry__ as entry

    sf = _write(tmp_path)
    fn = getattr(formats, f"{fmt}_roundtrip_digest")
    got = fn(sf).column("digest")[0].as_py()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        entry.oracle_sql()[f"{fmt}_roundtrip_digest"]
    ).fetchone()[0]
    assert got == want


def test_scratch_dir_cleaned(ray_session, tmp_path, monkeypatch):
    """The export scratch dir must not leak (the checkpoint ADVICE lesson)."""
    import glob
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None  # re-read TMPDIR
    try:
        sf = _write(tmp_path)
        formats.jsonl_roundtrip_digest(sf)
        assert glob.glob(str(tmp_path / "jsonl_export_*")) == []
    finally:
        tempfile.tempdir = None


def test_empty_corpus_digest_zero(ray_session, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
         "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
         "n_chars": pa.array([], pa.int64())}
    )
    pq.write_table(empty, str(d / "documents.parquet"))
    for fmt in ("jsonl", "csv", "orc", "feather"):
        fn = getattr(formats, f"{fmt}_roundtrip_digest")
        assert fn(str(d)).column("digest")[0].as_py() == 0

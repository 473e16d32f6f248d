"""Regex attribute tagger + redaction digest (pipelines/tagger.py)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_ray.pipelines import tagger


def _write_docs(tmp_path, texts: dict[int, str | None]) -> str:
    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_regex_tag_counts_and_flag(tmp_path, ray_session):
    sf = _write_docs(
        tmp_path,
        {
            0: "spark table spark row",      # spark 2, struct 2
            1: "fast slow fast",             # perf 3
            2: "nothing relevant here",      # untagged
            3: None,                         # null text -> untagged, not null counts
        },
    )
    rows = {r["doc_id"]: r for r in tagger.regex_tag(sf).take_all()}
    assert rows[0]["tag_spark"] == 2 and rows[0]["tag_struct"] == 2
    assert rows[0]["tag_perf"] == 0 and rows[0]["tagged"] == 1
    assert rows[1]["tag_perf"] == 3 and rows[1]["tagged"] == 1
    assert rows[2]["tagged"] == 0
    assert rows[3] == {
        "doc_id": 3,
        "tag_spark": 0,
        "tag_perf": 0,
        "tag_struct": 0,
        "tagged": 0,
    }


def test_regex_tag_pii_presets_planted(tmp_path, ray_session):
    sf = _write_docs(
        tmp_path,
        {
            0: "mail me at a.b+c@example.org or admin@x.co thanks",
            1: "server at 10.0.255.3 and 192.168.1.1 up",
            2: "call 555-867-5309 or 555.123.4567",
            3: "clean document, no identifiers",
        },
    )
    rows = {
        r["doc_id"]: r
        for r in tagger.regex_tag(sf, taggers=tagger.PII_TAGGERS).take_all()
    }
    assert rows[0]["pii_email"] == 2
    assert rows[1]["pii_ipv4"] == 2
    assert rows[2]["pii_phone"] == 2
    assert rows[3]["tagged"] == 0
    assert all(rows[i]["tagged"] == 1 for i in (0, 1, 2))


def test_regex_tag_matches_duckdb_twin(tmp_path, ray_session):
    # RE2 parity: Arrow count_substring_regex vs DuckDB regexp_extract_all
    # on a corpus exercising word boundaries, repeats and nulls.
    sf = _write_docs(
        tmp_path,
        {
            0: "spark sparks spark fast table tablets row",
            1: "slow slow slow column row table",
            2: None,
            3: "sparkfast rowcolumn",  # boundary-only misses
        },
    )
    got = sorted(tagger.regex_tag(sf).take_all(), key=lambda r: r["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        r"""
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text,''), '\bspark\b'))::BIGINT AS tag_spark,
               len(regexp_extract_all(coalesce(text,''), '\b(fast|slow)\b'))::BIGINT AS tag_perf,
               len(regexp_extract_all(coalesce(text,''), '\b(table|column|row)\b'))::BIGINT AS tag_struct,
               (len(regexp_extract_all(coalesce(text,''), '\bspark\b')) > 0
                OR len(regexp_extract_all(coalesce(text,''), '\b(fast|slow)\b')) > 0
                OR len(regexp_extract_all(coalesce(text,''), '\b(table|column|row)\b')) > 0
               )::BIGINT AS tagged
        FROM documents ORDER BY doc_id
        """
    ).fetchall()
    assert [
        (r["doc_id"], r["tag_spark"], r["tag_perf"], r["tag_struct"], r["tagged"])
        for r in got
    ] == want


def test_redact_digest_matches_duckdb_twin(tmp_path, ray_session):
    sf = _write_docs(
        tmp_path,
        {
            0: "customer value customer",
            1: "values accustomed",  # boundary-only misses
            2: None,
        },
    )
    got = tagger.redact_digest(sf).column("digest").to_pylist()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        r"""
        WITH t AS (
          SELECT md5(doc_id::VARCHAR || chr(31) ||
                     regexp_replace(coalesce(text,''),
                                    '\b(customer|value)\b', '[MASK]', 'g')) AS h
          FROM documents
        ), terms AS (
          SELECT ((('0x' || substr(h, 1, 16))::UBIGINT % 2305843009213693951)::HUGEINT * 8
                + ('0x' || substr(h, 17, 16))::UBIGINT % 2305843009213693951)
                % 2305843009213693951 AS term
          FROM t
        )
        SELECT (sum(term) % 2305843009213693951)::BIGINT AS digest FROM terms
        """
    ).fetchone()[0]
    assert got == want

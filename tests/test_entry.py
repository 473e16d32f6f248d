"""Driver-contract test: entry() smoke + queries() vs oracle_sql() via DuckDB
(a miniature of the driver's correctness gate, at sf0.001)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# A representative subset is exercised here to keep CI time sane; the full
# set is compared by scripts/compare_oracle.py (and the driver at sf0.01).
SUBSET = [
    "shape_counts",
    "extract_span_counts",
    "extract_inline_chars",
    "size_class_counts",
    "image_meta",
    "pricing_summary",
    "events_hourly",
    "sessionize",
    "top_sources",
    "exact_dedup",
    "embedding_near_dup",
    "ann_topk",
    "token_totals_by_lang",
    "fingerprint_stats",
    "quality_by_source",
    "events_sliding",
    "stratified_hash_sample",
    "doc_core_stats",
    "mktsegment_revenue",
    "inactive_customer_orders",
    "brand_volume",
    "order_priority_counts",
    "top_customers",
    "clicks_last_purchase",
    "order_event_window_join",
    "stream_running_totals",
    "free_text_stats",
    "mode_translate_counts",
    "mode_redact_inline",
    "intake_vocabulary",
    "embedding_near_dup_clusters",
    "langid_counts",
    "doc_stats",
    "curate_corpus",
    "ngram_jaccard_pairs",
    "rich_fields_digest",
    "vocab_fields_digest",
    "tfidf_top_terms",
    "token_budget_sample",
    "heavy_hitters",
    "grouped_topk",
    "user_event_gaps",
    "gram_novelty",
    "gopher_quality_flags",
    "dsir_select",
    "jsonl_roundtrip_digest",
    "csv_roundtrip_digest",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.usefixtures("ray_session")
class TestDriverContract:
    def test_entry_smoke(self):
        ds = entrymod.entry()
        rows = ds.take_all()
        assert len(rows) == 500
        assert set(rows[0].keys()) >= {"doc_id", "spans", "fields_json", "n_spans"}

    def test_every_query_has_callable(self):
        qs = entrymod.queries()
        assert len(qs) >= 20
        for name, fn in qs.items():
            assert callable(fn), name

    def test_oracle_sql_keys_subset_of_queries(self):
        assert set(entrymod.oracle_sql()) <= set(entrymod.queries())

    @pytest.mark.parametrize("name", SUBSET)
    def test_query_matches_sql(self, name, con):
        got = _canon(_to_pandas(entrymod.queries()[name](SF)))
        exp = _canon(con.execute(entrymod.oracle_sql()[name]).df())
        assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
        assert list(got.columns) == list(exp.columns), name
        assert [str(d) for d in got.dtypes] == [str(d) for d in exp.dtypes], (
            name,
            got.dtypes,
            exp.dtypes,
        )
        pd.testing.assert_frame_equal(got, exp, check_exact=True)

"""End-to-end corpus curation — the composition a training-data user
actually runs: quality filter → exact dedup (keep first) → per-source
yield stats.  One streaming chain, one shuffle (the dedup bucket groupby).

Every stage is individually oracle-gated elsewhere (doc_stats quality,
exact_dedup, token counts); this pipeline proves the *composition* is also
exact: the DuckDB twin is a WHERE quality ≥ t → row_number-over-text → GROUP
BY source query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import textstats as ts
from ..sources.tables import sf_table

NUM_CURATE_BUCKETS = 64


def _quality_sha_batch(batch: pa.Table, *, min_quality: float) -> pa.Table:
    """Filter by quality score, then attach dedup keys + token counts."""
    texts = batch.column("text").to_pylist()
    q = np.array([ts.quality_score(t) for t in texts])
    keep = q >= min_quality
    t = batch.filter(pa.array(keep))
    kept_texts = [x for x, k in zip(texts, keep) if k]
    sha = [hashlib.sha1((x or "").encode("utf-8")).hexdigest() for x in kept_texts]
    bucket = [int(x[:8], 16) % NUM_CURATE_BUCKETS for x in sha]
    # Token = RE2 '\S+' run (pyarrow's regex kernels are RE2-backed), the
    # exact tokenizer of the oracle's _TOK — NOT Python str.split(), whose
    # Unicode whitespace class drifts from SQL on \v / NBSP etc.
    ntok = pc.count_substring_regex(t.column("text"), r"\S+").cast(pa.int64())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "text_sha1": pa.array(sha, pa.string()),
            "bucket": pa.array(bucket, pa.int32()),
            "n_tokens": ntok,
        }
    )


def _keep_first(group: pa.Table) -> pa.Table:
    import pandas as pd

    df = group.select(["doc_id", "source", "text_sha1", "n_tokens"]).to_pandas()
    df = df.sort_values("doc_id").drop_duplicates("text_sha1", keep="first")
    return pa.Table.from_pandas(
        df[["source", "n_tokens"]], preserve_index=False
    )


def curate_corpus(sf_dir: str, *, min_quality: float = 0.8) -> rd.Dataset:
    """(source, n_docs, total_tokens) of the curated corpus: documents with
    quality ≥ ``min_quality``, exact-deduplicated keep-first-by-doc_id."""
    from ray.data.aggregate import Count, Sum

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    survivors = ds.map_batches(
        _quality_sha_batch,
        batch_format="pyarrow",
        fn_kwargs={"min_quality": min_quality},
    )
    deduped = survivors.groupby("bucket").map_groups(
        _keep_first, batch_format="pyarrow"
    )
    agg = deduped.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": batch.column("n_docs"),
                "total_tokens": pc.cast(batch.column("total_tokens"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")

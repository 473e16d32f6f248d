"""Sampling & shuffled-export operators for training-data preparation.

- ``stratified_hash_sample``: deterministic per-stratum sampling — take the
  k documents per source with the smallest ``md5(text || ':' || doc_id)``.
  Hash-ordering makes the sample a pure function of the data (reproducible
  on any cluster shape, no RNG state), and gives an exact SQL oracle
  (``row_number() over (partition by source order by md5(...), doc_id)``).
  The shuffle key is the stratum, and only per-stratum top-k candidates
  (pre-pruned per batch) move — not the corpus.
- ``shuffled_shard_export``: the classic final step of a training-data
  pipeline — a seeded global ``random_shuffle`` followed by a sharded
  Parquet export.  Verified by determinism + exactly-once coverage tests
  (no SQL oracle: the permutation is Ray's seeded RNG).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

from ..sources.tables import sf_table


def stratified_hash_sample(sf_dir: str, *, k: int = 5) -> rd.Dataset:
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{t or ''}:{d}".encode("utf-8")).hexdigest()
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            )
        ]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "sample_key": pa.array(keys, pa.string()),
            }
        )
        # map-side prune: only each batch's per-source top-k can survive the
        # global top-k, so the shuffle moves ≤ k rows per source per batch
        df = out.to_pandas()
        df = (
            df.sort_values(["source", "sample_key", "doc_id"])
            .groupby("source", as_index=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pruned = ds.map_batches(add_key, batch_format="pyarrow")

    def per_source(g) -> "pa.Table":
        g = g.sort_values(["sample_key", "doc_id"]).head(k)
        return g[["source", "doc_id", "sample_key"]]

    return pruned.groupby("source").map_groups(per_source, batch_format="pandas")


def shuffled_shard_export(
    sf_dir: str, out_dir: str, *, seed: int = 42, num_shards: int = 16
) -> dict:
    """Seeded global shuffle → ``num_shards`` Parquet files.  Returns
    {rows, shards}.  Same seed ⇒ byte-identical shard contents."""
    ds = sf_table(sf_dir, "documents")
    shuffled = ds.random_shuffle(seed=seed).repartition(num_shards)
    shuffled.write_parquet(out_dir)
    import glob

    return {
        "rows": ds.count(),
        "shards": len(glob.glob(f"{out_dir}/*.parquet")),
    }


def token_budget_sample(sf_dir: str, *, budget_tokens: int = 1000) -> rd.Dataset:
    """Per-source token-budget sampling: keep documents, in deterministic
    hash order, until each source's cumulative token count would exceed the
    budget — the standard way to cap a source's contribution to a training
    mix without an RNG.

    Distributed exactly like ``stream_running_totals``: the cumulative sum
    is order-local to the source, so one groupby(source) shuffle, an
    in-group sort by ``(sample_key, doc_id)`` and a vectorized pandas
    cumsum decide membership — no global sort, no driver data path.  The
    hash order makes the selection a pure function of the data, and gives
    the exact SQL twin (a window-function running sum over the same
    ordering).  Emitted ``cum_tokens`` is the running total INCLUDING the
    row, so the kept set is every prefix row with ``cum_tokens ≤ budget``
    (a doc bigger than the remaining budget ends its source's intake —
    "take until full", not "skip and continue": the skip variant has no
    per-row SQL twin and complicates nothing else).
    """
    import pyarrow.compute as pc

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{t or ''}:{d}".encode("utf-8")).hexdigest()
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "sample_key": pa.array(keys, pa.string()),
                # RE2 '\S+' — the oracle's _TOK tokenizer
                "n_tokens": pc.count_substring_regex(
                    batch.column("text"), r"\S+"
                ).cast(pa.int64()),
            }
        )

    def per_source(g) -> "pa.Table":
        g = g.sort_values(["sample_key", "doc_id"], kind="mergesort")
        g["cum_tokens"] = g["n_tokens"].cumsum().astype("int64")
        g = g[g["cum_tokens"] <= budget_tokens]
        return g[["source", "doc_id", "n_tokens", "cum_tokens"]]

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
    )

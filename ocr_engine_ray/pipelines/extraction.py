"""The flagship pipeline: interleaved docs → ordered extracted spans.

Physical plan (all Ray Data, streaming, lazy until consumed)::

    read documents / interleaved table           (column-pruned scan)
      → map_batches(derive_interleaved_batch)    (stateless, Arrow)      [*]
      → map_batches(explode_spans_batch)         (stateless; pdf page-sharding
                                                  = skew defense, spec 25 pp)
      → map_batches(SpanExtractor, concurrency)  (ACTOR POOL: stand-in OCR,
                                                  html DOM heuristics, docx)
      → map_batches(add_bucket_batch)            (hash(doc_id) % B)
      → groupby("bucket").map_groups(reassemble_bucket)
                                                 (THE one shuffle; in-bucket
                                                  sort restores span order;
                                                  order-sensitive fields fold)

[*] the derive stage only exists for the driver's ``documents`` proxy table;
``extract_from_interleaved`` starts from a real interleaved table.

Scale notes (100 TB / 10^12 docs):
- the only all-to-all exchange is the bucket groupby; its key cardinality is
  ``num_buckets`` (cluster-sized, e.g. 4–16 × cores), never 10^12 doc_ids;
- the actor pool amortizes model construction; per-kind work is batched;
- nothing materializes the full dataset — consume with write_parquet/iter.
"""

from __future__ import annotations

import ray.data as rd

from ..sources.tables import read_table
from ..stages.extract import SpanExtractor
from ..stages.ingest import derive_interleaved_batch, explode_spans_batch
from ..stages.reassemble import add_bucket_batch, reassemble_bucket


def interleaved_from_documents(documents_path: str, **read_kwargs) -> rd.Dataset:
    """Driver ``documents`` table → deterministic interleaved-doc Dataset."""
    ds = read_table(documents_path, columns=["doc_id", "text", "lang"], **read_kwargs)
    return ds.map_batches(derive_interleaved_batch, batch_format="pyarrow")


def extract_from_interleaved(
    ds: rd.Dataset,
    *,
    num_buckets: int = 64,
    extract_batch_size: int = 256,
    extract_concurrency=None,
) -> rd.Dataset:
    """Interleaved-doc Dataset → extracted (doc_id, spans, fields_json, …)."""
    exploded = ds.map_batches(explode_spans_batch, batch_format="pyarrow")
    kwargs = {}
    if extract_concurrency is not None:
        kwargs["concurrency"] = extract_concurrency
    else:
        kwargs["concurrency"] = (2, 16)
    extracted = exploded.map_batches(
        SpanExtractor,
        batch_format="pyarrow",
        batch_size=extract_batch_size,
        num_cpus=1,
        **kwargs,
    )
    bucketed = extracted.map_batches(
        add_bucket_batch,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": num_buckets},
    )
    return bucketed.groupby("bucket").map_groups(
        reassemble_bucket, batch_format="pyarrow"
    )


def extract_documents(documents_path: str, **kwargs) -> rd.Dataset:
    """End-to-end: driver documents parquet → extracted Dataset."""
    return extract_from_interleaved(interleaved_from_documents(documents_path), **kwargs)

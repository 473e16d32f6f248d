"""The flagship pipeline: interleaved docs → ordered extracted spans.

Physical plan (all Ray Data, streaming, lazy until consumed)::

    read documents / interleaved table            (column-pruned scan)
      → map_batches(derive_interleaved_batch)     (stateless, Arrow)      [*]
      → COST-MODEL ROUTER (estimated units per doc vs giant_unit_threshold)
        ├─ local path (≤ threshold, the default for everything when the
        │  per-unit model cost is small):
        │    map_batches(DocExtractor)            (per-worker cached model;
        │                                          whole doc in one call —
        │                                          ZERO shuffle)
        └─ giant path (> threshold — the giant-PDF tail under a real model):
             map_batches(explode_spans_batch)     (pdf page-sharding, 25 pp)
             → map_batches(SpanExtractor)         (stand-in OCR, html DOM
                                                   heuristics, docx flatten)
             → map_batches(add_bucket_batch)      (hash(doc_id) % B)
             → groupby("bucket").map_groups(reassemble_bucket)
                                                  (THE one shuffle; in-bucket
                                                   sort restores span order;
                                                   order-sensitive fold)
      → union

[*] the derive stage only exists for the driver's ``documents`` proxy table;
``extract_from_interleaved`` starts from a real interleaved table.

Scale notes (100 TB / 10^12 docs):
- the only all-to-all exchange is the giant path's bucket groupby; its key
  cardinality is ``num_buckets`` (cluster-sized), never 10^12 doc_ids, and
  it carries only the giant tail's pages;
- extraction state is amortized per worker (actor ``__init__`` in actor
  mode, module-global cache in task mode);
- nothing materializes the full dataset — consume with write_parquet/iter.
"""

from __future__ import annotations

import ray.data as rd

from ..sources.tables import read_table
from ..stages.extract import SpanExtractor
from ..stages.ingest import derive_interleaved_batch, explode_spans_batch
from ..stages.reassemble import add_bucket_batch, reassemble_bucket


def interleaved_from_documents(
    documents_path: str, *, replicate: int = 1, **read_kwargs
) -> rd.Dataset:
    """Driver ``documents`` table → deterministic interleaved-doc Dataset.

    ``replicate=R`` expands the corpus R× for benchmarking: replica r of doc d
    gets ``doc_id = d + r*stride`` where the stride is a multiple of 100 at
    least max(doc_id)+1 (row-group stats, no data scan) — replica ids can
    never collide with base ids, the shape distribution (doc_id % 100) is
    preserved, and every replica derives distinct deterministic content
    (offsets/media hashes differ).
    """
    ds = read_table(documents_path, columns=["doc_id", "text", "lang"], **read_kwargs)
    if replicate > 1:
        from ..state.checkpoint import doc_id_range

        _, hi = doc_id_range(documents_path)
        stride = max(1_000_000, -(-(hi + 1) // 100) * 100)

        def rep(batch: "pa.Table") -> "pa.Table":
            import pyarrow as pa
            import pyarrow.compute as pc

            parts = []
            for r in range(replicate):
                parts.append(
                    pa.table(
                        {
                            "doc_id": pc.add(batch.column("doc_id"), r * stride),
                            "text": batch.column("text"),
                            "lang": batch.column("lang"),
                        }
                    )
                )
            return pa.concat_tables(parts)

        ds = ds.map_batches(rep, batch_format="pyarrow")
    return ds.map_batches(derive_interleaved_batch, batch_format="pyarrow")


def extract_from_interleaved(
    ds: rd.Dataset,
    *,
    num_buckets: int = 64,
    extract_batch_size: int = 256,
    extract_concurrency=None,
    giant_unit_threshold: int | None = None,
    compute: str = "tasks",
    config=None,
) -> rd.Dataset:
    """Interleaved-doc Dataset → extracted (doc_id, spans, fields_json, …).

    **Cost-model routing** (the skew defense): documents whose estimated
    output-unit count is ≤ ``giant_unit_threshold`` are extracted row-locally
    by the ``DocExtractor`` actor pool — zero shuffle, output flows straight
    to the sink.  Documents above the threshold (the giant-PDF tail) take the
    distributed path: per-page explode → ``SpanExtractor`` actor pool →
    hash-bucket ``groupby`` → vectorized in-bucket reassembly — the only
    all-to-all exchange, and it carries only the giant tail's pages.

    The threshold is a cost model: split a document across workers only when
    ``per-unit model cost × unit count`` exceeds a sane task budget.  With
    the deterministic stand-in OCR (~0.3 ms/unit) even a 500-page giant is
    ~0.15 s of work, so the DEFAULT is ``None`` — every document row-local,
    zero shuffle.  With a real OCR model (0.1-10 s/page) set it to a handful
    of pages so big documents fan out across the cluster.  ``0`` forces the
    distributed path for everything (tests use this to cover both paths).

    NOTE: when both paths are active the input lineage executes once per
    branch (Ray Data re-executes shared lineage on branch) and the union of
    two streaming plans carries real executor overhead — don't enable the
    split unless the giant tail's per-doc cost justifies it.
    """
    from ..stages.doc_extract import (
        DocExtractor,
        doc_extract_task,
        make_doc_extract_task,
        split_by_units,
    )
    from ..stages.extract import make_span_extract_task, span_extract_task

    doc_kwargs = {}
    span_kwargs = {}
    has_custom = config is not None and config.extractors
    if compute == "actors":
        kwargs = {"num_cpus": 1}
        kwargs["concurrency"] = (
            extract_concurrency if extract_concurrency is not None else (2, 16)
        )
        span_fn, doc_fn = SpanExtractor, DocExtractor
        if has_custom:
            doc_kwargs = {"fn_constructor_kwargs": {"extractors": config.extractors}}
            span_kwargs = {"fn_constructor_kwargs": {"extractors": config.extractors}}
    else:  # "tasks": fuse with upstream, cache state per worker process
        # concurrency bounds task parallelism too (per-worker cached model
        # state has a memory footprint the caller may need to cap); tasks
        # take a single max bound, so an actor-style (lo, hi) maps to hi.
        if extract_concurrency is None:
            kwargs = {}
        elif isinstance(extract_concurrency, tuple):
            kwargs = {"concurrency": extract_concurrency[1]}
        else:
            kwargs = {"concurrency": extract_concurrency}
        span_fn = make_span_extract_task(config) if has_custom else span_extract_task
        doc_fn = make_doc_extract_task(config) if has_custom else doc_extract_task

    def giant_path(giant_ds: rd.Dataset) -> rd.Dataset:
        exploded = giant_ds.map_batches(explode_spans_batch, batch_format="pyarrow")
        extracted = exploded.map_batches(
            span_fn,
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            **kwargs,
            **span_kwargs,
        )
        bucketed = extracted.map_batches(
            add_bucket_batch,
            batch_format="pyarrow",
            fn_kwargs={"num_buckets": num_buckets},
        )
        return bucketed.groupby("bucket").map_groups(
            reassemble_bucket, batch_format="pyarrow"
        )

    def local_path(local_ds: rd.Dataset) -> rd.Dataset:
        return local_ds.map_batches(
            doc_fn,
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            **kwargs,
            **doc_kwargs,
        )

    if giant_unit_threshold is None:
        return local_path(ds)
    if giant_unit_threshold <= 0:
        return giant_path(ds)
    local = ds.map_batches(
        split_by_units,
        batch_format="pyarrow",
        fn_kwargs={"threshold": giant_unit_threshold, "keep_giant": False},
    )
    giant = ds.map_batches(
        split_by_units,
        batch_format="pyarrow",
        fn_kwargs={"threshold": giant_unit_threshold, "keep_giant": True},
    )
    return local_path(local).union(giant_path(giant))


def materialize_interleaved(
    documents_path: str, out_dir: str, *, replicate: int = 1
) -> None:
    """Write the derived interleaved-doc table as a Parquet artifact.

    This produces the north-rule input table shape on disk
    (``doc_id, lang, spans: list<struct<kind, text, media_ref, offset>>``) so
    downstream runs can start from the real table instead of deriving on the
    fly — ``extract_from_interleaved(read_table(out_dir))`` must produce
    byte-identical results (asserted in tests).
    """
    interleaved_from_documents(documents_path, replicate=replicate).write_parquet(out_dir)


def extract_documents(documents_path: str, *, replicate: int = 1, **kwargs) -> rd.Dataset:
    """End-to-end: driver documents parquet → extracted Dataset."""
    return extract_from_interleaved(
        interleaved_from_documents(documents_path, replicate=replicate), **kwargs
    )

"""Partition-granular checkpointing with lineage + metrics (north rule).

The reference has NO resume story — a crashed request loses everything and
orphans its GCS intermediates (SURVEY.md §4).  Here a run is decomposed into
contiguous ``doc_id``-range partitions; each partition is one bounded Ray Data
pipeline whose output lands atomically (write to ``part=K.tmp-N`` → rename to
``part=K``) and is recorded in an append-only ``manifest.jsonl`` with lineage
(input path, key range) and metrics (docs, spans, chars, ocr retries,
docs/sec, attempt number).

Resume = call ``run_checkpointed`` again with the same ``out_dir``: completed
partitions are skipped (an anti-join of partitions against the manifest —
the manifest is tiny, so this is a driver-side set lookup, no shuffle).

At 100 TB the same layout holds: partitions map to input fragments / key
ranges, the manifest stays O(partitions), and each partition's pipeline
streams independently — a killed job re-processes only unfinished partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..pipelines.extraction import extract_from_interleaved
from ..stages.ingest import derive_interleaved_batch

MANIFEST = "manifest.jsonl"


def _read_manifest(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_manifest(out_dir: str, row: dict) -> None:
    with open(os.path.join(out_dir, MANIFEST), "a") as f:
        f.write(json.dumps(row, sort_keys=True) + "\n")


def doc_id_range(documents_path: str) -> tuple[int, int]:
    """Min/max doc_id from parquet row-group stats (no data scan).

    EVERY row group must carry usable min/max stats for the metadata path
    to be trusted — a single stats-less row group (written by a tool with
    statistics disabled) could hold ids outside the others' range, and a
    partial answer would silently exclude those docs from every partition.
    Any gap ⟹ fall back to scanning the one column."""
    f = pq.ParquetFile(documents_path)
    idx = f.schema_arrow.get_field_index("doc_id")
    lo, hi = None, None
    complete = True
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            complete = False
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if not complete or lo is None:
        col = pq.read_table(documents_path, columns=["doc_id"]).column("doc_id")
        lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
    return int(lo), int(hi)


def partition_ranges(lo: int, hi: int, n: int) -> list[tuple[int, int]]:
    """n contiguous [lo, hi] inclusive ranges covering [lo, hi]."""
    total = hi - lo + 1
    out = []
    for k in range(n):
        a = lo + k * total // n
        b = lo + (k + 1) * total // n - 1
        if b >= a:
            out.append((a, b))
    return out


def run_checkpointed(
    documents_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    max_partitions_this_run: int | None = None,
    **pipeline_kwargs,
) -> list[dict]:
    """Run the flagship extraction with partition-granular checkpoints.

    Returns the manifest rows of partitions completed across all runs.
    ``max_partitions_this_run`` exists for kill/resume testing: stop after
    completing that many partitions in this invocation.
    """
    os.makedirs(out_dir, exist_ok=True)
    lo, hi = doc_id_range(documents_path)
    ranges = partition_ranges(lo, hi, num_partitions)

    # Partition-layout guard: resuming with a different partitioning (or a
    # different input) would silently mis-map completed partitions.
    layout = {
        "event": "layout",
        "input": documents_path,
        "num_partitions": num_partitions,
        "doc_lo": lo,
        "doc_hi": hi,
    }
    manifest = _read_manifest(out_dir)
    prior = [m for m in manifest if m.get("event") == "layout"]
    if prior:
        if prior[0] != layout:
            raise ValueError(
                f"checkpoint dir {out_dir} was written with layout {prior[0]}, "
                f"cannot resume with {layout}; use a fresh out_dir"
            )
    else:
        _append_manifest(out_dir, layout)

    done = {m["partition"] for m in manifest if m.get("event") == "done"}
    starts: dict[int, int] = {}
    for m in manifest:
        if m.get("event") == "start":
            starts[m["partition"]] = starts.get(m["partition"], 0) + 1

    completed_this_run = 0
    for k, (a, b) in enumerate(ranges):
        if k in done:
            continue
        if (
            max_partitions_this_run is not None
            and completed_this_run >= max_partitions_this_run
        ):
            break
        attempt = starts.get(k, 0) + 1
        _append_manifest(out_dir, {"event": "start", "partition": k, "attempt": attempt})
        t0 = time.monotonic()

        ds = rd.read_parquet(
            documents_path,
            columns=["doc_id", "text", "lang"],
            filter=(pc.field("doc_id") >= a) & (pc.field("doc_id") <= b),
        ).map_batches(derive_interleaved_batch, batch_format="pyarrow")
        result = extract_from_interleaved(ds, **pipeline_kwargs)

        tmp = os.path.join(out_dir, f"part={k}.tmp-{attempt}")
        final = os.path.join(out_dir, f"part={k}")
        shutil.rmtree(tmp, ignore_errors=True)
        result.write_parquet(tmp)

        # partition metrics from the written files (no extra pipeline pass).
        # Ray creates NO output directory for a 0-row dataset — an empty
        # partition (sparse doc_id range) is still a completed partition,
        # not a crash-loop.
        if os.path.isdir(tmp):
            t = pq.read_table(tmp, columns=["n_spans", "total_chars", "ocr_retries"])
            metrics = {
                "docs": t.num_rows,
                "spans": int(pc.sum(t.column("n_spans")).as_py() or 0),
                "total_chars": int(pc.sum(t.column("total_chars")).as_py() or 0),
                "ocr_retries": int(pc.sum(t.column("ocr_retries")).as_py() or 0),
            }
        else:
            os.makedirs(tmp, exist_ok=True)
            metrics = {"docs": 0, "spans": 0, "total_chars": 0, "ocr_retries": 0}
        wall = time.monotonic() - t0
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        _append_manifest(
            out_dir,
            {
                "event": "done",
                "partition": k,
                "attempt": attempt,
                "input": documents_path,
                "doc_lo": a,
                "doc_hi": b,
                **metrics,
                "wall_sec": round(wall, 3),
                "docs_per_sec": (
                    round(metrics["docs"] / wall, 2) if wall > 0 else None
                ),
            },
        )
        done.add(k)
        completed_this_run += 1

    return [m for m in _read_manifest(out_dir) if m.get("event") == "done"]


def checkpointed_extract(sf_dir: str, *, num_partitions: int = 8) -> rd.Dataset:
    """Driver-gated end-to-end checkpoint/resume composition: the flagship
    extraction run THROUGH the partition checkpoint layer, interrupted after
    3 partitions and resumed to completion, with the result read back from
    the checkpointed parquet partitions.

    The compared surface is (doc_id, n_spans) — the same projection as
    ``extract_span_counts``, so its exact SQL twin gates that the
    kill/resume path produces byte-identical extraction output (no doc
    lost, duplicated, or re-extracted differently across the interruption).
    """
    import tempfile

    import numpy as np
    import pyarrow as pa

    documents_path = f"{sf_dir}/documents.parquet"
    out_dir = tempfile.mkdtemp(prefix="ckpt_extract_")
    # Simulated kill: first invocation stops after 3 partitions; the second
    # resumes from the manifest and completes the rest.
    run_checkpointed(
        documents_path, out_dir,
        num_partitions=num_partitions, max_partitions_this_run=3,
    )
    manifest = run_checkpointed(
        documents_path, out_dir, num_partitions=num_partitions
    )
    parts = sorted({m["partition"] for m in manifest})
    # read_parquet treats list entries as files, not dirs — glob the shard
    # files inside each completed partition directory.
    import glob

    files = sorted(
        f
        for k in parts
        for f in glob.glob(os.path.join(out_dir, f"part={k}", "*.parquet"))
    )
    ds = rd.read_parquet(files, columns=["doc_id", "n_spans"])

    def project(batch):
        from ..pipelines.extract_stats import doc_nums

        return pa.table(
            {
                "doc_id": pa.array(doc_nums(batch.column("doc_id")), pa.int64()),
                "n_spans": batch.column("n_spans").cast(pa.int64()),
            }
        )

    # Materialize the narrow (doc_id, n_spans) projection so the scratch
    # checkpoint directory can be removed immediately — repeated driver /
    # bench invocations must not accumulate orphaned /tmp extraction trees.
    result = ds.map_batches(project, batch_format="pyarrow").materialize()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result

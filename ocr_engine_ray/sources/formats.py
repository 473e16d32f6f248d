"""Multi-format export/ingest seams (JSONL, CSV) with exactly-once gates.

The engine's canonical storage is columnar (parquet / the Lance-seam in
`tables.py`), but interchange with crawlers and labeling tools is
line-oriented — NDJSON and CSV.  Both paths here are plain Ray Data
``write_json`` / ``read_json`` (and csv) over the streaming executor: the
export shards one file per block (resumable, never one giant file), the
read-back streams shards as independent blocks.

Each format is gated by the same trick as
`sampling.shuffled_export_digest`: export the corpus to a scratch dir,
read the shards BACK through the format parser, and fold the
(doc_id, text) surface into the order-independent corpus digest
(`interpret.fold_digest`).  A row lost, duplicated, re-encoded or
mis-escaped anywhere in the serialize → shard → parse path changes the
digest; the shard permutation cannot.  The SQL twin computes the SAME
md5 fold directly over ``documents`` as a HUGEINT expression — exact at
any scale, not a pinned literal.
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.tables import sf_table


def _roundtrip_digest(sf_dir: str, fmt: str) -> pa.Table:
    from ..pipelines.interpret import fold_digest

    import os

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = tempfile.mkdtemp(prefix=f"{fmt}_export_")
    try:
        if fmt == "jsonl":
            docs.write_json(out)
        elif fmt == "csv":
            docs.write_csv(out)
        else:  # pragma: no cover - internal misuse guard
            raise ValueError(fmt)
        if not os.listdir(out):
            # empty corpus exports no shards; the fold of an empty
            # surface is 0 (same as fold_digest over zero rows)
            return pa.table({"digest": pa.array([0], pa.int64())})
        back = rd.read_json(out) if fmt == "jsonl" else rd.read_csv(out)

        def payload(batch: pa.Table) -> pa.Table:
            # CSV reads "" back as null; the digest coalesces both sides
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "payload": pc.fill_null(
                        batch.column("text").cast(pa.string()), ""
                    ),
                }
            )

        # fold_digest consumes the dataset (take_all of 1-row partials),
        # so the scratch export is safe to remove in the finally.
        return fold_digest(
            back.map_batches(payload, batch_format="pyarrow"), "payload"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def jsonl_roundtrip_digest(sf_dir: str) -> pa.Table:
    """NDJSON export → shard read-back → corpus digest (1 row)."""
    return _roundtrip_digest(sf_dir, "jsonl")


def csv_roundtrip_digest(sf_dir: str) -> pa.Table:
    """CSV export → shard read-back → corpus digest (1 row)."""
    return _roundtrip_digest(sf_dir, "csv")

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


def _block_file_roundtrip(sf_dir: str, fmt: str) -> pa.Table:
    """Shard-per-block export through a pyarrow FILE codec Ray Data has no
    native writer for (ORC, Feather/Arrow-IPC), then a distributed
    read-back over the shard list — same exactly-once digest gate as the
    line formats.  The write side is a ``map_batches`` side-effect sink
    (one file per batch, unique names — the resumable-shard layout); the
    read side fans the shard paths out as rows, so both directions are
    parallel over blocks, never a driver loop."""
    import os
    import uuid

    from ..pipelines.interpret import fold_digest

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = tempfile.mkdtemp(prefix=f"{fmt}_export_")
    try:
        def dump(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return pa.table({"path": pa.array([], pa.string())})
            path = os.path.join(out, f"part-{uuid.uuid4().hex}.{fmt}")
            if fmt == "orc":
                from pyarrow import orc

                orc.write_table(batch, path)
            else:
                from pyarrow import feather

                feather.write_feather(batch, path)
            return pa.table({"path": pa.array([path], pa.string())})

        paths = [
            r["path"]
            for r in docs.map_batches(dump, batch_format="pyarrow").take_all()
        ]  # shard-count rows, never corpus rows
        if not paths:
            return pa.table({"digest": pa.array([0], pa.int64())})

        def load(batch: pa.Table) -> pa.Table:
            tables = []
            for p in batch.column("path").to_pylist():
                if fmt == "orc":
                    from pyarrow import orc

                    t = orc.read_table(p, columns=["doc_id", "text"])
                else:
                    from pyarrow import feather

                    t = feather.read_table(p, columns=["doc_id", "text"])
                tables.append(t)
            t = pa.concat_tables(tables)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "payload": pc.fill_null(
                        t.column("text").cast(pa.string()), ""
                    ),
                }
            )

        back = rd.from_items([{"path": p} for p in paths]).map_batches(
            load, batch_format="pyarrow"
        )
        return fold_digest(back, "payload")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def orc_roundtrip_digest(sf_dir: str) -> pa.Table:
    """ORC export → shard read-back → corpus digest (1 row)."""
    return _block_file_roundtrip(sf_dir, "orc")


def feather_roundtrip_digest(sf_dir: str) -> pa.Table:
    """Feather (Arrow IPC) export → shard read-back → corpus digest (1 row)."""
    return _block_file_roundtrip(sf_dir, "feather")

"""Small-file compaction planner (sequential bin packing)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.packing import compact_shards


def _write_docs(d, rows):
    """rows: (doc_id, source, n_chars)."""
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestCompactShards:
    def test_sequential_packing_rule(self, tmp_path):
        # one source, files of 1 doc each (block=1), sizes chosen so the
        # exclusive-cumsum rule is visible: target 100
        rows = [(i, "s", sz) for i, sz in enumerate([60, 60, 60, 120, 10])]
        sf = _write_docs(tmp_path / "p", rows)
        got = [
            (r["file_id"], r["size_bytes"], r["byte_offset"], r["out_file"])
            for r in compact_shards(sf, files_block=1, target_bytes=100).take_all()
        ]
        # offsets: 0, 60, 120, 180, 300 → bins 0, 0, 1, 1, 3
        assert got == [
            (0, 60, 0, 0),
            (1, 60, 60, 0),
            (2, 60, 120, 1),
            (3, 120, 180, 1),
            (4, 10, 300, 3),
        ]

    def test_partition_isolation(self, tmp_path):
        # two sources never share an output bin numbering
        rows = [(0, "a", 50), (1, "a", 80), (2, "b", 50), (3, "b", 80)]
        sf = _write_docs(tmp_path / "i", rows)
        got = {
            (r["source"], r["file_id"]): (r["byte_offset"], r["out_file"])
            for r in compact_shards(sf, files_block=1, target_bytes=100).take_all()
        }
        assert got[("a", 0)] == (0, 0)
        assert got[("a", 1)] == (50, 0)
        assert got[("b", 2)] == (0, 0)
        assert got[("b", 3)] == (50, 0)

    def test_block_grouping(self, tmp_path):
        # files_block=2 folds doc pairs into one manifest file
        rows = [(0, "s", 10), (1, "s", 20), (2, "s", 30), (3, "s", 40)]
        sf = _write_docs(tmp_path / "g", rows)
        got = [
            (r["file_id"], r["size_bytes"])
            for r in compact_shards(sf, files_block=2, target_bytes=1000).take_all()
        ]
        assert got == [(0, 30), (1, 70)]

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = compact_shards(sf, num_buckets=3).to_pandas()
        b = compact_shards(sf, num_buckets=32).to_pandas()
        assert a.equals(b)

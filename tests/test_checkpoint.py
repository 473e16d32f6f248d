"""Kill-and-resume test (SURVEY.md §5.5 / north-rule resumability)."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.state.checkpoint import (
    doc_id_range,
    partition_ranges,
    run_checkpointed,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestPartitioning:
    def test_ranges_cover(self):
        rs = partition_ranges(0, 99, 4)
        assert rs[0][0] == 0 and rs[-1][1] == 99
        covered = sum(b - a + 1 for a, b in rs)
        assert covered == 100

    def test_ranges_more_parts_than_keys(self):
        rs = partition_ranges(0, 2, 8)
        assert sum(b - a + 1 for a, b in rs) == 3

    def test_doc_id_range(self):
        lo, hi = doc_id_range(DOCS)
        assert lo == 0 and hi == 499


@pytest.mark.usefixtures("ray_session")
class TestKillResume:
    def test_kill_and_resume(self, tmp_path):
        out = str(tmp_path / "ckpt")

        # run 1: "killed" after 2 of 4 partitions
        m1 = run_checkpointed(
            DOCS, out, num_partitions=4, max_partitions_this_run=2, num_buckets=8
        )
        assert len(m1) == 2
        assert {m["partition"] for m in m1} == {0, 1}
        assert all(m["attempt"] == 1 for m in m1)
        mtimes_before = {
            k: os.path.getmtime(os.path.join(out, f"part={k}")) for k in (0, 1)
        }

        # run 2: resume → completes the rest, does NOT re-process 0 and 1
        m2 = run_checkpointed(DOCS, out, num_partitions=4, num_buckets=8)
        assert {m["partition"] for m in m2} == {0, 1, 2, 3}
        assert all(m["attempt"] == 1 for m in m2)  # nothing re-attempted
        for k, t in mtimes_before.items():
            assert os.path.getmtime(os.path.join(out, f"part={k}")) == t

        # final output = full single-shot pipeline output
        import ray.data as rd

        from ocr_engine_ray.pipelines.extraction import extract_documents

        full = extract_documents(DOCS, num_buckets=8).take_all()
        parts = [
            pq.read_table(os.path.join(out, f"part={k}")) for k in (0, 1, 2, 3)
        ]
        import pyarrow as pa

        got = pa.concat_tables(parts)
        assert got.num_rows == len(full) == 500
        got_ids = sorted(got.column("doc_id").to_pylist())
        assert got_ids == sorted(r["doc_id"] for r in full)
        # spot-check content equality on a few docs
        by_id = {r["doc_id"]: r for r in full}
        for row in got.slice(0, 20).to_pylist():
            exp = by_id[row["doc_id"]]
            assert [
                (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
            ] == [
                (s["kind"], s["text"], s["media_ref"], s["order"]) for s in exp["spans"]
            ]
            assert row["fields_json"] == exp["fields_json"]

        # metrics recorded per checkpoint
        for m in m2:
            assert m["docs"] > 0 and m["spans"] > 0 and m["wall_sec"] > 0
            assert m["input"] == DOCS

    def test_rerun_when_complete_is_noop(self, tmp_path):
        out = str(tmp_path / "ckpt2")
        run_checkpointed(DOCS, out, num_partitions=2, num_buckets=8)
        m = run_checkpointed(DOCS, out, num_partitions=2, num_buckets=8)
        assert len(m) == 2  # still exactly one 'done' per partition

    def test_layout_change_rejected(self, tmp_path):
        out = str(tmp_path / "ckpt3")
        run_checkpointed(
            DOCS, out, num_partitions=2, max_partitions_this_run=1, num_buckets=8
        )
        with pytest.raises(ValueError, match="layout"):
            run_checkpointed(DOCS, out, num_partitions=4, num_buckets=8)


@pytest.mark.usefixtures("ray_session")
class TestCheckpointedExtractQuery:
    def test_matches_plain_extraction_surface(self):
        """The driver-gated kill/resume composition reproduces the plain
        extract_span_counts surface exactly."""
        from ocr_engine_ray.pipelines.extract_stats import extract_span_counts
        from ocr_engine_ray.state.checkpoint import checkpointed_extract

        sf = "/root/testdata/sf0.001"
        got = {
            r["doc_id"]: r["n_spans"]
            for r in checkpointed_extract(sf).take_all()
        }
        want = {
            r["doc_id"]: r["n_spans"] for r in extract_span_counts(sf).take_all()
        }
        assert got == want
        assert len(got) == 500


class TestSparsePartitions:
    def test_empty_partition_completes_and_resumes(self, ray_session, tmp_path):
        """A doc_id range with gaps yields partitions containing zero docs;
        those must complete (Ray writes no directory for a 0-row dataset)
        and be skipped on resume, not crash-loop on a missing metrics file."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.state.checkpoint import run_checkpointed

        rows = [
            {"doc_id": d, "text": f"doc {d} body text", "lang": "en"}
            for d in [0, 1, 2, 9000, 9001]
        ]
        src = tmp_path / "documents.parquet"
        pq.write_table(pa.Table.from_pylist(rows), str(src))
        out = tmp_path / "ckpt"
        manifest = run_checkpointed(str(src), str(out), num_partitions=6)
        assert len(manifest) == 6
        assert sum(m["docs"] for m in manifest) == 5
        assert any(m["docs"] == 0 for m in manifest)  # the gap partitions
        # resume is a no-op (everything done)
        again = run_checkpointed(str(src), str(out), num_partitions=6)
        assert len(again) == 6
        assert sum(1 for m in again if m["attempt"] > 1) == 0

"""Two-level Merkle partition manifest."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import merkle_manifest

SF = "/root/testdata/sf0.001"


def _write_docs(d, texts):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _naive(rows, num_buckets=64):
    from collections import defaultdict

    per = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        h = hashlib.md5(
            f"{r['doc_id']}\x1f{r['text'] or ''}".encode()
        ).hexdigest()
        per[r["doc_id"] % num_buckets].append(h)
    out = []
    for b in sorted(per):
        out.append(
            ("leaf", b, len(per[b]), hashlib.md5("".join(per[b]).encode()).hexdigest())
        )
    root = hashlib.md5("".join(d for _, _, _, d in out).encode()).hexdigest()
    out.append(("root", -1, len(rows), root))
    return sorted(out, key=lambda t: (t[0], t[1]))


@pytest.mark.usefixtures("ray_session")
class TestMerkle:
    def test_matches_naive_on_real_data(self):
        rows = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        got = [tuple(r.values()) for r in merkle_manifest(SF).take_all()]
        assert got == _naive(rows)

    def test_single_edit_localizes(self, tmp_path):
        texts = [f"doc body {i}" for i in range(40)]
        sf1 = _write_docs(tmp_path / "v1", texts)
        texts2 = list(texts)
        texts2[17] = "doc body 17 EDITED"
        sf2 = _write_docs(tmp_path / "v2", texts2)
        m1 = {(r["level"], r["bucket"]): r["digest"] for r in merkle_manifest(sf1, num_buckets=8).take_all()}
        m2 = {(r["level"], r["bucket"]): r["digest"] for r in merkle_manifest(sf2, num_buckets=8).take_all()}
        changed = {k for k in m1 if m1[k] != m2[k]}
        assert changed == {("leaf", 17 % 8), ("root", -1)}

    def test_batching_invariance(self):
        a = [tuple(r.values()) for r in merkle_manifest(SF, num_buckets=8).take_all()]
        b = [tuple(r.values()) for r in merkle_manifest(SF, num_buckets=8).take_all()]
        assert a == b

"""Language-ID confusion matrix."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import langid_batch, langid_confusion


@pytest.mark.usefixtures("ray_session")
class TestLangidConfusion:
    def test_matches_batch_detector(self, tmp_path):
        d = tmp_path / "l"
        d.mkdir()
        rows = [
            ("en", "the cat and the dog have a house with the tree"),
            ("en", "der hund und die katze sind nicht hier"),  # mislabeled
            ("hi", "कुछ हिंदी"),
            (None, "el perro y el gato no la casa de una y el"),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                    "lang": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = {
            (r["lang_label"], r["lang_detected"]): r["n_docs"]
            for r in langid_confusion(str(d)).take_all()
        }
        pred = langid_batch([r[1] for r in rows])
        want = {}
        for (lab, _), p in zip(rows, pred):
            want[(lab or "", p)] = want.get((lab or "", p), 0) + 1
        assert got == want
        assert got[("hi", "hi")] == 1  # Devanagari detected
        assert sum(got.values()) == 4

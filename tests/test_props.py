"""Semi-structured props field extraction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import props_field_stats


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "props": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestPropsFieldStats:
    def test_extraction_misses_and_negatives(self, tmp_path):
        rows = [
            ("a", '{"k": 10}'),
            ("a", '{"k": -3}'),
            ("a", '{"other": 1}'),   # miss
            ("a", None),              # miss
            ("a", '{"k": "str"}'),   # non-integer k -> miss
            ("b", '{"k":7}'),         # no space after colon
        ]
        sf = _write_events(tmp_path / "p", rows)
        got = {r["event_type"]: r for r in props_field_stats(sf).take_all()}
        a = got["a"]
        assert (a["n_events"], a["n_with_k"], a["k_sum"]) == (5, 2, 7)
        assert (a["k_min"], a["k_max"]) == (-3, 10)
        b = got["b"]
        assert (b["n_with_k"], b["k_sum"]) == (1, 7)

"""Stationary distribution of the event-type Markov chain."""

from __future__ import annotations

import datetime as dt
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import stationary_rows
from ocr_engine_ray.pipelines.analytics import (
    markov_stationary,
    markov_stationary_digest,
)

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["markov_stationary_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == stationary_rows(SF_GATE)


def _write_events(d, seqs):
    """seqs: list of event-type sequences, one per user."""
    d.mkdir(parents=True)
    eid, ts, uid, et = [], [], [], []
    i = 0
    for u, seq in enumerate(seqs):
        for j, t in enumerate(seq):
            eid.append(i)
            ts.append(dt.datetime(2024, 1, 1) + dt.timedelta(minutes=j))
            uid.append(u)
            et.append(t)
            i += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestMarkov:
    def test_two_state_known_solution(self, tmp_path):
        # Chain: a->b always, b->a twice / b->b once ->
        # P = [[0,1],[2/3,1/3]]; pi = (2/5, 3/5)
        sf = _write_events(
            tmp_path / "k", [["a", "b", "a", "b", "b", "a", "b"]] * 3
        )
        got = {r["event_type"]: r["pi_ppm"] for r in markov_stationary(sf).to_pylist()}
        assert got == {"a": 400_000, "b": 600_000}

    def test_dangling_state_uniform_fix(self, tmp_path):
        # 'end' never leaves -> uniform outgoing row; chain stays ergodic
        sf = _write_events(tmp_path / "d", [["a", "end"], ["a", "end"]])
        rows = {r["event_type"]: r for r in markov_stationary(sf).to_pylist()}
        assert rows["end"]["out_total"] == 2  # uniform over K=2 states
        # A = [[2,-2],[-1,1]] -> pi = (1/3, 2/3)
        assert rows["a"]["pi_ppm"] == 333_333
        assert rows["end"]["pi_ppm"] == 666_667

    def test_engine_matches_independent_solver(self, tmp_path):
        seqs = [
            ["x", "y", "z", "x", "z", "y"],
            ["y", "y", "x", "z"],
            ["z", "x", "x", "y"],
        ]
        sf = _write_events(tmp_path / "m", seqs)
        t = markov_stationary_digest(sf)
        eng = (t.column("n_states")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == stationary_rows(sf)

    def test_pi_sums_to_one(self, tmp_path):
        sf = _write_events(tmp_path / "s", [["a", "b", "c", "a", "c", "b", "a"]])
        t = markov_stationary(sf)
        total = sum(t.column("pi_ppm").to_pylist())
        assert abs(total - 1_000_000) <= 2  # per-row half-even quantization

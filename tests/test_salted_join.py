"""Salted skewed-key join (pipelines/joins.py:segment_event_value)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.joins import segment_event_value

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def skew_sf(tmp_path):
    """One pathologically hot key (60% of all events), null user_ids, and
    orphan user_ids with no customer row — the inputs salting exists for."""
    rng = np.random.default_rng(23)
    n_cust, n_events = 50, 5000
    ck = np.arange(1, n_cust + 1, dtype=np.int64)
    seg = rng.choice(["ALPHA", "BETA", "GAMMA"], size=n_cust)
    pq.write_table(
        pa.table({"c_custkey": ck, "c_mktsegment": pa.array(seg.tolist())}),
        str(tmp_path / "customer.parquet"),
    )
    uid = rng.integers(1, n_cust + 10, size=n_events).astype(np.float64)
    uid[rng.random(n_events) < 0.6] = 7  # the hot key
    uid[rng.random(n_events) < 0.02] = np.nan  # dirty rows
    val = np.round(rng.random(n_events) * 100, 2)
    val[rng.random(n_events) < 0.03] = np.nan
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
                "user_id": pa.array(
                    [None if np.isnan(u) else int(u) for u in uid], pa.int64()
                ),
                "value": pa.array(
                    [None if np.isnan(v) else float(v) for v in val], pa.float64()
                ),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def _oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(
        """
        SELECT c_mktsegment, count(*)::BIGINT AS n_events,
               round(sum(round(value * 100)::BIGINT) / 100.0, 2) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1
        """
    ).df()


@pytest.mark.usefixtures("ray_session")
class TestSaltedJoin:
    def test_matches_oracle_on_skewed_input(self, skew_sf):
        got = segment_event_value(skew_sf).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, _oracle(skew_sf), check_dtype=False)

    def test_salt_invariance(self, skew_sf):
        base = segment_event_value(skew_sf, salt=1).take_all()
        for s in (4, 7):
            assert segment_event_value(skew_sf, salt=s).take_all() == base

    def test_bucket_invariance(self, skew_sf):
        a = segment_event_value(skew_sf, num_buckets=3).take_all()
        b = segment_event_value(skew_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = segment_event_value(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        for t in ("customer", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        want = con.execute(e.oracle_sql()["segment_event_value"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

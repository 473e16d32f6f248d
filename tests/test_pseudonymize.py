"""Keyed pseudonymization (pipelines/tagger.py:pseudonymize_user_activity)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_engine_ray.pipelines.tagger import pseudonymize_user_activity

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestPseudonymize:
    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = pseudonymize_user_activity(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["pseudonymize_user_activity"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bijective_and_distribution_preserving(self):
        df = pseudonymize_user_activity(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        # one surrogate per user (no collisions at this scale) and the
        # multiset of per-entity counts is unchanged — labels only
        per_user = con.execute(
            """SELECT count(*)::BIGINT FROM events WHERE user_id IS NOT NULL
               GROUP BY user_id ORDER BY 1"""
        ).df().iloc[:, 0].tolist()
        assert len(df) == len(per_user)
        assert sorted(df["n_events"].tolist()) == per_user

    def test_salt_changes_surrogates_not_shape(self):
        a = pseudonymize_user_activity(SF).to_pandas()
        b = pseudonymize_user_activity(SF, salt="other").to_pandas()
        assert set(a["pseudo_id"]) != set(b["pseudo_id"])
        assert sorted(a["n_events"]) == sorted(b["n_events"])
        assert sorted(a["value_cents"]) == sorted(b["value_cents"])

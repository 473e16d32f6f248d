"""Runtime-filter Bloom semi-join (pipelines/joins.py:bloom_semi_join)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.joins import bloom_semi_join


@pytest.fixture()
def semi_sf(tmp_path):
    rng = np.random.default_rng(11)
    n_orders, n_lines = 400, 3000
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    prio = np.where(rng.random(n_orders) < 0.2, "1-URGENT", "5-LOW")
    pq.write_table(
        pa.table({"o_orderkey": okeys, "o_orderpriority": pa.array(prio.tolist())}),
        str(tmp_path / "orders.parquet"),
    )
    # lineitem keys include RI violations (keys > n_orders) that a sloppy
    # membership test could admit
    lkeys = rng.integers(1, n_orders + 50, size=n_lines).astype(np.int64)
    flags = rng.choice(["A", "N", "R"], size=n_lines)
    pq.write_table(
        pa.table(
            {"l_orderkey": lkeys, "l_returnflag": pa.array(flags.tolist())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def _oracle(sf: str) -> list[tuple]:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(
        """
        SELECT l_returnflag, count(*)::BIGINT AS n_items
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).fetchall()


@pytest.mark.usefixtures("ray_session")
class TestBloomSemiJoin:
    def test_matches_oracle(self, semi_sf):
        got = [
            (r["l_returnflag"], r["n_items"])
            for r in bloom_semi_join(semi_sf).take_all()
        ]
        assert got == _oracle(semi_sf)

    def test_false_positives_killed_exactly(self, semi_sf):
        # fp_rate 0.5 makes the bitmap tiny — a large fraction of non-member
        # probe keys pass the bloom, so this pins the verify stage, not the
        # filter: the result must still be exact.
        got = [
            (r["l_returnflag"], r["n_items"])
            for r in bloom_semi_join(semi_sf, fp_rate=0.5, num_buckets=4).take_all()
        ]
        assert got == _oracle(semi_sf)

    def test_empty_build_side(self, semi_sf):
        assert bloom_semi_join(semi_sf, priority="NOPE").take_all() == []

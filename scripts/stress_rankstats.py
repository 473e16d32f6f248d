"""Stress the tenth-continuation operators at ~8-20x gate scale.

Synthesizes enlarged tables from sf0.1 with offset keys (the session-8
stress convention: replicate rows, shift the key space per replica so
joins/rankings see genuinely distinct entities), writes them to a /tmp
dir, then times each new operator once on 32 CPUs.

Usage: python scripts/stress_rankstats.py [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"


def replicate(src: str, dst: str, key_cols: dict[str, int], replicas: int) -> int:
    """Replicate a parquet table; each replica shifts ``key_cols`` by
    r * offset so keys stay disjoint."""
    t = pq.read_table(src)
    parts = []
    for r in range(replicas):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in key_cols and r > 0:
                col = pc.add(col, pa.scalar(r * key_cols[name], col.type))
            cols[name] = col
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst)
    return out.num_rows


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    d = tempfile.mkdtemp(prefix="stress_rank_")
    try:
        n_li = replicate(
            f"{SF}/lineitem.parquet",
            f"{d}/lineitem.parquet",
            {"l_orderkey": 10_000_000, "l_partkey": 10_000_000, "l_suppkey": 10_000_000},
            replicas,
        )
        n_or = replicate(
            f"{SF}/orders.parquet",
            f"{d}/orders.parquet",
            {"o_orderkey": 10_000_000, "o_custkey": 10_000_000},
            replicas,
        )
        replicate(
            f"{SF}/customer.parquet",
            f"{d}/customer.parquet",
            {"c_custkey": 10_000_000},
            replicas,
        )
        n_ev = replicate(
            f"{SF}/events.parquet",
            f"{d}/events.parquet",
            {"event_id": 100_000_000, "user_id": 10_000_000},
            replicas,
        )
        # supplier/nation stay 1x (dims)
        shutil.copy(f"{SF}/supplier.parquet", f"{d}/supplier.parquet")
        shutil.copy(f"{SF}/nation.parquet", f"{d}/nation.parquet")
        print(f"stress tables: lineitem={n_li} orders={n_or} events={n_ev} ({replicas}x)")

        from ocr_engine_ray.pipelines import analytics, basket, graph, profile, rankstats

        ops = {
            "spearman_qty_price": rankstats.spearman_qty_price,
            "mannwhitney_order_value": rankstats.mannwhitney_order_value,
            "rfm_segments": rankstats.rfm_segments,
            "acf_daily_revenue": rankstats.acf_daily_revenue,
            "common_neighbors_topk": basket.common_neighbors_topk,
            "bfs_hops": graph.bfs_hops,
            "event_trigrams": analytics.event_trigrams,
            "herfindahl_by_nation": profile.herfindahl_by_nation,
            "weekday_seasonality": analytics.weekday_seasonality,
        }
        for name, fn in ops.items():
            t0 = time.monotonic()
            res = fn(d)
            n = res.num_rows if isinstance(res, pa.Table) else res.count()
            print(f"{name}: {time.monotonic() - t0:.2f}s rows={n}", flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()

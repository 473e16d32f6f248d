"""Property tests for the shared hash-bucket reduceat fold (fold.py) —
the replacement for per-distinct-key `groupby(key).aggregate(...)`."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocr_engine_ray.pipelines.fold import fold_by_key, fold_int_sums_by_key


class TestFoldByKey:
    def test_sums_match_pandas_groupby(self, ray_session):
        rng = np.random.default_rng(5)
        for trial in range(4):
            n = int(rng.integers(1, 2000))
            keys = rng.integers(0, 300, size=n).astype(np.int64)
            a = rng.integers(-(10**12), 10**12, size=n).astype(np.int64)
            b = rng.integers(0, 10**6, size=n).astype(np.int64)
            tbl = pa.table(
                {
                    "doc_id": pa.array(keys),
                    "a": pa.array(a),
                    "b": pa.array(b),
                }
            )
            got = {
                r["doc_id"]: (r["a"], r["b"])
                for r in fold_int_sums_by_key(
                    rd.from_arrow(tbl).repartition(7), cols=["a", "b"]
                ).take_all()
            }
            import pandas as pd

            ref = (
                pd.DataFrame({"k": keys, "a": a, "b": b})
                .groupby("k")
                .sum()
            )
            want = {int(k): (int(r["a"]), int(r["b"])) for k, r in ref.iterrows()}
            assert got == want, f"trial {trial}"

    def test_min_max_ops(self, ray_session):
        rng = np.random.default_rng(6)
        keys = rng.integers(0, 50, size=500).astype(np.int64)
        v = rng.integers(-(10**9), 10**9, size=500).astype(np.int64)
        tbl = pa.table({"doc_id": pa.array(keys), "v": pa.array(v), "w": pa.array(v)})
        got = {
            r["doc_id"]: (r["v"], r["w"])
            for r in fold_by_key(
                rd.from_arrow(tbl).repartition(5),
                cols=["v", "w"],
                ops=["min", "max"],
            ).take_all()
        }
        want: dict[int, tuple[int, int]] = {}
        for k, x in zip(keys.tolist(), v.tolist()):
            lo, hi = want.get(k, (x, x))
            want[k] = (min(lo, x), max(hi, x))
        assert got == want

    def test_bucket_count_invariance(self, ray_session):
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 1000, size=800).astype(np.int64)
        v = rng.integers(0, 10**9, size=800).astype(np.int64)
        tbl = pa.table({"doc_id": pa.array(keys), "v": pa.array(v)})
        outs = [
            sorted(
                (r["doc_id"], r["v"])
                for r in fold_int_sums_by_key(
                    rd.from_arrow(tbl), cols=["v"], num_buckets=nb
                ).take_all()
            )
            for nb in (1, 3, 64)
        ]
        assert outs[0] == outs[1] == outs[2]


class TestVectorizedContraction:
    def test_matches_union_find_reference(self, ray_session):
        # the vectorized min-label contraction vs a plain dict union-find,
        # over random graphs: identical canonical star forests (rows AND order)
        import numpy as np
        import pyarrow as pa

        from ocr_engine_ray.pipelines.graph import _uf_bucket

        def reference(nodes, labels):
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(nodes, labels):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            out = []
            for x in sorted(parent):
                r = find(x)
                out.append((x, r))
                if r != x:
                    out.append((r, x))
            return out

        rng = np.random.default_rng(13)
        for trial in range(8):
            n_edges = int(rng.integers(1, 400))
            hi = int(rng.integers(4, 1000))
            a = rng.integers(0, hi, size=n_edges).astype(np.int64)
            b = rng.integers(0, hi, size=n_edges).astype(np.int64)
            group = pa.table(
                {"node": pa.array(a), "label": pa.array(b), "_bkt": pa.array(np.zeros(n_edges, np.int64))}
            )
            out = _uf_bucket(group)
            got = list(zip(out.column("node").to_pylist(), out.column("label").to_pylist()))
            assert got == reference(a.tolist(), b.tolist()), f"trial {trial}"

        # adversarial: long chain collapses in one bucket call
        chain_n = 2000
        a = np.arange(chain_n - 1, dtype=np.int64)
        b = a + 1
        out = _uf_bucket(pa.table({"node": pa.array(a), "label": pa.array(b)}))
        roots = {
            r["node"]: r["label"]
            for r in out.to_pylist()
            if r["node"] != 0 and r["label"] == 0
        }
        assert len(roots) == chain_n - 1  # every member points at root 0

"""Digest gates for the sketch-based cluster surfaces: the SQL literals in
`__ray_entry__.oracle_sql()` are pinned from the INDEPENDENT sequential
oracles (`ocr_engine_ray.oracle_dedup` — plain dict/union-find
reimplementations), and the Ray pipelines must reproduce them bit-for-bit.

Three layers, like test_interpret's rich-fields gate:
  1. literal == oracle recomputation (keeps the pin honest),
  2. Ray digest == literal (the exact comparison the driver gate runs),
  3. Ray cluster ROWS == oracle rows (stronger diagnostics than a digest
     mismatch when something drifts).
"""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def _literal(name: str) -> int:
    import __ray_entry__ as entry

    sql = entry.oracle_sql()[name]
    m = re.search(r"SELECT (\d+)::BIGINT AS digest", sql)
    assert m, name
    return int(m.group(1))


class TestDedupDigestGates:
    def test_literals_match_oracle(self):
        from scripts.gen_digest_oracle import dedup_oracle_digests

        got = dedup_oracle_digests(SF)
        for name, want in got.items():
            assert _literal(name) == want, name

    @pytest.mark.parametrize(
        "name",
        [
            "minhash_digest",
            "incremental_dedup_digest",
            "split_leakage_digest",
            "kcore_digest",
            "simhash_digest",
            "winnow_digest",
            "ann_lsh_digest",
            "kmeans_digest",
            "semantic_digest",
            "ann_ivf_digest",
            "ann_ivfpq_digest",
            "embedding_lsh_digest",
            "bpe_digest",
            "bpe_encode_digest",
            "cluster_topics_digest",
        ],
    )
    def test_ray_digest_matches_literal(self, ray_session, name):
        import __ray_entry__ as entry

        t = entry.queries()[name](SF)
        assert t.column("digest")[0].as_py() == _literal(name), name

    def test_hourly_uniques_computed_twin(self, ray_session):
        """Same literal -> computed conversion as approx_distinct: the
        hourly HLL twin recomputes registers over str(user_id) keyed by
        the hour's str() form."""
        import duckdb

        import __ray_entry__ as entry
        from ocr_engine_ray import oracle_dedup as od

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS"
            f" SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        sql_digest = con.execute(
            entry.oracle_sql()["hourly_uniques_digest"]
        ).fetchone()[0]
        assert sql_digest == od.hll_digest(od.hll_hourly_users(SF))
        t = entry.queries()["hourly_uniques_digest"](SF)
        assert t.column("digest")[0].as_py() == sql_digest

    def test_approx_distinct_computed_twin(self, ray_session):
        """approx_distinct_digest converted literal -> COMPUTED twin in
        round 5: the DuckDB SQL recomputes registers (md5-64), the
        exact-integer harmonic sum, the estimate and the md5-fold digest
        wholesale; the sequential oracle and the Ray pipeline must both
        match it bit-for-bit."""
        import duckdb

        import __ray_entry__ as entry
        from ocr_engine_ray import oracle_dedup as od

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS"
            f" SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        sql_digest = con.execute(
            entry.oracle_sql()["approx_distinct_digest"]
        ).fetchone()[0]
        assert sql_digest == od.hll_digest(od.hll_distinct_by_source(SF))
        t = entry.queries()["approx_distinct_digest"](SF)
        assert t.column("digest")[0].as_py() == sql_digest

    def test_hll_ln_parity_and_round_margin(self):
        """The two float hazards of the computed HLL twin, measured:
        DuckDB ``ln`` must equal libm ``math.log`` on every possible
        linear-counting argument, and no estimate may sit within 1e-6 of
        a floor(+0.5) boundary."""
        import math

        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            "select z, 4096.0 * ln(4096.0 / z)"
            " from generate_series(1, 4096) t(z)"
        ).fetchall()
        for z, v in rows:
            assert v == 4096.0 * math.log(4096.0 / z), z
        margin = min(
            abs((4096.0 * math.log(4096.0 / z)) % 1 - 0.5)
            for z in range(1, 4097)
        )
        assert margin > 1e-6

    def test_cluster_topics_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines.topics import cluster_topics

        t = cluster_topics(SF)
        got = list(
            zip(
                t.column("cluster").to_pylist(),
                t.column("rank").to_pylist(),
                t.column("token").to_pylist(),
                t.column("tf").to_pylist(),
                t.column("df").to_pylist(),
                t.column("score_q").to_pylist(),
            )
        )
        assert got == od.cluster_topic_rows(SF)
        # structure: every cluster ranked 1..T, scores non-increasing
        per = {}
        for c, rk, _tok, _tf, _df, sq in got:
            per.setdefault(c, []).append((rk, sq))
        for c, rows in per.items():
            assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
            scores = [s for _, s in rows]
            assert scores == sorted(scores, reverse=True)

    def test_cluster_topics_bucket_invariance(self, ray_session):
        from ocr_engine_ray.pipelines.topics import cluster_topics

        a = cluster_topics(SF, num_buckets=3)
        b = cluster_topics(SF, num_buckets=16)
        assert a.equals(b)

    def test_minhash_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["doc_id"], r["cluster_id"])
            for r in dedup.minhash_lsh_dedup(SF).take_all()
        ]
        assert sorted(rows) == od.minhash_clusters(SF)

    def test_incremental_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["doc_id"], r["dup_of"])
            for r in dedup.incremental_dedup(SF).take_all()
        ]
        assert rows == od.incremental_matches(SF)
        # every match crosses the split: new side left, history side right
        mod = dedup.INCREMENTAL_SPLIT_MOD
        assert all(d % mod == mod - 1 and o % mod != mod - 1 for d, o in rows)

    def test_incremental_lower_threshold_more_pairs(self, ray_session):
        # at a looser threshold the candidate/verify machinery admits more
        # matches and still agrees with the sequential oracle row-for-row
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["doc_id"], r["dup_of"])
            for r in dedup.incremental_dedup(SF, threshold=0.3).take_all()
        ]
        want = od.incremental_matches(SF, threshold=0.3)
        assert rows == want
        assert len(want) >= len(od.incremental_matches(SF))

    def test_incremental_partition_invariance(self, ray_session):
        from ocr_engine_ray.pipelines import dedup

        a = dedup.incremental_dedup(SF, num_partitions=7).take_all()
        b = dedup.incremental_dedup(SF, num_partitions=64).take_all()
        assert a == b

    def test_leakage_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup
        from ocr_engine_ray.pipelines.sampling import temperature_coin

        rows = [
            (r["doc_id"], r["leaked_from"])
            for r in dedup.split_leakage_audit(SF).take_all()
        ]
        assert rows == od.leakage_matches(SF)
        # every match crosses the hash_split boundary: left side is a TEST
        # doc by the split's own coin, right side is train/val
        for d, o in rows:
            assert temperature_coin([d], salt="s")[0] >= 0.95
            assert temperature_coin([o], salt="s")[0] < 0.95

    def test_leakage_wider_test_fraction_supersets(self, ray_session):
        # a wider test fraction can only add audited test docs; both widths
        # agree with the sequential oracle row-for-row
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        wide = [
            (r["doc_id"], r["leaked_from"])
            for r in dedup.split_leakage_audit(SF, test_frac=0.25).take_all()
        ]
        assert wide == od.leakage_matches(SF, test_frac=0.25)
        assert len(wide) >= len(od.leakage_matches(SF))

    def test_simhash_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["doc_id"], r["cluster_id"]) for r in dedup.simhash_dedup(SF).take_all()
        ]
        assert sorted(rows) == od.simhash_clusters(SF)

    def test_winnow_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["doc_id"], r["cluster_id"]) for r in dedup.winnow_near_dup(SF).take_all()
        ]
        assert sorted(rows) == od.winnow_clusters(SF)

    def test_ann_lsh_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import ann

        rows = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ann.ann_topk_lsh(SF).take_all()
        ]
        assert sorted(rows) == od.ann_lsh_topk(SF)

    def test_kmeans_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import ann

        rows = [
            (r["vec_id"], r["cluster"]) for r in ann.embedding_kmeans(SF).take_all()
        ]
        assert sorted(rows) == od.kmeans_assignments(SF, k=8, iters=5)

    def test_semantic_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["vec_id"], r["cluster"]) for r in dedup.semantic_dedup(SF).take_all()
        ]
        assert sorted(rows) == od.semantic_keep(SF)

    def test_ivf_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import ann

        rows = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ann.ann_topk_ivf(SF).take_all()
        ]
        assert sorted(rows) == od.ivf_topk(SF)

    def test_ivfpq_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import ann

        rows = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ann.ann_topk_ivfpq(SF).take_all()
        ]
        assert sorted(rows) == od.ivfpq_topk(SF)

    def test_ivfpq_recall_floor(self, ray_session):
        # PQ is approximate twice over (list pruning + quantization); the
        # measured point is 0.725 vs the 0.85 exact-rerank ceiling of the
        # nprobe=4/16 coarse quantizer — gate well below the noise band.
        from ocr_engine_ray.pipelines import ann

        truth: dict[int, set[int]] = {}
        for r in ann.ann_topk_bruteforce(SF).take_all():
            truth.setdefault(r["query_id"], set()).add(r["vec_id"])
        got: dict[int, set[int]] = {}
        for r in ann.ann_topk_ivfpq(SF).take_all():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ]
        assert sum(recalls) / len(recalls) >= 0.6

    def test_hourly_hll_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import textstats

        rows = [
            (str(r["hour"]), r["approx_unique"])
            for r in textstats.hourly_approx_uniques(SF).take_all()
        ]
        assert sorted(rows) == od.hll_hourly_users(SF)

    def test_hll_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import textstats

        rows = [
            (r["source"], r["approx_unique"])
            for r in textstats.approx_distinct_texts(SF).take_all()
        ]
        assert sorted(rows) == od.hll_distinct_by_source(SF)

    def test_embedding_lsh_rows_match_oracle(self, ray_session):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines import dedup

        rows = [
            (r["vec_id"], r["cluster_id"])
            for r in dedup.embedding_near_dup_lsh(SF).take_all()
        ]
        assert sorted(rows) == od.embedding_lsh_clusters(SF)

    def test_embedding_lsh_full_recall_vs_exact(self, ray_session):
        """At the gate threshold/params, the LSH path finds every exact
        near-dup cluster (measured recall 1.0 at sf0.01 AND sf0.1, pinned
        here at sf0.01): its clusters coincide with the exact block-pair
        operator's.  Precision is 1.0 by construction (in-bucket exact
        cosine verify), so equality — not just subset — is the right pin."""
        from ocr_engine_ray.pipelines import dedup

        lsh = [
            (r["vec_id"], r["cluster_id"])
            for r in dedup.embedding_near_dup_lsh(SF).take_all()
        ]
        exact = [
            (r["vec_id"], r["cluster_id"])
            for r in dedup.embedding_near_dup_clusters(SF).take_all()
        ]
        assert sorted(lsh) == sorted(exact)

    def test_emb_band_rows_batching_invariant(self):
        """The digest pin assumes banding is batching-independent: splitting
        a batch anywhere yields the same (vec_id, bkt) rows.  Per-row
        normalize/project plus margin-checked sign decisions guarantee it;
        this pins the claim without Ray in the loop."""
        import numpy as np
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.dedup import _emb_band_rows

        t = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        kw = {"num_bands": 48, "band_bits": 4, "seed": 20260817}
        whole = _emb_band_rows(t, **kw)
        rng = np.random.default_rng(7)
        cuts = sorted(rng.choice(np.arange(1, t.num_rows), size=5, replace=False))
        parts = []
        prev = 0
        for c in list(cuts) + [t.num_rows]:
            parts.append(_emb_band_rows(t.slice(prev, c - prev), **kw))
            prev = c
        import pyarrow as pa

        split = pa.concat_tables(parts)
        assert whole.column("vec_id").to_pylist() == split.column("vec_id").to_pylist()
        assert whole.column("bkt").to_pylist() == split.column("bkt").to_pylist()

    def test_emb_band_rows_empty_batch(self):
        """Zero-row batches (empty table / empty block) must pass through
        with the right schema instead of crashing on a 1-D empty array."""
        import pyarrow as pa

        from ocr_engine_ray.pipelines.dedup import _emb_band_rows

        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
        out = _emb_band_rows(empty, num_bands=48, band_bits=4, seed=20260817)
        assert out.num_rows == 0
        assert out.column_names == ["vec_id", "embedding", "bkt"]


@pytest.mark.usefixtures("ray_session")
class TestKcore:
    def test_rows_match_oracle(self):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines.graph import kcore_members

        rows = [(r["node"], r["deg_in_core"]) for r in kcore_members(SF).take_all()]
        assert rows == od.kcore_nodes(SF)
        # k-core invariant: every member keeps degree >= k inside the core
        assert all(d >= 2 for _, d in rows)

    def test_higher_k_is_subset(self):
        from ocr_engine_ray import oracle_dedup as od
        from ocr_engine_ray.pipelines.graph import kcore_members

        k3 = [(r["node"], r["deg_in_core"]) for r in kcore_members(SF, k=3).take_all()]
        assert k3 == od.kcore_nodes(SF, k=3)
        k2_nodes = {n for n, _ in od.kcore_nodes(SF, k=2)}
        assert {n for n, _ in k3} <= k2_nodes

    def test_huge_k_empty(self):
        from ocr_engine_ray.pipelines.graph import kcore_members

        assert kcore_members(SF, k=10_000).take_all() == []

"""Generate the ORACLE-side corpus digests pinned as SQL literals for the
`rich_fields_digest` / `vocab_fields_digest` driver queries.

The digests are computed from the independent per-doc oracle
(`ocr_engine_ray.oracle`), NOT from the Ray pipeline — so the pinned
literal gates the pipeline against the oracle, exactly like every other
CORRECTNESS row.  Run:

    python scripts/gen_digest_oracle.py [sf_dir ...]

and paste the printed numbers into `__ray_entry__.oracle_sql()`.
`tests/test_interpret.py::test_digest_literals_match_oracle` re-derives the
sf0.01 numbers on every pytest run and compares them to the literals, so
the pin can never silently drift from the oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from ocr_engine_ray import oracle, synth
from ocr_engine_ray.config import DEFAULT_FIELD_LABELS, PipelineConfig
from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest


def dedup_oracle_digests(sf_dir: str) -> dict[str, int]:
    """Digests for the sketch/dedup surfaces, from the independent sequential
    oracles in `ocr_engine_ray.oracle_dedup` (never the Ray pipelines)."""
    from ocr_engine_ray import oracle_dedup as od

    return {
        "minhash_digest": od.clusters_digest(od.minhash_clusters(sf_dir)),
        "incremental_dedup_digest": od.clusters_digest(od.incremental_matches(sf_dir)),
        "split_leakage_digest": od.clusters_digest(od.leakage_matches(sf_dir)),
        "kcore_digest": od.clusters_digest(od.kcore_nodes(sf_dir)),
        "simhash_digest": od.clusters_digest(od.simhash_clusters(sf_dir)),
        "winnow_digest": od.clusters_digest(od.winnow_clusters(sf_dir)),
        "ann_lsh_digest": od.topk_digest(od.ann_lsh_topk(sf_dir)),
        "kmeans_digest": od.clusters_digest(od.kmeans_assignments(sf_dir, k=8, iters=5)),
        "semantic_digest": od.clusters_digest(od.semantic_keep(sf_dir)),
        "ann_ivf_digest": od.topk_digest(od.ivf_topk(sf_dir)),
        "ann_ivfpq_digest": od.topk_digest(od.ivfpq_topk(sf_dir)),
        "embedding_lsh_digest": od.clusters_digest(od.embedding_lsh_clusters(sf_dir)),
        "bpe_digest": od.bpe_digest(od.bpe_merges(sf_dir)),
        "bpe_encode_digest": od.bpe_encode_digest(od.bpe_encode_rows(sf_dir)),
        "cluster_topics_digest": od.topics_digest(od.cluster_topic_rows(sf_dir)),
    }


def tuple_digest_oracles(sf_dir: str) -> dict[str, tuple]:
    """Pins whose SQL twin carries TWO literals (a count column + the
    digest) — kept separate from `dedup_oracle_digests` so its
    single-literal pytest contract stays uniform.  Each has its own
    literal-rederivation test (test_markov / test_hyperball /
    test_compression_ratio)."""
    from ocr_engine_ray import oracle_dedup as od

    return {
        "markov_stationary_digest": od.stationary_rows(sf_dir),
        "hyperball_digest": od.hyperball_rows(sf_dir),
        "compression_ratio_digest": od.compression_hist_rows(sf_dir),
        # holt_forecast_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_holt.py runs the recursive-CTE SQL vs the oracle).
        # kcenter_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_kcenter.py runs the unrolled greedy SQL vs the oracle).
        "betweenness_digest": od.betweenness_rows(sf_dir),
        # vocab_sketch_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_vocab_sketch.py runs the SQL against the oracle).
        # ppr_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_ppr.py runs the unrolled-walk SQL vs the oracle).
        # hits_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_hits.py runs the unrolled half-round SQL vs the oracle).
        "bq_digest": od.bq_rows(sf_dir),
        "cluster_outlier_digest": od.cluster_outlier_rows(sf_dir),
        "ktruss_digest": od.ktruss_rows(sf_dir),
        "cdc_digest": od.cdc_rows(sf_dir),
        "ann_mp_digest": od.multiprobe_rows(sf_dir),
        "ann_eval2_digest": od.ann_eval2_rows(sf_dir),
        "ann_eval_digest": od.ann_eval_rows(sf_dir),
        "dedup_eval_digest": od.dedup_eval_rows(sf_dir),
        # rake_digest: converted to a COMPUTED SQL twin in round 5
        # (tests/test_rake.py runs the window-function SQL vs the oracle).
        "field_provenance_digest": od.field_provenance_rows(sf_dir),
    }


def oracle_digests(sf_dir: str) -> dict[str, int]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    vocab = PipelineConfig(field_labels=DEFAULT_FIELD_LABELS).vocabulary() or {}
    rich = 0
    voc = 0
    free = 0
    for d, txt, lang in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        doc = synth.derive_doc(int(d), txt or "", lang or "")
        rich = (rich + row_digest(doc["doc_id"], oracle.rich_fields_document(doc))) % DIGEST_MOD
        voc = (voc + row_digest(doc["doc_id"], oracle.vocab_fields_document(doc, vocab))) % DIGEST_MOD
        free = (free + row_digest(doc["doc_id"], oracle.free_text_document(doc))) % DIGEST_MOD
    return {
        "rich_fields_digest": rich,
        "vocab_fields_digest": voc,
        "free_text_digest": free,
    }


if __name__ == "__main__":
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        print(sf_dir, oracle_digests(sf_dir))
        print(sf_dir, dedup_oracle_digests(sf_dir))
        print(sf_dir, tuple_digest_oracles(sf_dir))

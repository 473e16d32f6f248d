"""Cluster topic terms: c-TF-IDF over embedding k-means clusters (the
BERTopic-style corpus-cartography step of a curation pipeline — "what IS in
each semantic cluster", used to name clusters before up/down-sampling them
in a training mix).

Composition of two existing engine layers:

1. `ann.embedding_kmeans` assigns every vector a cluster (bit-deterministic
   quantized-integer k-means, the `kmeans_digest` contract);
2. cluster labels attach to document text through ONE id-bucket hash join
   (the `joins.py` union+groupby pattern — assignments are corpus-sized, so
   no broadcast);
3. one tokenize pass emits per-batch (token, cluster) partials carrying
   both tf and doc counts (a doc has exactly ONE cluster, so the token's
   corpus df is the sum of its per-cluster doc counts — df needs no second
   shuffle);
4. a crc32 token-bucket groupby folds global tf/df, scores
   ``tf_{t,c} · round_even(ln(N/df_t)·2^40)`` (exact int64 — the
   quantized-ln trick), and prunes to each cluster's in-bucket top-T;
5. the driver ranks the ≤ clusters × T × buckets survivors (constant-size).

Correctness gate: pinned digest (k-means is not SQL-expressible) re-derived
every pytest run from the independent sequential oracle
(`oracle_dedup.cluster_topic_rows`).  All ties break on exact integers
(score DESC, token ASC); the only float is the shared ``np.log`` bits both
sides quantize identically.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.tables import sf_table
from .ann import embedding_kmeans

LN_Q = float(1 << 40)
TOPIC_CLUSTERS = 8
TOPIC_ITERS = 5
TOPIC_TOP_TERMS = 5


def cluster_topics(
    sf_dir: str,
    *,
    k_clusters: int = TOPIC_CLUSTERS,
    iters: int = TOPIC_ITERS,
    top_terms: int = TOPIC_TOP_TERMS,
    num_buckets: int = 16,
) -> pa.Table:
    """(cluster, rank, token, tf, df, score_q) — each cluster's top-T tokens
    by c-TF-IDF, rank 1..T by (score_q DESC, token ASC), sorted by
    (cluster, rank).  N = clustered docs (docs joined to a vector)."""
    asn = embedding_kmeans(sf_dir, k=k_clusters, iters=iters)
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def asn_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    ids.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "id": ids,
                "cluster": batch.column("cluster").cast(pa.int32()),
                "text": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    ids.to_numpy(zero_copy_only=False) % num_buckets
                ).cast(pa.int32()),
                "id": ids,
                "cluster": pa.nulls(batch.num_rows, pa.int32()),
                "text": batch.column("text"),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        lab = df[df["cluster"].notna()][["id", "cluster"]]
        txt = df[df["cluster"].isna()][["id", "text"]]
        j = txt.merge(lab, on="id", how="inner")
        out = pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": j["id"].astype("int64"),
                    "cluster": j["cluster"].astype("int64"),
                    "text": j["text"].astype("object"),
                }
            ),
            preserve_index=False,
        )
        return out.replace_schema_metadata(None)

    joined = (
        asn.map_batches(asn_side, batch_format="pyarrow")
        .union(docs.map_batches(doc_side, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    ).materialize()
    n_docs = joined.count()

    def partials(batch: pa.Table) -> pa.Table:
        from .textstats import doc_token_counts_batch

        rows, codes, cnt, dic = doc_token_counts_batch(
            batch.column("text").to_pylist()
        )
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int32()),
                "token": pa.array([], pa.string()),
                "cluster": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "nd": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        clu = batch.column("cluster").to_numpy(zero_copy_only=False).astype("int64")
        # fold distinct (doc, token) rows to (token, cluster) partials:
        # tf = sum of in-doc counts, nd = number of docs (df partial)
        key = codes * (clu.max() + 1) + clu[rows]
        order = np.argsort(key, kind="stable")
        sk = key[order]
        cuts = np.nonzero(np.diff(sk))[0] + 1
        starts = np.concatenate([[0], cuts]).astype(np.int64)
        tf = np.add.reduceat(cnt[order], starts)
        nd = np.add.reduceat(np.ones(len(rows), np.int64), starts)
        ucode = codes[order][starts]
        uclu = clu[rows][order][starts]
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int32,
            count=len(dic),
        )
        return pa.table(
            {
                "tbkt": pa.array(crc[ucode]),
                "token": pa.array(dic.take(pa.array(ucode))),
                "cluster": pa.array(uclu),
                "tf": pa.array(tf),
                "nd": pa.array(nd),
            }
        )

    def bucket_score(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        g = df.groupby(["token", "cluster"], sort=False).agg(
            tf=("tf", "sum"), nd=("nd", "sum")
        )
        g = g.reset_index()
        dft = g.groupby("token")["nd"].transform("sum")
        idf_q = np.round(
            np.log(float(n_docs) / dft.to_numpy().astype(np.float64)) * LN_Q
        ).astype(np.int64)
        g = g.assign(df=dft.astype("int64"), score_q=g["tf"].to_numpy() * idf_q)
        # in-bucket per-cluster top-T prune by (score DESC, token ASC)
        g = g.sort_values(
            ["cluster", "score_q", "token"], ascending=[True, False, True]
        )
        g = g.groupby("cluster", sort=False).head(
            # rank later; keep T per cluster per bucket
            TOPIC_TOP_TERMS if top_terms is None else top_terms
        )
        out = g[["cluster", "token", "tf", "df", "score_q"]].astype(
            {"cluster": "int64", "tf": "int64", "df": "int64", "score_q": "int64"}
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    survivors = (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(bucket_score, batch_format="pyarrow")
        .take_all()
    )  # <= clusters x top_terms x buckets rows: constant-size at any corpus
    rows = sorted(
        ((r["cluster"], -r["score_q"], r["token"], r["tf"], r["df"]) for r in survivors)
    )
    out = {"cluster": [], "rank": [], "token": [], "tf": [], "df": [], "score_q": []}
    last, rk = None, 0
    for c, negs, tok, tf, dfv in rows:
        rk = rk + 1 if c == last else 1
        last = c
        if rk > top_terms:
            continue
        out["cluster"].append(c)
        out["rank"].append(rk)
        out["token"].append(tok)
        out["tf"].append(tf)
        out["df"].append(dfv)
        out["score_q"].append(-negs)
    return pa.table(
        {
            "cluster": pa.array(out["cluster"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "token": pa.array(out["token"], pa.string()),
            "tf": pa.array(out["tf"], pa.int64()),
            "df": pa.array(out["df"], pa.int64()),
            "score_q": pa.array(out["score_q"], pa.int64()),
        }
    )


def topics_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `cluster_topics` (pinned literal from the
    independent `oracle_dedup.cluster_topic_rows`; integer surface, ties
    broken on exact ints — see module docstring)."""
    from .interpret import DIGEST_MOD, row_digest

    t = cluster_topics(sf_dir, **kwargs)
    s = 0
    for c, rk, tok, tf, dfv, sq in zip(
        t.column("cluster").to_pylist(),
        t.column("rank").to_pylist(),
        t.column("token").to_pylist(),
        t.column("tf").to_pylist(),
        t.column("df").to_pylist(),
        t.column("score_q").to_pylist(),
    ):
        s = (s + row_digest(str(c), f"{rk}:{tok}:{tf}:{dfv}:{sq}")) % DIGEST_MOD
    return pa.table({"digest": pa.array([s], pa.int64())})

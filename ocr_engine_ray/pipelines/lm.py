"""N-gram language-model scoring over the ``documents`` table.

Perplexity-style LM filtering is a standard web-corpus curation step (CCNet,
Wenzek et al. 2020, trains a 5-gram KenLM and buckets documents by
perplexity; Gopher/RefinedWeb apply the same shape).  This module implements
the distributed version with a self-trained add-one-smoothed bigram model:

    score(doc) = sum over adjacent token pairs of ln P(w2 | w1)
    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,*) + V)

Everything is count arithmetic except the ``ln`` — and each distinct
(w1, w2) term is quantized ONCE to ``round_even(ln(p) * 2^40)`` int64, so
per-doc scores are EXACT integer sums (order-free, batch-independent) and
the DuckDB twin reproduces them bit-for-bit (DuckDB ``ln`` and numpy
``log`` are the same libm call — the tfidf wholesale-float contract — and
the 2^40 scale is a power of two, so the quantization grid is identical).

Scale shape — the model is never materialized on the driver:

1. one vocabulary pass for V (exact distinct tokens; at 10^12 docs this
   becomes the HLL estimate — the smoothing denominator tolerates it);
2. one corpus pass explodes per-(doc, w1, w2) bigram multiplicities keyed
   by ``crc32(w1) % num_buckets`` — every bigram of a given context lands
   in one bucket, so the bucket computes c(w1,w2), c(w1,*) AND each doc's
   bucket-local quantized log-prob partial in the same group (the
   `token_rarity_score` pattern: counts and contributions co-located, no
   vocabulary broadcast, no join infrastructure);
3. a doc_id groupby sums the <= num_buckets partials per doc.

A pathologically hot context (one w1 owning most bigrams) concentrates its
bucket; at web scale that bucket splits into a two-level combine keyed by
(w1, w2-range) — same trick as the salted hot keys in the joins module.
Documents with fewer than two tokens produce no row (no bigrams), matching
the SQL twin.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from ..sources.tables import sf_table
from .textstats import _token_occurrences

LM_Q = float(1 << 40)  # fixed-point quantum for the per-term ln values


def _vocab_size(ds: rd.Dataset) -> int:
    """Exact distinct-token count (the smoothing denominator V)."""

    def distinct_tokens(batch: pa.Table) -> pa.Table:
        _, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        return pa.table({"token": dic if len(codes) else dic[:0]})

    return (
        ds.map_batches(distinct_tokens, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="_n"))
        .count()
    )


def bucket_score_kernel(group: pa.Table, *, vocab_v: int) -> pa.Table:
    """Per-bucket LM scoring kernel (module-level so the naive-reference
    property test exercises the REAL code): distinct-pair counts, context
    totals, quantized ln terms and per-doc partials in one vectorized
    pass over a w1-bucket group."""
    docs = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    cs = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
    # id-encode w1/w2 separately via Arrow dictionary_encode (C++ hashing —
    # np.unique over object arrays was the measured kernel hotspot at 1M
    # docs); the pair key is an integer composite (a string join key would
    # be ambiguous: tokens may contain any non-whitespace byte, including a
    # would-be separator).  Only count totals per id matter, so the
    # first-occurrence code order is as good as np.unique's sorted order.
    w1enc = pc.dictionary_encode(group.column("w1").combine_chunks())
    w2enc = pc.dictionary_encode(group.column("w2").combine_chunks())
    iw1 = np.asarray(w1enc.indices, dtype=np.int64)
    iw2 = np.asarray(w2enc.indices, dtype=np.int64)
    n1 = len(w1enc.dictionary)
    n2 = len(w2enc.dictionary)
    pkey = iw1 * max(n2, 1) + iw2
    order = np.argsort(pkey, kind="stable")
    sp = pkey[order]
    new = (
        np.concatenate([[True], sp[1:] != sp[:-1]])
        if len(sp)
        else np.array([], bool)
    )
    pid_sorted = np.cumsum(new) - 1
    pid = np.empty(len(pkey), dtype=np.int64)
    pid[order] = pid_sorted
    starts = np.nonzero(new)[0]
    c12 = np.add.reduceat(cs[order], starts)  # per distinct pair, pid order
    # context totals c(w1,*): sum c12 over pairs sharing w1
    ctx_of_pair = (sp[starts] // max(n2, 1)).astype(np.int64)
    c1 = np.zeros(n1, dtype=np.int64)
    np.add.at(c1, ctx_of_pair, c12)
    # quantized term per distinct pair: round_even(ln((c12+1)/(c1+V))*2^40)
    q = np.round(
        np.log((c12 + 1.0) / (c1[ctx_of_pair] + float(vocab_v))) * LM_Q
    ).astype(np.int64)
    contrib = cs * q[pid]
    # per-doc bucket partials
    dorder = np.argsort(docs, kind="stable")
    sd = docs[dorder]
    cuts = np.nonzero(np.diff(sd))[0] + 1
    dstarts = (
        np.concatenate([[0], cuts]).astype(np.int64)
        if len(sd)
        else np.array([], np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(sd[dstarts] if len(sd) else sd),
            "logprob_q": pa.array(
                np.add.reduceat(contrib[dorder], dstarts)
                if len(sd)
                else contrib
            ),
            "n_bigrams": pa.array(
                np.add.reduceat(cs[dorder], dstarts) if len(sd) else cs
            ),
        }
    )

def _score_dataset(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """(doc_id, n_bigrams, logprob_q, avg_logprob), UNSORTED — the shared
    core of `bigram_logprob_score` and `perplexity_buckets`."""
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    vocab_v = _vocab_size(ds)

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int32()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(rows) < 2:
            return empty
        adj = rows[1:] == rows[:-1]  # consecutive occurrences in the same doc
        if not adj.any():
            return empty
        w1c = codes[:-1][adj]
        w2c = codes[1:][adj]
        drow = rows[:-1][adj]
        # compress per-(doc, w1, w2) multiplicities before the shuffle
        nd = len(dic)
        key = (drow.astype(np.int64) * nd + w1c) * nd + w2c
        ukey, cnt = np.unique(key, return_counts=True)
        uw2 = (ukey % nd).astype(np.int64)
        uw1 = ((ukey // nd) % nd).astype(np.int64)
        urow = (ukey // (nd * nd)).astype(np.int64)
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int32,
            count=nd,
        )
        return pa.table(
            {
                "bkt": pa.array(crc[uw1]),
                "w1": pc.take(dic, pa.array(uw1)),
                "w2": pc.take(dic, pa.array(uw2)),
                "doc_id": pa.array(dids[urow], pa.int64()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = (
        # explicit batch_size bounds the (doc, w1, w2) composite key at
        # B * nd^2 (nd = distinct tokens per batch) well inside int64
        ds.map_batches(explode_bigrams, batch_format="pyarrow", batch_size=4096)
        .groupby("bkt")
        .map_groups(
            lambda g: bucket_score_kernel(g, vocab_v=vocab_v),
            batch_format="pyarrow",
        )
    )

    # Per-doc fold: exact int sums via the shared hash-bucket reduceat
    # fold (fold.py — groupby("doc_id").aggregate(Sum) measured 13.1 s vs
    # 0.3 s for 2M partials at 100k docs, identical results)
    from .fold import fold_int_sums_by_key

    agg = fold_int_sums_by_key(partials, cols=["logprob_q", "n_bigrams"])

    def finish(batch: pa.Table) -> pa.Table:
        lq = batch.column("logprob_q").combine_chunks().to_numpy(zero_copy_only=False)
        nb = batch.column("n_bigrams").combine_chunks().to_numpy(zero_copy_only=False)
        # int64 -> float64 conversion and the two divides are single IEEE
        # operations (exact-same in DuckDB); round half-to-even == round_even
        avg = [round(float(a) / float(b) / LM_Q, 6) for a, b in zip(lq, nb)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": batch.column("n_bigrams").cast(pa.int64()),
                "logprob_q": batch.column("logprob_q").cast(pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def bigram_logprob_score(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Per-doc add-one-smoothed bigram log-probability (LM quality signal).

    Returns (doc_id, n_bigrams, logprob_q, avg_logprob) sorted by doc_id,
    where ``logprob_q`` is the exact integer sum of 2^-40-quantized
    ln-probability terms and ``avg_logprob`` its rounded float surface.
    """
    return _score_dataset(sf_dir, num_buckets=num_buckets).sort("doc_id")


PPL_RANK_BUCKETS = 64
PPL_RANGE = 20.0  # |avg ln p| support for the order-preserving rank buckets


def perplexity_buckets(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """CCNet head/middle/tail split: rank every doc within its source by
    LM score (best = most probable text first) and label the top / middle /
    bottom thirds — the bucketing CCNet (Wenzek et al. 2020) uses to select
    training data by LM perplexity.

    Scale shape: the scores come from `_score_dataset` (one bucketed
    shuffle), sources attach via ONE hash-partitioned `Dataset.join` on
    doc_id (both sides narrow projections), and the per-source rank is the
    same two-pass prefix-sum as `rank_by_quality` — per-(source, scorebucket)
    counts give exclusive offsets, each bucket sorts locally; no global
    sort, no corpus on the driver.  Docs with fewer than two tokens carry
    no score and are absent (as in the SQL twin).

    Returns (doc_id, source, avg_logprob, rank_in_source, ppl_bucket)
    sorted by doc_id.
    """
    scores = _score_dataset(sf_dir, num_buckets=num_buckets)
    srcs = sf_table(sf_dir, "documents", columns=["doc_id", "source"])
    joined = scores.join(
        srcs,
        join_type="inner",
        num_partitions=16,
        on=("doc_id",),
        validate_schemas=True,
    )

    def keyed(batch: pa.Table) -> pa.Table:
        avg = batch.column("avg_logprob").combine_chunks().to_numpy(zero_copy_only=False)
        # order-preserving coarse key for DESCENDING avg_logprob: -avg is
        # ascending; clip to the [0, PPL_RANGE) support
        bkt = np.clip(
            (-avg * (PPL_RANK_BUCKETS / PPL_RANGE)).astype(np.int64),
            0,
            PPL_RANK_BUCKETS - 1,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "avg_logprob": batch.column("avg_logprob"),
                "rbkt": pa.array(bkt),
            }
        )

    keyed_ds = joined.map_batches(keyed, batch_format="pyarrow").materialize()
    parts = (
        keyed_ds.groupby(["source", "rbkt"]).aggregate(Count(alias_name="n")).take_all()
    )
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["source"], r["rbkt"])):
        offsets[(r["source"], r["rbkt"])] = totals.get(r["source"], 0)
        totals[r["source"]] = totals.get(r["source"], 0) + r["n"]
    import ray

    ref = ray.put((offsets, totals))

    def rank(group: pa.Table) -> pa.Table:
        offs, tots = ray.get(ref)
        ids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        avg = group.column("avg_logprob").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -avg))  # avg DESC, doc_id ASC
        src = group.column("source")[0].as_py()
        base = offs[(src, group.column("rbkt")[0].as_py())]
        n = tots[src]
        rk = np.empty(len(ids), dtype=np.int64)
        rk[order] = base + np.arange(1, len(ids) + 1)
        third = 3 * (rk - 1)
        label = np.where(third < n, "head", np.where(third < 2 * n, "middle", "tail"))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": pa.array(np.full(len(ids), src, dtype=object), pa.string()),
                "avg_logprob": pa.array(avg),
                "rank_in_source": pa.array(rk),
                "ppl_bucket": pa.array(label.astype(object), pa.string()),
            }
        )

    return (
        keyed_ds.groupby(["source", "rbkt"])
        .map_groups(rank, batch_format="pyarrow")
        .sort("doc_id")
    )


# --- interpolated Kneser-Ney ------------------------------------------------
KN_DISCOUNT = 0.75


def kneser_ney_score(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Per-doc INTERPOLATED KNESER-NEY bigram log-probability (Kneser &
    Ney 1995; the smoothing KenLM ships and CCNet's perplexity filter
    actually runs) — the continuation-count upgrade of the add-one model
    in `bigram_logprob_score`:

        P(w2|w1) = (c(w1,w2) − d)/c(w1,·)
                   + (d·N1+(w1,·)/c(w1,·)) · (N1+(·,w2)/N1+(·,·))

    with d = 0.75.  Every scored pair occurs in the corpus (c ≥ 1), so
    the max(·,0) clamp never binds.  Each distinct (w1, w2) term is ONE
    float64 expression in the twin's operand order, quantized
    ``round_even(ln(P)·2^40)``, so per-doc scores are exact integer sums.

    Scale shape — TWO token-keyed shuffles, mirroring the two marginals
    the model needs (the model never sits on the driver):

    1. ``crc(w2)`` bucket pass: a word's continuation count N1+(·,w2)
       (distinct left contexts) is bucket-local; it attaches to every
       (doc, w1, w2) row in place, and B bucket partials fold to the
       global N1+(·,·) scalar on the driver;
    2. ``crc(w1)`` bucket pass: context totals c(w1,·) and fan-outs
       N1+(w1,·) are bucket-local; the quantized term and per-doc
       partials fall out in the same kernel (the `bucket_score_kernel`
       shape);
    3. the shared per-doc integer fold.

    Returns (doc_id, n_bigrams, logprob_q, avg_logprob) sorted by doc_id
    — the same surface as `bigram_logprob_score`, so the two models
    compare doc-for-doc.
    """
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_bigrams_w2(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int32()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(rows) < 2:
            return empty
        adj = rows[1:] == rows[:-1]
        if not adj.any():
            return empty
        w1c = codes[:-1][adj]
        w2c = codes[1:][adj]
        drow = rows[:-1][adj]
        nd = len(dic)
        key = (drow.astype(np.int64) * nd + w1c) * nd + w2c
        ukey, cnt = np.unique(key, return_counts=True)
        uw2 = (ukey % nd).astype(np.int64)
        uw1 = ((ukey // nd) % nd).astype(np.int64)
        urow = (ukey // (nd * nd)).astype(np.int64)
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int32,
            count=nd,
        )
        return pa.table(
            {
                "bkt": pa.array(crc[uw2]),  # keyed by the RIGHT word
                "w1": pc.take(dic, pa.array(uw1)),
                "w2": pc.take(dic, pa.array(uw2)),
                "doc_id": pa.array(dids[urow], pa.int64()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def cont_kernel(group: pa.Table) -> pa.Table:
        """Attach N1+(·,w2) to every row; emit the bucket's distinct-pair
        total as ONE side row (kind=1, in the n_cont column)."""
        w1enc = pc.dictionary_encode(group.column("w1").combine_chunks())
        w2enc = pc.dictionary_encode(group.column("w2").combine_chunks())
        iw1 = np.asarray(w1enc.indices, dtype=np.int64)
        iw2 = np.asarray(w2enc.indices, dtype=np.int64)
        n1 = max(len(w1enc.dictionary), 1)
        pkey = iw2 * n1 + iw1
        upair = np.unique(pkey)
        n2 = max(len(w2enc.dictionary), 1)
        nc = np.bincount((upair // n1).astype(np.int64), minlength=n2).astype(np.int64)
        w1bkt = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in w1enc.dictionary.to_pylist()),
            dtype=np.int32,
            count=len(w1enc.dictionary),
        )
        kind0 = pa.table(
            {
                "kind": pa.array(np.zeros(group.num_rows, np.int64)),
                "bkt": pa.array(w1bkt[iw1]),
                "w1": group.column("w1"),
                "w2": group.column("w2"),
                "doc_id": group.column("doc_id"),
                "c": group.column("c"),
                "n_cont": pa.array(nc[iw2]),
            }
        )
        side = pa.table(
            {
                "kind": pa.array([1], pa.int64()),
                "bkt": pa.array([0], pa.int32()),
                "w1": pa.array([""], pa.string()),
                "w2": pa.array([""], pa.string()),
                "doc_id": pa.array([0], pa.int64()),
                "c": pa.array([0], pa.int64()),
                "n_cont": pa.array([len(upair)], pa.int64()),
            }
        )
        return pa.concat_tables([kind0, side])

    tagged = (
        ds.map_batches(explode_bigrams_w2, batch_format="pyarrow", batch_size=4096)
        .groupby("bkt")
        .map_groups(cont_kernel, batch_format="pyarrow")
        .materialize()
    )
    n_pairs_total = sum(
        r["n_cont"] for r in tagged.filter(expr="kind == 1").take_all()
    )

    def kn_kernel(group: pa.Table) -> pa.Table:
        g = group.filter(pc.equal(group.column("kind"), 0))
        if not g.num_rows:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logprob_q": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                }
            )
        docs = g.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        cs = g.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        ncont = g.column("n_cont").combine_chunks().to_numpy(zero_copy_only=False)
        w1enc = pc.dictionary_encode(g.column("w1").combine_chunks())
        w2enc = pc.dictionary_encode(g.column("w2").combine_chunks())
        iw1 = np.asarray(w1enc.indices, dtype=np.int64)
        iw2 = np.asarray(w2enc.indices, dtype=np.int64)
        n1 = len(w1enc.dictionary)
        n2 = max(len(w2enc.dictionary), 1)
        pkey = iw1 * n2 + iw2
        order = np.argsort(pkey, kind="stable")
        sp = pkey[order]
        new = np.concatenate([[True], sp[1:] != sp[:-1]])
        pid_sorted = np.cumsum(new) - 1
        pid = np.empty(len(pkey), dtype=np.int64)
        pid[order] = pid_sorted
        starts = np.nonzero(new)[0]
        c12 = np.add.reduceat(cs[order], starts)
        nc12 = ncont[order][starts]  # same value on every row of a pair
        ctx_of_pair = (sp[starts] // n2).astype(np.int64)
        c1 = np.zeros(n1, dtype=np.int64)
        np.add.at(c1, ctx_of_pair, c12)
        n1p = np.bincount(ctx_of_pair, minlength=n1).astype(np.int64)
        c1f = c1[ctx_of_pair].astype(np.float64)
        # the twin's operand order exactly:
        p = (c12 - KN_DISCOUNT) / c1f + ((KN_DISCOUNT * n1p[ctx_of_pair]) / c1f) * (
            nc12 / float(n_pairs_total)
        )
        q = np.round(np.log(p) * LM_Q).astype(np.int64)
        contrib = cs * q[pid]
        dorder = np.argsort(docs, kind="stable")
        sd = docs[dorder]
        cuts = np.nonzero(np.diff(sd))[0] + 1
        dstarts = np.concatenate([[0], cuts]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(sd[dstarts]),
                "logprob_q": pa.array(np.add.reduceat(contrib[dorder], dstarts)),
                "n_bigrams": pa.array(np.add.reduceat(cs[dorder], dstarts)),
            }
        )

    partials = (
        tagged.groupby("bkt").map_groups(kn_kernel, batch_format="pyarrow")
    )
    from .fold import fold_int_sums_by_key

    agg = fold_int_sums_by_key(partials, cols=["logprob_q", "n_bigrams"])

    def finish(batch: pa.Table) -> pa.Table:
        lq = batch.column("logprob_q").combine_chunks().to_numpy(zero_copy_only=False)
        nb = batch.column("n_bigrams").combine_chunks().to_numpy(zero_copy_only=False)
        avg = [round(float(a) / float(b) / LM_Q, 6) for a, b in zip(lq, nb)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": batch.column("n_bigrams").cast(pa.int64()),
                "logprob_q": batch.column("logprob_q").cast(pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def lm_model_compare(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Model-selection report for the two self-trained bigram LMs: per
    SOURCE, the exact summed log-probabilities of the add-one and
    Kneser-Ney models over the same bigrams — the held-in comparison
    that justifies shipping KN for perplexity filtering (CCNet's choice)
    with numbers instead of citations.

    ALL integer: both scorers emit exact q40 sums per doc; sources
    attach via ONE hash-partitioned join each (the `perplexity_buckets`
    seam); per-source folds are integer adds, and the verdict columns
    are floor divisions — kn_gain_q40_per_bigram = (Σkn − Σadd1) //
    Σbigrams (positive = KN assigns more probability).  Twin: both
    model twins' CTEs joined and re-grouped by source.  Returns
    (source, n_docs, n_bigrams, logprob_q_add1, logprob_q_kn,
    kn_gain_q40_per_bigram) sorted by source.
    """
    add1 = _score_dataset(sf_dir, num_buckets=num_buckets)
    kn = kneser_ney_score(sf_dir, num_buckets=num_buckets)
    srcs = sf_table(sf_dir, "documents", columns=["doc_id", "source"])
    B = num_buckets

    # tagged union + ONE doc-bucket merge (Dataset.join chains stall at
    # low parallelism — the joins-module union discipline instead)
    def tag_scores(kind: int):
        def prep(batch: pa.Table) -> pa.Table:
            did = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "dbkt": pa.array((did % B).astype(np.int64)),
                    "doc_id": pa.array(did.astype(np.int64)),
                    "kind": pa.array(np.full(len(did), kind, np.int64)),
                    "q": batch.column("logprob_q").cast(pa.int64()),
                    "nb": batch.column("n_bigrams").cast(pa.int64()),
                    "source": pa.array([""] * len(did), pa.string()),
                }
            )

        return prep

    def tag_src(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dbkt": pa.array((did % B).astype(np.int64)),
                "doc_id": pa.array(did.astype(np.int64)),
                "kind": pa.array(np.full(len(did), 2, np.int64)),
                "q": pa.array(np.zeros(len(did), np.int64)),
                "nb": pa.array(np.zeros(len(did), np.int64)),
                "source": batch.column("source"),
            }
        )

    def partials(group: pa.Table) -> pa.Table:
        did = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        q = group.column("q").combine_chunks().to_numpy(zero_copy_only=False)
        nb = group.column("nb").combine_chunks().to_numpy(zero_copy_only=False)
        src = group.column("source").to_pylist()
        a_ix = np.nonzero(kind == 0)[0]
        k_ix = np.nonzero(kind == 1)[0]
        s_ix = np.nonzero(kind == 2)[0]
        # docs scored by BOTH models (identical doc sets by construction)
        a_order = a_ix[np.argsort(did[a_ix])]
        k_order = k_ix[np.argsort(did[k_ix])]
        if len(a_order) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "sa": pa.array([], pa.string()),
                    "sk": pa.array([], pa.string()),
                    "nb": pa.array([], pa.string()),
                }
            )
        if not np.array_equal(did[a_order], did[k_order]):
            raise ValueError("add-one and KN scored different doc sets")
        s_sorted = s_ix[np.argsort(did[s_ix])]
        pos = np.searchsorted(did[s_sorted], did[a_order])
        src_of = [src[s_sorted[p]] for p in pos]
        acc: dict[str, list[int]] = {}
        for sc, ai, ki in zip(src_of, a_order, k_order):
            a = acc.setdefault(sc, [0, 0, 0, 0])
            a[0] += 1
            a[1] += int(q[ai])
            a[2] += int(q[ki])
            a[3] += int(nb[ai])
        keys = sorted(acc)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([acc[s][0] for s in keys], pa.int64()),
                "sa": pa.array([str(acc[s][1]) for s in keys], pa.string()),
                "sk": pa.array([str(acc[s][2]) for s in keys], pa.string()),
                "nb": pa.array([str(acc[s][3]) for s in keys], pa.string()),
            }
        )

    joined = (
        add1.map_batches(tag_scores(0), batch_format="pyarrow")
        .union(kn.map_batches(tag_scores(1), batch_format="pyarrow"))
        .union(srcs.map_batches(tag_src, batch_format="pyarrow"))
        .groupby("dbkt")
        .map_groups(partials, batch_format="pyarrow")
    )

    rows = joined.take_all()
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["source"], [0, 0, 0, 0])
        a[0] += r["n_docs"]
        a[1] += int(r["sa"])
        a[2] += int(r["sk"])
        a[3] += int(r["nb"])
    srcs_sorted = sorted(acc)

    def tdiv(n: int, d: int) -> int:
        # DuckDB's integer // truncates toward zero (−7//2 = −3);
        # Python's floors — match the twin explicitly
        return abs(n) // d * (1 if n >= 0 else -1)

    gain = [
        tdiv(acc[s][2] - acc[s][1], acc[s][3]) if acc[s][3] else 0
        for s in srcs_sorted
    ]
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs_sorted, pa.string()),
                "n_docs": pa.array([acc[s][0] for s in srcs_sorted], pa.int64()),
                "n_bigrams": pa.array([acc[s][3] for s in srcs_sorted], pa.int64()),
                "logprob_q_add1": pa.array([acc[s][1] for s in srcs_sorted], pa.int64()),
                "logprob_q_kn": pa.array([acc[s][2] for s in srcs_sorted], pa.int64()),
                "kn_gain_q40_per_bigram": pa.array(gain, pa.int64()),
            }
        )
    )

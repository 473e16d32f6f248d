"""Inverted index build + positional phrase search over the corpus.

The retrieval side of a training-data engine (exact-match decontamination
audits, attribution queries "which documents contain this quote", corpus
conditioning): build a token -> (doc_id, position) postings table once,
hash-partitioned by token so a query touches only its tokens' shards, and
answer phrase queries either from the index (``search_index``) or with a
single streaming corpus scan (``phrase_search`` — the gated surface, exact
against a zipped-unnest self-join SQL twin).

Scale shape:

- **build**: one corpus pass tokenizes each batch with the shared Arrow
  explode primitive (`functions.tokenize.explode_tokens` — positions fall
  out of the row-major order for free), then ONE ``crc32(token) % B``
  bucket shuffle co-locates each token's postings; the sink is
  hive-partitioned parquet (``bucket=<b>/``), so the index is resumable
  per-bucket and a reader prunes at the directory level.
- **search**: only the phrase tokens' bucket directories are read (<=
  len(phrase) of B shards); each posting row fans out to the phrase slots
  it could anchor (``start = pos - j``), and a doc-bucket groupby counts
  starts covered by ALL slots — candidate rows are postings of the phrase
  tokens only, never the corpus.
- **scan**: phrase occurrence counting is batch-local (a document lives in
  one row), so the gated query is a shuffle-free map + sort.

Positions are 1-based over the RE2 ``\\S+`` token sequence — identical to
the SQL twin's ``unnest(regexp_extract_all(text, '\\S+'))`` zipped with
``unnest(range(1, len+1))`` (the established zipped-unnest convention).
"""

from __future__ import annotations

import glob
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tokenize import WS_SPLIT, explode_tokens
from ..sources.tables import sf_table


def _postings_batch(batch: pa.Table) -> pa.Table:
    """(token, doc_id, pos) occurrence rows of one batch; pos is 1-based
    within each document's token sequence."""
    texts = batch.column("text").to_pylist()
    rows, codes, dic = explode_tokens(texts, pattern=WS_SPLIT, lower=False)
    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
    if not len(rows):
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
    # rows is ascending (row-major explode): per-row 1-based positions
    new = np.concatenate([[True], rows[1:] != rows[:-1]])
    starts = np.nonzero(new)[0]
    pos = np.arange(len(rows), dtype=np.int64) - starts[np.cumsum(new) - 1] + 1
    return pa.table(
        {
            "token": pc.take(dic, pa.array(codes)),
            "doc_id": pa.array(did[rows]),
            "pos": pa.array(pos),
        }
    )


def _token_bucket(tokens: pa.Array, num_buckets: int) -> np.ndarray:
    """crc32(token) % B — computed once per DISTINCT token via the
    dictionary, and recomputable by a reader from the token alone."""
    enc = pc.dictionary_encode(tokens.combine_chunks())
    per_tok = np.array(
        [zlib.crc32(t.encode("utf-8")) % num_buckets for t in enc.dictionary.to_pylist()],
        dtype=np.int32,
    )
    if not len(per_tok):
        return np.empty(0, np.int32)
    return per_tok[np.asarray(enc.indices, dtype=np.int64)]


def build_inverted_index(
    sf_dir: str, out_dir: str, *, num_buckets: int = 32
) -> str:
    """Materialize the positional inverted index as hive-partitioned parquet
    (``out_dir/bucket=<b>/*.parquet``).  Returns ``out_dir``."""
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def with_bucket(batch: pa.Table) -> pa.Table:
        post = _postings_batch(batch)
        return post.append_column(
            "bucket", pa.array(_token_bucket(post.column("token"), num_buckets))
        )

    (
        # sort co-locates each bucket's postings (range partition — the
        # keyed repartition needs the opt-in HASH_SHUFFLE DataContext),
        # so the hive write emits contiguous per-bucket files instead of
        # blocks x buckets fragments
        ds.map_batches(with_bucket, batch_format="pyarrow")
        .sort("bucket")
        .write_parquet(out_dir, partition_cols=["bucket"])
    )
    return out_dir


def search_index(
    index_dir: str, phrase: str, *, num_buckets: int = 32
) -> pa.Table:
    """Phrase occurrence counts per document from a built index:
    (doc_id, n_matches) for every document containing the exact consecutive
    token sequence, sorted by doc_id.  Reads ONLY the phrase tokens'
    bucket partitions."""
    words = [w for w in phrase.split() if w]
    if not words:
        raise ValueError("empty phrase")
    k = len(words)
    need = sorted({zlib.crc32(w.encode("utf-8")) % num_buckets for w in words})
    files = [
        f
        for b in need
        for f in sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    if not files:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_matches": pa.array([], pa.int64())}
        )
    ds = rd.read_parquet(files, columns=["token", "doc_id", "pos"])
    wset = sorted(set(words))

    def anchors(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("token"), pa.array(wset)))
        tok = batch.column("token")
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
        pos = batch.column("pos").to_numpy(zero_copy_only=False).astype("int64")
        out_d, out_s, out_j = [], [], []
        for j in range(k):
            sel = np.asarray(pc.equal(tok, words[j]), dtype=bool)
            if sel.any():
                st = pos[sel] - j
                ok = st >= 1
                out_d.append(did[sel][ok])
                out_s.append(st[ok])
                out_j.append(np.full(int(ok.sum()), j, dtype=np.int64))
        if not out_d:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d)),
                "start": pa.array(np.concatenate(out_s)),
                "j": pa.array(np.concatenate(out_j)),
            }
        )

    def count_full(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        per_start = df.groupby(["doc_id", "start"], sort=False)["j"].size()
        full = per_start[per_start == k]
        if full.empty:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_matches": pa.array([], pa.int64()),
                }
            )
        out = (
            full.reset_index()
            .groupby("doc_id")
            .size()
            .reset_index(name="n_matches")
            .astype({"doc_id": "int64", "n_matches": "int64"})
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def dbkt(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
        return batch.append_column("_dbkt", pa.array((did % 64).astype(np.int32)))

    res = (
        ds.map_batches(anchors, batch_format="pyarrow")
        .map_batches(dbkt, batch_format="pyarrow")
        .groupby("_dbkt")
        .map_groups(count_full, batch_format="pyarrow")
        .sort("doc_id")
        .take_all()
    )
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in res], pa.int64()),
            "n_matches": pa.array([r["n_matches"] for r in res], pa.int64()),
        }
    )


def phrase_search(
    sf_dir: str, *, phrase: str = "sort query"
) -> rd.Dataset:
    """Gated surface: per-document occurrence counts of the exact
    consecutive token phrase, by direct corpus scan — (doc_id, n_matches)
    with n_matches >= 1, sorted by doc_id.  Occurrences may overlap (every
    start position counts), exactly like the twin's positional self-join.

    Shuffle-free: a document's token sequence is local to its batch row, so
    counting is one vectorized window-compare per batch (token codes from
    the batch dictionary; adjacency in the row-major explode IS positional
    adjacency), followed by a tiny sort of matching docs only.
    """
    words = [w for w in phrase.split() if w]
    if not words:
        raise ValueError("empty phrase")
    k = len(words)

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        rows, codes, dic = explode_tokens(texts, pattern=WS_SPLIT, lower=False)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
        n = len(rows)
        if n < k:
            return empty
        # phrase words -> this batch's dictionary codes (missing word ->
        # no match anywhere in the batch)
        wc = pc.index_in(pa.array(words), value_set=dic)
        if wc.null_count:
            return empty
        wcodes = np.asarray(wc, dtype=np.int64)
        m = n - k + 1
        ok = codes[:m] == wcodes[0]
        for j in range(1, k):
            ok &= codes[j : m + j] == wcodes[j]
        if k > 1:
            ok &= rows[:m] == rows[k - 1 :]
        if not ok.any():
            return empty
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
        hit_rows, counts = np.unique(rows[:m][ok], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(did[hit_rows]),
                "n_matches": pa.array(counts.astype(np.int64)),
            }
        )

    return ds.map_batches(count_batch, batch_format="pyarrow").sort("doc_id")


def phrase_search_sql(phrase: str) -> str:
    """The ANSI-SQL twin: zipped-unnest token positions + one positional
    self-join per extra phrase token (generated, the unrolled-twin
    convention)."""
    words = [w for w in phrase.split() if w]
    k = len(words)

    def q(w: str) -> str:
        assert "'" not in w
        return f"'{w}'"

    joins = "\n".join(
        f"            JOIN t t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.i = t0.i + {j} AND t{j}.tok = {q(words[j])}"
        for j in range(1, k)
    )
    return f"""
        WITH d AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
        ),
        t AS (
          SELECT doc_id, unnest(ts) AS tok,
                 unnest(range(1, len(ts) + 1)) AS i
          FROM d
        )
        SELECT t0.doc_id, count(*)::BIGINT AS n_matches
        FROM t t0
{joins}
        WHERE t0.tok = {q(words[0])}
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
_Q40 = 1099511627776.0  # 2^40 — the shared ln-grid quantum


def bm25_topk(
    sf_dir: str,
    *,
    query: str = "sort query data",
    k: int = BM25_TOP_K,
    num_buckets: int = 64,
) -> pa.Table:
    """BM25 ranked retrieval (Robertson & Walker 1994, Lucene IDF
    variant): top-``k`` documents for ``query``, scored

        Σ_t  ln((N − df + ½)/(df + ½) + 1) · tf·(k₁+1)
                   / (tf + k₁·(1 − b + b·dl·N/total))

    with every per-(term, doc) contribution computed in ONE float64
    expression (operand order identical to the DuckDB twin) and
    quantized to ``round_even(x · 2^40)`` int64 — per-doc scores are
    exact order-free integer sums, so (score_q DESC, doc_id) is a total
    order and the top-k cut is deterministic (the bigram-LM / DSIR grid
    convention).

    Scale shape: ONE corpus pass emits a tagged stream — per-(doc, term)
    tf rows for query terms only (postings volume, not corpus volume)
    plus per-batch (n_docs, total_tokens, df_j) stat partials; the stats
    fold to q+2 scalars broadcast into the scoring map; scores fold by
    doc through the shared hash-bucket reduceat and a block-local top-k
    prune feeds the k-row sort.  No shuffle ever carries the corpus.

    Returns (rank, doc_id, score_q) — rank 1-based.
    """
    from .fold import fold_by_key

    tagged, n_docs, total_tok, df, words = _bm25_tagged(sf_dir, query)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        return _bm25_contrib(batch, idf, n_docs, total_tok).select(
            ["doc_id", "sq"]
        )

    scored = fold_by_key(
        tagged.map_batches(score, batch_format="pyarrow"),
        key="doc_id",
        cols=["sq"],
        num_buckets=num_buckets,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        s = batch.column("sq").combine_chunks().to_numpy(zero_copy_only=False)
        if len(d) > k:  # only a block-local top-k row can reach global top-k
            order = np.lexsort((d, -s))[:k]
            d, s = d[order], s[order]
        return pa.table({"doc_id": pa.array(d), "sq": pa.array(s)})

    head = (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["sq", "doc_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "rank": pa.array(range(1, len(head) + 1), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in head], pa.int64()),
            "score_q": pa.array([r["sq"] for r in head], pa.int64()),
        }
    )


def _bm25_tagged(sf_dir: str, query: str):
    """Shared postings-volume pass of the BM25 family: one corpus scan
    emitting per-(doc, query-term) tf rows plus per-batch stat partials,
    folded to the (n_docs, total_tokens, df_j) scalars on the driver.
    Returns (tagged_ds, n_docs, total_tok, df, words)."""
    words = sorted(set(w for w in query.split() if w))
    if not words:
        raise ValueError("empty query")
    q = len(words)

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("int64")
        rows, codes, dic = explode_tokens(texts, pattern=WS_SPLIT, lower=False)
        m = len(texts)
        dl = np.bincount(rows, minlength=m).astype(np.int64)
        # stat partial: kind=1 row — (n_docs, total_tokens, df_0..df_{q-1})
        wc = pc.index_in(pa.array(words), value_set=dic)
        out = {
            "kind": [np.array([1], np.int64)],
            "doc_id": [np.array([0], np.int64)],
            "term": [np.array([-1], np.int64)],
            "tf": [np.array([int(m)], np.int64)],
            "dl": [np.array([int(dl.sum())], np.int64)],
        }
        df_row = np.zeros(q, np.int64)
        tf_blocks = []
        for j, w in enumerate(words):
            code = wc[j].as_py()
            if code is None:
                continue
            sel = codes == code
            if not sel.any():
                continue
            hit_rows, tf = np.unique(rows[sel], return_counts=True)
            df_row[j] = len(hit_rows)
            tf_blocks.append(
                (
                    did[hit_rows],
                    np.full(len(hit_rows), j, np.int64),
                    tf.astype(np.int64),
                    dl[hit_rows],
                )
            )
        # df partials ride as q extra kind=2 rows (term=j, tf=df_j)
        out["kind"].append(np.full(q, 2, np.int64))
        out["doc_id"].append(np.zeros(q, np.int64))
        out["term"].append(np.arange(q, dtype=np.int64))
        out["tf"].append(df_row)
        out["dl"].append(np.zeros(q, np.int64))
        for d, t, tf, dls in tf_blocks:
            out["kind"].append(np.zeros(len(d), np.int64))
            out["doc_id"].append(d)
            out["term"].append(t)
            out["tf"].append(tf)
            out["dl"].append(dls)
        return pa.table({c: pa.array(np.concatenate(v)) for c, v in out.items()})

    tagged = ds.map_batches(partials, batch_format="pyarrow").materialize()

    stats = tagged.filter(expr="kind > 0").take_all()  # ≤ (q+1)·n_batches rows
    n_docs = sum(r["tf"] for r in stats if r["kind"] == 1)
    total_tok = sum(r["dl"] for r in stats if r["kind"] == 1)
    df = np.zeros(q, np.int64)
    for r in stats:
        if r["kind"] == 2:
            df[r["term"]] += r["tf"]
    return tagged, n_docs, total_tok, df, words


def _bm25_contrib(batch: pa.Table, idf: np.ndarray, n_docs: int, total_tok: int) -> pa.Table:
    """Per-(doc, term) quantized BM25 contribution rows of one tagged
    batch — identical float64 operand order as the twin:
    idf * (tf*2.2) / (tf + 1.2*(1.0 - 0.75 + 0.75*(dl*N)/total))."""
    mask = pc.equal(batch.column("kind"), 0)
    g = batch.filter(mask)
    if not g.num_rows:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.int64()),
                "sq": pa.array([], pa.int64()),
            }
        )
    d = g.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    t = g.column("term").combine_chunks().to_numpy(zero_copy_only=False)
    tf = g.column("tf").combine_chunks().to_numpy(zero_copy_only=False)
    dl = g.column("dl").combine_chunks().to_numpy(zero_copy_only=False)
    term = (
        idf[t]
        * (tf * (BM25_K1 + 1.0))
        / (
            tf
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * (dl * n_docs) / float(total_tok))
        )
    )
    sq = np.round(term * _Q40).astype(np.int64)
    return pa.table({"doc_id": pa.array(d), "term": pa.array(t), "sq": pa.array(sq)})


def bm25_sql(query: str = "sort query data", k: int = BM25_TOP_K) -> str:
    """The generated twin: same tokenizer, same float64 expression, same
    2^40 round_even grid, same (score DESC, doc_id) total order."""
    words = sorted(set(w for w in query.split() if w))
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"""
        WITH d AS (
          SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS ts
          FROM documents
        ),
        dl AS (SELECT doc_id, len(ts)::BIGINT AS dl FROM d),
        stats AS (
          SELECT count(*)::BIGINT AS n, sum(len(ts))::BIGINT AS tot FROM d
        ),
        t AS (SELECT doc_id, unnest(ts) AS tok FROM d),
        tf AS (
          SELECT doc_id, tok, count(*)::BIGINT AS tf
          FROM t WHERE tok IN ({inlist}) GROUP BY 1, 2
        ),
        df AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        term AS (
          SELECT tf.doc_id,
                 round_even(
                   ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (1.0 - 0.75
                                     + 0.75 * (dl.dl * stats.n) / stats.tot::DOUBLE))
                   * 1099511627776.0, 0)::BIGINT AS sq
          FROM tf
          JOIN df USING (tok)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats
        ),
        scores AS (
          SELECT doc_id, sum(sq)::BIGINT AS score_q FROM term GROUP BY 1
        )
        SELECT row_number() OVER (ORDER BY score_q DESC, doc_id)::BIGINT AS rank,
               doc_id, score_q
        FROM scores
        ORDER BY score_q DESC, doc_id
        LIMIT {k}
    """


def wand_topk(
    sf_dir: str,
    *,
    query: str = "sort query data",
    k: int = BM25_TOP_K,
    num_shards: int = 32,
) -> pa.Table:
    """BM25 top-``k`` via WAND document-at-a-time pruning (Broder et al.
    2003, public) — the index-side scale path beside the scan-side
    `bm25_topk`, returning the IDENTICAL table (same q40 contribution
    grid, same (score DESC, doc_id) total order; pytest-pinned equal and
    gated by the same SQL twin).

    Scale shape: the shared `_bm25_tagged` corpus pass emits the
    postings-volume contribution stream; rows hash-shard by doc_id and
    each shard runs the REAL WAND loop over its term postings (sorted
    doc arrays + per-term integer upper bounds): terms sort by their
    current doc, the pivot is the first term where the cumulative upper
    bound beats the running threshold θ (the shard's k-th best integer
    score so far), docs below the pivot are skipped with a galloping
    ``np.searchsorted`` — never scored, never iterated — and only
    pivot-aligned docs are fully scored.  Exactness: pruning only
    discards docs whose upper bound is STRICTLY below θ, so ties still
    surface and break on doc_id.  Shard top-k tables merge by one k-row
    sort.  Per-shard skip counts are logged — the observable pruning
    win postings-heavy corpora get over exhaustive folding.
    """
    import logging

    from .fold import fold_by_key  # noqa: F401  (family anchor)

    logger = logging.getLogger(__name__)
    tagged, n_docs, total_tok, df, words = _bm25_tagged(sf_dir, query)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def contrib(batch: pa.Table) -> pa.Table:
        t = _bm25_contrib(batch, idf, n_docs, total_tok)
        d = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        shard = (
            (d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(59)
        ).astype(np.int64) % num_shards
        return t.append_column("shard", pa.array(shard))

    def wand_shard(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        t = group.column("term").combine_chunks().to_numpy(zero_copy_only=False)
        s = group.column("sq").combine_chunks().to_numpy(zero_copy_only=False)
        # per-term postings sorted by doc
        posts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for j in np.unique(t):
            sel = t == j
            order = np.argsort(d[sel], kind="stable")
            posts[int(j)] = (d[sel][order], s[sel][order])
        terms = list(posts)
        pos = {j: 0 for j in terms}
        ub = {j: int(posts[j][1].max()) for j in terms}
        # heap of (sq, -doc): python tuples give the exact total order
        import heapq

        heap: list[tuple[int, int]] = []
        scored_docs = 0
        skipped = 0
        while True:
            active = [j for j in terms if pos[j] < len(posts[j][0])]
            if not active:
                break
            active.sort(key=lambda j: posts[j][0][pos[j]])
            theta = heap[0][0] if len(heap) >= k else None
            pivot_ix, acc = None, 0
            for ix, j in enumerate(active):
                acc += ub[j]
                if theta is None or acc >= theta:
                    pivot_ix = ix
                    break
            if pivot_ix is None:
                break  # summed bounds can't reach θ — all postings pruned
            pivot_doc = int(posts[active[pivot_ix]][0][pos[active[pivot_ix]]])
            first_doc = int(posts[active[0]][0][pos[active[0]]])
            if first_doc == pivot_doc:
                total = 0
                for j in active:
                    docs_j, sq_j = posts[j]
                    p = pos[j]
                    if p < len(docs_j) and docs_j[p] == pivot_doc:
                        total += int(sq_j[p])
                        pos[j] = p + 1
                scored_docs += 1
                item = (total, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            else:
                # gallop every pre-pivot term up to the pivot doc
                for j in active[:pivot_ix]:
                    docs_j, _ = posts[j]
                    new = int(np.searchsorted(docs_j, pivot_doc))
                    skipped += new - pos[j]
                    pos[j] = new
        if skipped:
            logger.info(
                "wand shard: %d docs scored, %d postings skipped", scored_docs, skipped
            )
        best = sorted(heap, reverse=True)
        return pa.table(
            {
                "doc_id": pa.array([-dd for _, dd in best], pa.int64()),
                "sq": pa.array([sq for sq, _ in best], pa.int64()),
            }
        )

    head = (
        tagged.map_batches(contrib, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(wand_shard, batch_format="pyarrow")
        .sort(["sq", "doc_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "rank": pa.array(range(1, len(head) + 1), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in head], pa.int64()),
            "score_q": pa.array([r["sq"] for r in head], pa.int64()),
        }
    )

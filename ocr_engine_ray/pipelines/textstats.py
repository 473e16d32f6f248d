"""Text-analysis pipelines over the ``documents`` table.

Vectorized where Arrow has the kernel (whitespace tokenization, char counts);
per-row compiled-regex work (BPE-ish counts, langid, quality, fingerprints)
runs inside batch UDFs — stateless tasks, since the "models" are module-level
compiled patterns (the langid profile loading would move to an actor
``__init__`` if profiles were heavyweight).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Sum

from ..functions import textstats as ts
from ..sources.tables import sf_table


# Token = maximal run of RE2 non-whitespace.  pyarrow's regex kernels are
# RE2-backed, so this is *bitwise* the same tokenizer as the DuckDB oracle's
# ``regexp_extract_all(text, '\S+')`` (both ASCII '\s'; Unicode whitespace is
# out of contract for the corpus).
_TOKEN_RE = r"\S+"

# The same token class for PYTHON-side tokenization (Counter paths): RE2's
# \s is exactly [\t\n\f\r ] (no \v, no Unicode), so Python ``str.split()``
# — Unicode-wide, \v-splitting — would drift from the SQL twins' RE2
# '\s+' split on exotic whitespace.  One compiled class, shared by every
# Counter tokenizer in this module (same convention as WS_RE / packing).
import re as _pyre

_ASCII_TOK_RE = _pyre.compile(r"[^ \t\n\f\r]+")


def _py_tokens(text: str | None) -> list[str]:
    return _ASCII_TOK_RE.findall(text or "")


def _token_occurrences(
    texts: list[str | None],
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Occurrence-level tokens of a whole batch as ``(row_idx, dict_code,
    dictionary)`` — the vectorized primitive behind every Counter-style
    tokenize loop in this module (value-identical to per-doc
    ``_py_tokens``, property-tested in tests/test_ops.py): one RE2
    whitespace split + ``dictionary_encode`` per batch (splitting '\\S+'
    runs on the ASCII class and dropping the '' edge artifacts IS the
    findall), so per-token Python work — including crc/bucket hashing —
    happens once per DISTINCT token via the dictionary, never per
    occurrence."""
    from ..functions.tokenize import WS_SPLIT, explode_tokens

    return explode_tokens(texts, pattern=WS_SPLIT, lower=False)


def doc_token_counts_batch(
    texts: list[str | None],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Distinct (row, token) pairs of a batch with multiplicities:
    ``(rows, tok_codes, counts, dictionary)``, sorted by (row, code) —
    the batched form of ``Counter(_py_tokens(t))`` per doc."""
    rows, codes, dic = _token_occurrences(texts)
    if not len(rows):
        return rows, codes, np.empty(0, np.int64), dic
    ucomb, cnt = np.unique(rows * len(dic) + codes, return_counts=True)
    return ucomb // len(dic), ucomb % len(dic), cnt.astype(np.int64), dic


def _n_tokens(texts: pa.Array) -> pa.Array:
    return pc.count_substring_regex(texts, _TOKEN_RE)


def quality_scores_batch(texts: list[str | None]) -> list[float]:
    """Batch `functions.textstats.quality_score` — bit-identical
    (hypothesis-tested: same ints, same float expression order, Python
    ``round`` at the end), with the per-token work vectorized: RE2 kernels
    for the punct/digit counts and the ASCII-alpha fullmatch (anchored RE2,
    per DISTINCT token via the dictionary), Python ``str.lower`` per
    distinct token for the stopword test (utf8proc case folding could
    drift on exotic Unicode)."""
    n = len(texts)
    if n == 0:
        return []
    arr = pa.array([(t or "") for t in texts], pa.string())
    n_chars = np.asarray(pc.utf8_length(arr), dtype=np.int64)
    rows, codes, dic = _token_occurrences(texts)
    n_tokens = np.bincount(rows, minlength=n).astype(np.int64)
    if len(dic):
        alpha = np.asarray(
            pc.match_substring_regex(dic, r"^[A-Za-z]+$"), dtype=bool
        )
        sw = ts.STOPWORDS["en"]
        stop = np.fromiter(
            ((w.lower() in sw) for w in dic.to_pylist()), dtype=bool, count=len(dic)
        )
        n_alpha = np.bincount(rows, weights=alpha[codes].astype(np.float64), minlength=n)
        n_stop = np.bincount(rows, weights=stop[codes].astype(np.float64), minlength=n)
    else:
        n_alpha = np.zeros(n, np.float64)
        n_stop = np.zeros(n, np.float64)
    n_punct = np.asarray(
        pc.count_substring_regex(arr, r"[^0-9A-Za-z_ \t\n\f\r]"), dtype=np.int64
    )
    n_digit = np.asarray(pc.count_substring_regex(arr, r"[0-9]"), dtype=np.int64)
    nt = n_tokens.astype(np.float64)
    has_t = n_tokens > 0
    safe_nt = np.where(has_t, nt, 1.0)
    alpha_ratio = np.where(has_t, n_alpha / safe_nt, 0.0)
    stop_ratio = np.where(has_t, n_stop / safe_nt, 0.0)
    has_c = n_chars > 0
    safe_nc = np.where(has_c, n_chars.astype(np.float64), 1.0)
    punct_ratio = np.where(has_c, n_punct / safe_nc, 0.0)
    digit_ratio = np.where(has_c, n_digit / safe_nc, 0.0)
    # same expression order as the scalar quality_score — IEEE ops are
    # deterministic, so elementwise float64 here == per-doc Python floats
    length_ok = np.minimum(1.0, nt / 20.0) * np.where(n_tokens <= 5000, 1.0, 0.5)
    score = (
        0.35 * length_ok
        + 0.30 * alpha_ratio
        + 0.20 * np.minimum(1.0, stop_ratio * 4)
        + 0.15 * (1.0 - np.minimum(1.0, punct_ratio * 5 + digit_ratio * 2))
    )
    clipped = np.minimum(1.0, np.maximum(0.0, score))
    return [round(x, 6) for x in clipped.tolist()]


def langid_batch(texts: list[str | None]) -> list[str]:
    """Batch `functions.textstats.langid` — identical output
    (hypothesis-tested): script checks via vectorized RE2 searches,
    stopword voting via one space-split + dictionary membership per
    DISTINCT normalized word; ``np.argmax`` keeps the scalar's
    first-max-wins / all-zero→'en' tie semantics (fixed column order)."""
    n = len(texts)
    if n == 0:
        return []
    arr = pa.array([(t or "") for t in texts], pa.string())
    zh = np.asarray(pc.match_substring_regex(arr, "[一-鿿]"), dtype=bool)
    hi = np.asarray(pc.match_substring_regex(arr, "[ऀ-ॿ]"), dtype=bool)
    # normalize in Python (str.lower — same exotic-Unicode caution as above)
    normed = pa.array([ts.normalize_text(t or "") for t in texts], pa.string())
    words = pc.split_pattern(normed, " ")
    lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
    enc = pc.dictionary_encode(pc.list_flatten(words))
    codes = np.asarray(enc.indices, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    dic_list = enc.dictionary.to_pylist()
    langs = ("en", "de", "es", "fr")
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        sw = ts.STOPWORDS[lang]
        member = np.fromiter(
            ((w in sw) for w in dic_list), dtype=bool, count=len(dic_list)
        )
        if member.any():
            scores[:, li] = np.bincount(
                rows[member[codes]], minlength=n
            )
    vote = np.argmax(scores, axis=1)
    out = []
    for i in range(n):
        if zh[i]:
            out.append("zh")
        elif hi[i]:
            out.append("hi")
        else:
            out.append(langs[vote[i]])
    return out


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text")
    # vectorized: whitespace token count + char count
    n_tokens = _n_tokens(texts)
    n_chars = pc.utf8_length(texts)
    tl = texts.to_pylist()
    filled = pc.fill_null(
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts, ""
    )
    # BPE-ish pre-token count: same disjoint-class alternation in RE2
    bpe = pc.count_substring_regex(filled, ts.BPE_ISH_RE.pattern).cast(pa.int64())
    fp = [ts.fingerprint_md5(t) for t in tl]  # md5 is per-doc by nature
    lang = langid_batch(tl)
    q = quality_scores_batch(tl)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars.cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
            "n_tokens_bpe": bpe,
            "fingerprint": pa.array(fp, pa.string()),
            "lang_detected": pa.array(lang, pa.string()),
            "quality": pa.array(q, pa.float64()),
        }
    )


def doc_stats(sf_dir: str) -> rd.Dataset:
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(doc_stats_batch, batch_format="pyarrow")


def doc_core_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc SQL-reproducible stats: chars, ws tokens, md5 fingerprint."""
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        n_tokens = _n_tokens(texts).cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.utf8_length(texts).cast(pa.int64()),
                "n_tokens": n_tokens,
                "fingerprint": pa.array(
                    [ts.fingerprint_md5(t) for t in texts.to_pylist()], pa.string()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def token_totals_by_lang(sf_dir: str) -> rd.Dataset:
    """Whitespace-token totals per (label) lang — SQL-checkable."""
    ds = sf_table(sf_dir, "documents", columns=["lang", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        n = _n_tokens(batch.column("text")).cast(pa.int64())
        return pa.table({"lang": batch.column("lang"), "n_tokens": n})

    out = ds.map_batches(counts, batch_format="pyarrow")
    return out.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs")
    )


def fingerprint_stats(sf_dir: str) -> rd.Dataset:
    """Distinct md5 content fingerprints per source (exact-dedup signal with
    a fully SQL-reproducible key)."""
    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    import zlib

    def fp(batch: pa.Table) -> pa.Table:
        fps = [ts.fingerprint_md5(t) for t in batch.column("text").to_pylist()]
        # map-side dedup: distinct (source, fp) pairs per batch
        seen = sorted({(s, f) for s, f in zip(batch.column("source").to_pylist(), fps)})
        return pa.table(
            {
                "source": pa.array([s for s, _ in seen], pa.string()),
                "fingerprint": pa.array([f for _, f in seen], pa.string()),
                # a (source, fp) pair lands wholly in one hash bucket, so
                # per-bucket distinct counts sum exactly
                "fbkt": pa.array(
                    [zlib.crc32(f"{s}\x1f{f}".encode()) % 64 for s, f in seen],
                    pa.int64(),
                ),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        # distinct (source, fp) pairs of the bucket -> per-source counts
        # (Ray's groupby([source, fingerprint]) paid per-DISTINCT-PAIR
        # aggregate machinery — doc-cardinality, the fold.py hotspot)
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        fenc = pc.dictionary_encode(group.column("fingerprint").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        fi = np.asarray(fenc.indices, dtype=np.int64)
        pair = np.unique(si * max(len(fenc.dictionary), 1) + fi)
        src_of_pair = (pair // max(len(fenc.dictionary), 1)).astype(np.int64)
        cnt = np.bincount(src_of_pair, minlength=len(senc.dictionary)).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "source": pc.take(senc.dictionary, pa.array(nz)),
                "n_part": pa.array(cnt[nz]),
            }
        )

    partials = (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby("fbkt")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )
    return partials.groupby("source").aggregate(Sum("n_part", alias_name="n_unique"))


def lexical_diversity(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Per-source lexical diversity: token total, distinct-token count and
    type-token ratio (TTR) — the standard vocabulary-richness signal when
    comparing corpus slices before mixing.

    Scale shape (the `fingerprint_stats` distinct-pair pattern): one corpus
    pass emits per-batch DISTINCT (source, token) rows with their in-batch
    multiplicities, keyed by ``crc32(source \\x1f token) % B`` — a pair
    lands wholly in one bucket, so the bucket's distinct count and
    multiplicity sum are exact partials; a tiny source-keyed aggregate
    folds the ≤ B×sources partials.  No vocabulary ever sits on the
    driver.  TTR is one int64→float divide rounded half-even, identical
    in the SQL twin; sources whose texts hold no tokens are absent on
    both sides.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "lbkt": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        ukey, cnt = np.unique(si * nd + codes, return_counts=True)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        sdic = senc.dictionary.to_pylist()
        tdic = dic.to_pylist()
        bkt = np.fromiter(
            (
                zlib.crc32(f"{sdic[a]}\x1f{tdic[b]}".encode()) % num_buckets
                for a, b in zip(us, ut)
            ),
            dtype=np.int64,
            count=len(ukey),
        )
        return pa.table(
            {
                "lbkt": pa.array(bkt),
                "source": pc.take(senc.dictionary, pa.array(us)),
                "token": pc.take(dic, pa.array(ut)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        # exact per-source partials of this bucket: distinct tokens + totals
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        ti = np.asarray(tenc.indices, dtype=np.int64)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nt = max(len(tenc.dictionary), 1)
        pair = si * nt + ti
        order = np.argsort(pair, kind="stable")
        sp = pair[order]
        new = np.concatenate([[True], sp[1:] != sp[:-1]]) if len(sp) else np.array([], bool)
        starts = np.nonzero(new)[0]
        src_of_pair = (sp[starts] // nt).astype(np.int64)
        ns = len(senc.dictionary)
        n_unique = np.bincount(src_of_pair, minlength=ns).astype(np.int64)
        n_tok = np.zeros(ns, dtype=np.int64)
        np.add.at(n_tok, si, c)
        return pa.table(
            {
                "source": senc.dictionary,
                "u_part": pa.array(n_unique),
                "t_part": pa.array(n_tok),
            }
        )

    agg = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("lbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("t_part", alias_name="n_tokens"),
            Sum("u_part", alias_name="n_unique_tokens"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        u = batch.column("n_unique_tokens").combine_chunks().to_numpy(zero_copy_only=False)
        t = batch.column("n_tokens").combine_chunks().to_numpy(zero_copy_only=False)
        ttr = [round(float(a) / float(b), 6) for a, b in zip(u, t)]
        return pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": batch.column("n_tokens").cast(pa.int64()),
                "n_unique_tokens": batch.column("n_unique_tokens").cast(pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def source_vocab_overlap(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Pairwise vocabulary Jaccard between sources — the set-similarity
    join over corpus slices (which feeds mixing decisions: near-identical
    slices waste budget, disjoint ones need separate quality models).

    Scale shape: ONE corpus pass emits per-batch distinct (source, token)
    pairs keyed by ``crc32(token) % B`` — every source holding a token
    co-locates in that token's bucket, so the bucket emits BOTH per-source
    partial vocabulary counts and per-source-PAIR partial intersection
    counts (pair expansion vectorized by token run-size class, the basket
    triu pattern).  Fan-out is sources² per token: fine for corpus slices
    (dozens of sources), NOT for doc-level similarity — that's what the
    MinHash/SimHash LSH operators are for.  The final combine is
    sources²-sized (scale-free), the legitimate small result.

    Returns (src_a, src_b, n_common, jaccard) for ``src_a < src_b`` with a
    non-empty intersection, sorted by (src_a, src_b).
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def pair_rows(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        ukey = np.unique(si * nd + codes)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int64,
            count=nd,
        )
        return pa.table(
            {
                "tbkt": pa.array(crc[ut]),
                "token": pc.take(dic, pa.array(ut)),
                "source": pc.take(senc.dictionary, pa.array(us)),
            }
        )

    def bucket_partials(group: pa.Table) -> pa.Table:
        # distinct (token, source) of the bucket → vocab partials per
        # source + intersection partials per ordered source pair
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        ti = np.asarray(tenc.indices, dtype=np.int64)
        si = np.asarray(senc.indices, dtype=np.int64)
        ns = max(len(senc.dictionary), 1)
        pair = np.unique(ti * ns + si)
        d_ti = pair // ns
        d_si = pair % ns
        sdic = senc.dictionary.to_pylist()
        # source order must be LEXICOGRAPHIC for src_a < src_b, not
        # first-occurrence dictionary order
        rank = np.argsort(np.argsort(np.array(sdic, dtype=object), kind="stable"))
        d_sr = rank[d_si]
        order = np.lexsort((d_sr, d_ti))
        d_ti, d_sr = d_ti[order], d_sr[order]
        srt = np.array(sdic, dtype=object)[np.argsort(np.array(sdic, dtype=object), kind="stable")]
        out_a: list = []
        out_b: list = []
        out_n: list = []
        # vocab partials: one row per source, src_b = "" sentinel
        vs, vc = np.unique(d_sr, return_counts=True)
        out_a.extend(srt[vs].tolist())
        out_b.extend([""] * len(vs))
        out_n.extend(vc.astype(np.int64).tolist())
        # intersection partials, vectorized by token run-size class
        toks, m = np.unique(d_ti, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        for msize in np.unique(m):
            if msize < 2:
                continue
            sel = np.nonzero(m == msize)[0]
            idx = starts[sel][:, None] + np.arange(msize)[None, :]
            sr = d_sr[idx]  # (n_tokens, msize), source-rank ascending
            iu, ju = np.triu_indices(int(msize), 1)
            a = sr[:, iu].ravel()
            b = sr[:, ju].ravel()
            pk, cnt = np.unique(a * ns + b, return_counts=True)
            out_a.extend(srt[(pk // ns)].tolist())
            out_b.extend(srt[(pk % ns)].tolist())
            out_n.extend(cnt.astype(np.int64).tolist())
        return pa.table(
            {
                "src_a": pa.array(out_a, pa.string()),
                "src_b": pa.array(out_b, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(pair_rows, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(bucket_partials, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n", alias_name="n_common"))
    ).take_all()  # sources²-sized: the legitimate small result

    vocab = {r["src_a"]: r["n_common"] for r in agg if r["src_b"] == ""}
    rows = sorted(
        (r["src_a"], r["src_b"], r["n_common"]) for r in agg if r["src_b"] != ""
    )
    return rd.from_arrow(
        pa.table(
            {
                "src_a": pa.array([a for a, _, _ in rows], pa.string()),
                "src_b": pa.array([b for _, b, _ in rows], pa.string()),
                "n_common": pa.array([n for _, _, n in rows], pa.int64()),
                "jaccard": pa.array(
                    [
                        round(float(n) / float(vocab[a] + vocab[b] - n), 6)
                        for a, b, n in rows
                    ],
                    pa.float64(),
                ),
            }
        )
    )


def quality_by_source(sf_dir: str) -> rd.Dataset:
    """Mean SQL-expressible quality components per source."""
    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def signals(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        n_chars = pc.utf8_length(texts).cast(pa.float64())
        n_tokens = _n_tokens(texts).cast(pa.float64())
        return pa.table(
            {
                "source": batch.column("source"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
            }
        )

    out = ds.map_batches(signals, batch_format="pyarrow")
    agg = out.groupby("source").aggregate(
        Mean("n_chars", alias_name="avg_chars"),
        Mean("n_tokens", alias_name="avg_tokens"),
        Count(alias_name="n_docs"),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        # half-away, like the oracle's round(avg(...), 4): an average of
        # ints over a power-of-two count can sit exactly on a binary
        # midpoint, where pc.round's default half-to-even diverges.
        for c in ("avg_chars", "avg_tokens"):
            batch = batch.set_column(
                batch.schema.get_field_index(c),
                c,
                pc.round(
                    batch.column(c), ndigits=4, round_mode="half_towards_infinity"
                ),
            )
        return batch

    return agg.map_batches(rnd, batch_format="pyarrow")


def token_frequencies(sf_dir: str) -> rd.Dataset:
    """Corpus token frequencies per label lang (vocabulary statistics).

    The scale pattern: tokens are counted PARTIALLY inside each batch
    (one (lang, token, n) row per distinct token per batch) before the
    groupby, so the shuffle moves vocabulary-sized partials, not one row
    per token occurrence.
    """
    ds = sf_table(sf_dir, "documents", columns=["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        # Null lang handling: Ray's groupby cannot sort null keys, and the
        # default dictionary_encode null_encoding="mask" would turn a null
        # into a garbage int64 key (silent wrong rows).  Encode null as a
        # NUL-byte sentinel here (a NUL can't appear in a real lang code)
        # and restore it to null after the shuffle — NULL stays its own
        # group, matching the SQL twin's GROUP BY semantics.
        lenc = pc.dictionary_encode(
            pc.fill_null(batch.column("lang").combine_chunks(), "\x00")
        )
        lrow = np.asarray(lenc.indices, dtype=np.int64)
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        if not len(rows):
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ucomb, cnt = np.unique(lrow[rows] * len(dic) + codes, return_counts=True)
        return pa.table(
            {
                "lang": pc.take(lenc.dictionary, pa.array(ucomb // len(dic))),
                "token": pc.take(dic, pa.array(ucomb % len(dic))),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )

    def restore_null_lang(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        mask = pc.equal(lang, "\x00")
        if not pc.any(mask).as_py():
            return batch
        return batch.set_column(
            batch.schema.get_field_index("lang"),
            "lang",
            pc.if_else(mask, pa.nulls(batch.num_rows, pa.string()), lang),
        )

    return agg.map_batches(restore_null_lang, batch_format="pyarrow")


def approx_distinct_texts(sf_dir: str) -> rd.Dataset:
    """Approximate distinct text count per source via mergeable HLL sketches.

    Each batch emits ONE (source, registers) row per source; the groupby
    merges registers elementwise — the shuffle moves ``sources × blocks``
    4 KiB sketches, never the texts.  (~1.6% standard error at 2^12
    registers; accuracy asserted vs exact counts in tests.)  Hashing is
    md5-64 and the estimate folds on the exact-integer grid
    (`sketch.hll_count`) so the DuckDB twin recomputes registers AND
    estimate wholesale — a computed oracle, not a pinned literal.
    """
    from ..functions import sketch

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def batch_sketches(batch: pa.Table) -> pa.Table:
        groups: dict[str, list[str]] = {}
        for s, t in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            groups.setdefault(s, []).append(t or "")
        srcs, regs = [], []
        for s, texts in groups.items():
            srcs.append(s)
            regs.append(sketch.hll_sketch_md5(texts).tobytes())
        return pa.table(
            {"source": pa.array(srcs, pa.string()), "regs": pa.array(regs, pa.binary())}
        )

    partials = ds.map_batches(batch_sketches, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        import numpy as np

        sketches = [
            np.frombuffer(b, dtype=np.uint8) for b in group.column("regs").to_pylist()
        ]
        est = sketch.hll_count(sketch.hll_merge(sketches))
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()], pa.string()),
                "approx_unique": pa.array([est], pa.int64()),
            }
        )

    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def langid_counts(sf_dir: str) -> rd.Dataset:
    """Detected-language distribution.  The script-regex + stopword-voting
    heuristic is pure arithmetic, so the DuckDB oracle recomputes it
    wholesale (see __ray_entry__._LANGID)."""
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def det(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_detected": pa.array(
                    langid_batch(batch.column("text").to_pylist()), pa.string()
                )
            }
        )

    return ds.map_batches(det, batch_format="pyarrow").groupby("lang_detected").aggregate(
        Count(alias_name="n_docs")
    )


def _doc_topk_mask(
    docs: "np.ndarray", s: "np.ndarray", tok_ids: "np.ndarray", k: int
):
    """Vectorized per-doc top-k selection by (score DESC, token ASC): returns
    (keep_mask, rank) where rank is 1-based within the doc for kept rows.
    ``tok_ids`` must order like the token strings (np.unique inverse)."""
    import numpy as np

    order = np.lexsort((tok_ids, -s, docs))
    sd = docs[order]
    new = np.concatenate([[True], sd[1:] != sd[:-1]]) if len(sd) else np.array([], bool)
    run_id = np.cumsum(new) - 1
    run_starts = np.nonzero(new)[0]
    rank_sorted = np.arange(len(sd)) - run_starts[run_id] + 1
    keep = np.zeros(len(sd), dtype=bool)
    rank = np.zeros(len(sd), dtype=np.int64)
    keep[order] = rank_sorted <= k
    rank[order] = rank_sorted
    return keep, rank


def tfidf_top_terms(sf_dir: str, *, k: int = 3, num_buckets: int = 64) -> rd.Dataset:
    """Per-document top-k tokens by tf-idf (vocabulary-weighted keyword
    extraction — the classic corpus-curation signal).

    Scale shape — token-bucketed df join, NO vocabulary-sized driver state
    (the round-3 broadcast-df variant pulled the whole df table through
    ``take_all()``; at web-scale vocabularies that is driver OOM):

    1. explode: one (crc32-token-bucket, token, doc_id, tf) row per distinct
       token per doc — per-doc partial counting inside the batch, so the
       shuffle moves distinct-(doc,token) rows, never raw occurrences;
    2. ``groupby(bkt)``: every occurrence row of a token lands in ONE bucket
       (token-function key), so the bucket computes the token's GLOBAL df
       (one np.unique) and each row's score tf·ln(N/df) in the same pass,
       then prunes to each doc's in-bucket top-k — only a doc's bucket-local
       top-k can reach its global top-k, so ≤ k rows per (doc, bucket)
       survive to the second shuffle;
    3. ``groupby(doc-hash-bucket)``: vectorized final per-doc top-k + rank
       (many docs per group — no per-doc Python task).

    score = tf · ln(N / df), rounded half-even to 6 for the compared
    surface; ranking uses the unrounded float (DuckDB ``ln`` and numpy
    ``log`` are the same libm call, so ordering is bit-identical — the same
    wholesale-float-recompute contract as doc_stats' quality score).
    Tokenizer = `_py_tokens` (RE2-ASCII '\\S+', the token_frequencies /
    SQL ``regexp_split_to_array(trim(text), '\\s+')`` contract).
    """
    import zlib

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, not a scan

    def explode(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, codes, cnt, dic = doc_token_counts_batch(
            batch.column("text").to_pylist()
        )
        # crc/bucket once per DISTINCT token via the dictionary, then a gather
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int32,
            count=len(dic),
        )
        return pa.table(
            {
                "bkt": pa.array(crc[codes] if len(codes) else crc[:0]),
                "token": pc.take(dic, pa.array(codes)),
                "doc_id": pa.array(dids[rows], pa.int64()),
                "tf": pa.array(cnt, pa.int64()),
            }
        )

    def bucket_score(group: pa.Table) -> pa.Table:
        toks = np.asarray(group.column("token").to_pylist(), dtype=object)
        dids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        tf = group.column("tf").combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        df = np.bincount(inv)  # rows are distinct (doc, token): count == df
        s = tf * np.log(np.float64(n_docs) / df[inv])
        keep, _ = _doc_topk_mask(dids, s, inv, k)
        return pa.table(
            {
                "doc_id": pa.array(dids[keep]),
                "dbkt": pa.array((dids[keep] % num_buckets).astype(np.int32)),
                "token": pa.array(toks[keep].tolist(), pa.string()),
                "s": pa.array(s[keep], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        toks = np.asarray(group.column("token").to_pylist(), dtype=object)
        dids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        s = group.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        _, inv = np.unique(toks, return_inverse=True)
        keep, rank = _doc_topk_mask(dids, s, inv, k)
        # banker's rounding, like the twin's round_even(s, 6)
        score = np.array([round(x, 6) for x in s[keep]], dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(dids[keep]),
                "rank": pa.array(rank[keep]),
                "token": pa.array(toks[keep].tolist(), pa.string()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(bucket_score, batch_format="pyarrow")
        .groupby("dbkt")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def token_quantiles_by_source(
    sf_dir: str, *, quantiles: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> rd.Dataset:
    """Exact per-source token-count quantiles (type-7 / ``quantile_cont``
    interpolation), computed distributed via value histograms.

    Scale shape: each batch emits (source, n_tokens, n_docs) PARTIAL
    histogram rows; the groupby shuffle moves value-domain-sized rows, never
    the corpus, and a second tiny groupby(source) turns each source's
    cumulative histogram into its order statistics — no sort of the data
    anywhere.

    Exactness contract: quantiles here are DYADIC fractions (k/2^m).  The
    type-7 position ``h = q·(n-1)`` and interpolation
    ``lo + (hi-lo)·frac`` are then exact in binary floating point for
    integer order statistics, so the result is BIT-identical to DuckDB's
    ``quantile_cont`` regardless of either side's formula association.
    Non-dyadic quantiles (0.9, 0.99) would make ``h`` itself inexact and
    floor(h) platform-dependent at bin boundaries — use dyadic ladders
    (0.875, 0.984375) at scale, same machinery.
    """
    import numpy as np

    for q in quantiles:
        f = q * 2**20
        if f != int(f):
            raise ValueError(f"quantile {q} is not dyadic (see docstring)")

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partial_hist(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": _n_tokens(batch.column("text")).cast(pa.int64()),
            }
        )
        agg = pa.TableGroupBy(t, ["source", "n_tokens"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": agg.column("source"),
                "n_tokens": agg.column("n_tokens"),
                "n_docs": agg.column("count_all").cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby(["source", "n_tokens"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def hist_quantiles(group: pa.Table) -> pa.Table:
        vals = np.asarray(group.column("n_tokens").to_pylist(), dtype=np.int64)
        counts = np.asarray(group.column("n_docs").to_pylist(), dtype=np.int64)
        order = np.argsort(vals)
        vals, counts = vals[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        src = group.column("source")[0].as_py()
        qs, out = [], []
        for q in quantiles:
            h = q * (n - 1)  # exact: q dyadic, n-1 integer
            lo_i = int(np.floor(h))
            frac = h - lo_i
            lo = vals[np.searchsorted(cum, lo_i, side="right")]
            hi = vals[np.searchsorted(cum, min(lo_i + 1, n - 1), side="right")]
            qs.append(q)
            out.append(float(lo) + (float(hi) - float(lo)) * frac)
        return pa.table(
            {
                "source": pa.array([src] * len(qs), pa.string()),
                "q": pa.array(qs, pa.float64()),
                "n_tokens_q": pa.array(out, pa.float64()),
            }
        )

    return hist.groupby("source").map_groups(hist_quantiles, batch_format="pyarrow")


def heavy_hitters(sf_dir: str, *, capacity: int = 256) -> rd.Dataset:
    """EXACT corpus-wide heavy hitters: every token whose total frequency
    exceeds ``N / capacity`` (N = total token occurrences), via the
    two-pass Misra–Gries / lossy-counting pattern (Misra & Gries '82,
    Manku & Motwani VLDB'02 — public classics).

    Pass 1 (candidates): each batch keeps only tokens whose *in-batch*
    count exceeds ``batch_tokens / capacity``.  By the averaging argument
    any token with global freq > N/capacity must clear that bar in at
    least one batch, so the union of per-batch survivors is a SUPERSET of
    the true heavy hitters — and each batch emits < capacity candidate
    rows, so the candidate stream is ``blocks x capacity`` rows no matter
    how large the corpus.  Distinct candidates are reduced ON-cluster
    (groupby) before the small set is broadcast (at 10^12 docs: a Bloom
    filter, like the MinHash verify prune).

    Pass 2 (exact recount): the corpus streams once more counting ONLY
    candidate tokens (set lookup inside the batch Counter), partials are
    summed in one vocabulary-sized groupby, and the exact global
    threshold ``> N/capacity`` filters the survivors.  Output is exact —
    the DuckDB twin recomputes it wholesale — while only candidate-sized
    state ever crosses the wire.

    The reference has no corpus analytics (SURVEY.md S2.6); this is part
    of the training-data layer (vocabulary pruning / stop-list mining).
    """
    import numpy as np

    ds = sf_table(sf_dir, "documents", columns=["text"])

    def candidates(batch: pa.Table) -> pa.Table:
        _, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        n_batch = int(len(codes))
        cnts = np.bincount(codes, minlength=len(dic))
        bar = n_batch / capacity
        keep = [t for t, c in zip(dic.to_pylist(), cnts.tolist()) if c > bar]
        # one marker row per batch carries the batch token total so N is
        # aggregated on-cluster in the same stream ("" marks it — the
        # tokenizer can never produce an empty token, and Ray groupby keys
        # can't be null)
        return pa.table(
            {
                "token": pa.array(keep + [""], pa.string()),
                "n_batch": pa.array([0] * len(keep) + [n_batch], pa.int64()),
            }
        )

    cand_stream = ds.map_batches(candidates, batch_format="pyarrow")
    # distinct candidates + total N, both reduced on-cluster; only the
    # (bounded) distinct candidate list reaches the driver for broadcast
    agg = cand_stream.groupby("token").aggregate(Sum("n_batch", alias_name="n_b"))
    total_n = 0
    cand_set: set[str] = set()
    for row in agg.take_all():
        if row["token"] == "":
            total_n = int(row["n_b"])
        else:
            cand_set.add(row["token"])
    import ray

    ref = ray.put(cand_set)
    threshold = total_n / capacity

    def recount(batch: pa.Table) -> pa.Table:
        from .joins import _get_broadcast

        cand = _get_broadcast(ref)
        _, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        cnts = np.bincount(codes, minlength=len(dic))
        toks = dic.to_pylist()
        # membership test once per DISTINCT token, not per occurrence
        mask = np.fromiter((t in cand for t in toks), dtype=bool, count=len(toks))
        return pa.table(
            {
                "token": pa.array([t for t, m in zip(toks, mask) if m], pa.string()),
                "n": pa.array(cnts[mask].astype(np.int64)),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )

    def over_threshold(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("n_occurrences"), pa.scalar(threshold))
        return batch.filter(keep)

    return exact.map_batches(over_threshold, batch_format="pyarrow")


def approx_distinct_digest(sf_dir: str) -> "pa.Table":
    """Digest gate over `approx_distinct_texts`: the HLL register max-fold is
    associative/commutative, so the distributed estimate is deterministic;
    the DuckDB twin in `__ray_entry__.oracle_sql()` RECOMPUTES registers,
    estimate and digest wholesale (md5-64 hash + exact-integer harmonic
    sum), and the sequential `oracle_dedup.hll_distinct_by_source` pins the
    same rows in pytest."""
    from .interpret import fold_digest

    ds = approx_distinct_texts(sf_dir)

    def payload(batch):
        import pyarrow as _pa

        return _pa.table(
            {
                "doc_id": batch["source"],
                "payload": _pa.array(
                    [str(n) for n in batch["approx_unique"].to_pylist()], _pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def token_rarity_score(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Corpus-statistics quality signal: for every doc, the total corpus
    frequency of its token occurrences (``freq_sum`` = Σ over occurrences of
    the token's global count) plus ``n_tokens`` — low mean frequency marks
    rare-vocabulary docs, high marks boilerplate.  Integer-exact end to end
    (no float logprobs), so the SQL twin matches bit-for-bit.

    Scale shape — the global vocabulary is NEVER broadcast and no join
    infrastructure is needed; two shuffles do it:

    1. a map pass explodes per-(doc, token) partial counts, keyed by
       ``crc32(token) % num_buckets`` — every row of a given token lands in
       one bucket, so the bucket can compute the token's GLOBAL count and
       each doc's bucket-local contribution (Σ c_dt × C_t, via one lexsort +
       reduceat per bucket) in the same pass;
    2. a doc_id groupby sums the ≤ num_buckets partial rows per doc.

    Docs with zero tokens produce no row (same as the SQL unnest twin).
    """
    import zlib

    import numpy as np

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, codes, cnt, dic = doc_token_counts_batch(
            batch.column("text").to_pylist()
        )
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int32,
            count=len(dic),
        )
        return pa.table(
            {
                "bkt": pa.array(crc[codes] if len(codes) else crc[:0]),
                "token": pc.take(dic, pa.array(codes)),
                "doc_id": pa.array(dids[rows], pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    def bucket_partial(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        cs = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        # token ids via Arrow dictionary_encode (C++ hashing — argsorting
        # object arrays was the measured kernel hotspot at 1M docs; totals
        # are id-order-invariant), then an int argsort + reduceat for the
        # integer-exact per-token totals (bincount's float weights would
        # round above 2^53 occurrences)
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        tid = np.asarray(tenc.indices, dtype=np.int64)
        order = np.argsort(tid, kind="stable")
        st = tid[order]
        new = np.concatenate([[True], st[1:] != st[:-1]]) if len(st) else np.array([], bool)
        run_starts = np.nonzero(new)[0]
        ct_runs = (
            np.add.reduceat(cs[order], run_starts) if len(st) else np.array([], np.int64)
        )
        ct = np.zeros(len(tenc.dictionary), dtype=np.int64)
        if len(st):
            ct[st[run_starts]] = ct_runs
        contrib = cs * ct[tid]
        # combine per doc within the bucket
        dorder = np.argsort(docs, kind="stable")
        sd = docs[dorder]
        cuts = np.nonzero(np.diff(sd))[0] + 1
        starts = np.concatenate([[0], cuts]).astype(np.int64) if len(sd) else np.array([], np.int64)
        return pa.table(
            {
                "doc_id": pa.array(sd[starts] if len(sd) else sd),
                "freq_sum": pa.array(
                    np.add.reduceat(contrib[dorder], starts) if len(sd) else contrib
                ),
                "n_tokens": pa.array(
                    np.add.reduceat(cs[dorder], starts) if len(sd) else cs
                ),
            }
        )

    from .fold import fold_int_sums_by_key

    partials = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(bucket_partial, batch_format="pyarrow")
    )
    # exact int sums per doc via the shared hash-bucket reduceat fold
    # (identical to groupby("doc_id").aggregate(Sum) — see fold.py)
    return (
        fold_int_sums_by_key(partials, cols=["n_tokens", "freq_sum"])
        .sort("doc_id")
    )


# --- Count-Min sketch (Cormode & Muthukrishnan '05, public classic) --------

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # buckets per row


def _cms_buckets(tokens: list[str], depth: int, width: int) -> np.ndarray:
    """Row-j bucket of each token: ``md5(f"{j}:{tok}")[:8 hex] % width`` —
    the identical expression the DuckDB twin spells as
    ``('0x' || substr(md5(j::VARCHAR || ':' || token), 1, 8))::UBIGINT % w``
    (verified bit-equal).  Shape (depth, len(tokens))."""
    import hashlib

    out = np.empty((depth, len(tokens)), dtype=np.int64)
    for ti, tok in enumerate(tokens):
        b = tok.encode()
        for j in range(depth):
            out[j, ti] = (
                int(hashlib.md5(b"%d:" % j + b).hexdigest()[:8], 16) % width
            )
    return out


def cms_token_counts(
    sf_dir: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    topn: int = 20,
) -> pa.Table:
    """Count-Min sketch over the corpus token stream, verified against the
    exact counts of the ``topn`` most frequent tokens.

    Scale shape: the sketch is a CONSTANT-size (depth x width int64) counter
    array whose per-batch partials are pure sums — each batch emits its
    nonzero (j, bucket, c) cells (< depth x width rows regardless of batch
    size), one groupby folds them on-cluster, and only the folded
    depth x width cells (a few KiB at ANY corpus size) reach the driver.
    The estimate for a token is ``min_j counter[j, h_j(token)]`` — an upper
    bound on its true count (the CMS guarantee), which the SQL twin
    recomputes wholesale, so the gate pins both the sketch arithmetic and
    the hash kernel.

    The exact ``topn`` counts come from the same partial-counts-then-groupby
    shape as ``token_frequencies`` (vocabulary-sized shuffle); at real scale
    the sketch EXISTS to avoid that pass — here it doubles as the
    verification surface.  Output: (token, exact_n, est_n) with
    est_n >= exact_n always, ordered by (exact_n DESC, token).

    The reference has no corpus analytics (SURVEY.md S2.6); this is part of
    the training-data layer (frequency estimation without vocabulary state).
    """
    ds = sf_table(sf_dir, "documents", columns=["text"])

    def sketch_partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        if not len(codes):
            return pa.table(
                {
                    "j": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        # hash once per DISTINCT token (dictionary), count per occurrence
        tok_counts = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        buckets = _cms_buckets(dic.to_pylist(), depth, width)  # (d, |dic|)
        js, bs, cs = [], [], []
        for j in range(depth):
            cell = np.bincount(buckets[j], weights=tok_counts, minlength=width)
            nz = np.nonzero(cell)[0]
            js.append(np.full(len(nz), j, dtype=np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(cell[nz].astype(np.int64))
        return pa.table(
            {
                "j": pa.array(np.concatenate(js)),
                "b": pa.array(np.concatenate(bs)),
                "c": pa.array(np.concatenate(cs)),
            }
        )

    cells = (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["j", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # <= depth x width rows: constant-size at any corpus
    )
    counter = np.zeros((depth, width), dtype=np.int64)
    for r in cells:
        counter[r["j"], r["b"]] = r["c"]

    # exact top-n (verification surface; vocabulary-sized shuffle)
    def exact_partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        if not len(codes):
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        return pa.table({"token": dic, "n": pa.array(cnt)})

    top = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="exact_n"))
        .sort(["exact_n", "token"], descending=[True, False])
        .limit(topn)
        .take_all()
    )
    toks = [r["token"] for r in top]
    exact = [int(r["exact_n"]) for r in top]
    qb = _cms_buckets(toks, depth, width)
    est = [int(counter[np.arange(depth), qb[:, ti]].min()) for ti in range(len(toks))]
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "exact_n": pa.array(exact, pa.int64()),
            "est_n": pa.array(est, pa.int64()),
        }
    )


KEYWORD_LIST = ("spark", "merge", "join", "filter", "window")


def keyword_hits(
    sf_dir: str, *, keywords: tuple[str, ...] = KEYWORD_LIST
) -> rd.Dataset:
    """Dictionary tagging (the wordlist/brand-safety filter shape): per
    (source, keyword) — documents containing the keyword and total
    non-overlapping occurrence counts.  One corpus pass, one Arrow
    ``count_substring`` kernel per keyword per batch (the dictionary is
    compiled once per task, never shipped per row), map-side partials →
    one |sources|×|keywords| aggregate.  Plain-substring counting from
    the left, which `string_split`-based SQL counts reproduce exactly
    for any keyword list (no alternation-order ambiguity).

    Returns (source, keyword, n_docs, n_hits) sorted by (source, keyword).
    """
    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        src = batch.column("source").to_pylist()
        frames = []
        for kw in keywords:
            cnt = np.asarray(pc.count_substring(text, kw), dtype=np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "keyword": kw,
                        "n_docs": (cnt > 0).astype(np.int64),
                        "n_hits": cnt,
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        g = (
            df.groupby(["source", "keyword"], sort=False)[["n_docs", "n_hits"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "keyword"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_hits", alias_name="n_hits"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "keyword": batch.column("keyword"),
                "n_docs": batch.column("n_docs").cast(pa.int64()),
                "n_hits": batch.column("n_hits").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["source", "keyword"])


def keyword_hits_sql(keywords: tuple[str, ...] = KEYWORD_LIST) -> str:
    """Generated twin: one VALUES row per keyword; occurrence count =
    len(string_split(text, kw)) − 1 (non-overlapping, same as Arrow's
    count_substring)."""
    vals = ", ".join(f"('{k}')" for k in sorted(keywords))
    return f"""
        WITH kw(keyword) AS (VALUES {vals}),
        per_doc AS (
          SELECT d.source, kw.keyword,
                 (len(string_split(coalesce(d.text, ''), kw.keyword)) - 1)::BIGINT
                   AS hits
          FROM documents d CROSS JOIN kw
        )
        SELECT source, keyword,
               count(*) FILTER (WHERE hits > 0)::BIGINT AS n_docs,
               sum(hits)::BIGINT AS n_hits
        FROM per_doc
        GROUP BY 1, 2
        ORDER BY source, keyword
    """


_JSD_Q40 = 1099511627776.0  # 2^40 — the shared ln-grid quantum


def source_jsd_matrix(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Pairwise Jensen–Shannon divergence between source unigram
    distributions — the domain-similarity matrix that drives mixture
    weighting (DoReMi-style reweighting, slice dedup budgets) beside
    `source_vocab_overlap`'s set view.

    Every per-(token, pair) contribution
        j = ½·p_a·ln(p_a/m) + ½·p_b·ln(p_b/m),  m = (p_a+p_b)/2
    is computed in ONE float64 expression (operand order identical to the
    twin), each half quantized to round_even(x·2^40) int64, so pair
    divergences are exact order-free integer sums — the bigram-LM grid
    convention.  JSD with ln is bounded by ln 2, so jsd_q40 ≤ 0.70·2^40.

    Scale shape: per-batch (source, token) count partials (one dictionary
    pass per batch) → ONE crc-token-bucket shuffle; each bucket folds its
    tokens' per-source counts and emits per-PAIR partial integer sums
    (sources² fan-out per token — corpus-slice cardinality, the
    `source_vocab_overlap` budget); totals are a sources-sized broadcast.
    Returns (source_a, source_b, jsd_q40) for source_a < source_b, sorted.
    """
    import zlib

    import ray
    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def count_rows(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        src = np.array(batch.column("source").to_pylist(), dtype=object)[rows]
        toks = np.array(dic.to_pylist(), dtype=object)[codes]
        import pandas as pd

        g = (
            pd.DataFrame({"source": src, "token": toks})
            .groupby(["source", "token"], sort=False)
            .size()
            .reset_index(name="n")
        )
        tb = np.array(
            [zlib.crc32(t.encode("utf-8")) % num_buckets for t in g["token"]],
            dtype=np.int64,
        )
        return pa.table(
            {
                "tbkt": pa.array(tb),
                "token": pa.array(g["token"], pa.string()),
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    counted = ds.map_batches(count_rows, batch_format="pyarrow").materialize()
    totals_rows = (
        counted.groupby("source").aggregate(Sum("n", alias_name="nt")).take_all()
    )
    totals = {r["source"]: int(r["nt"]) for r in totals_rows}
    sources = sorted(totals)
    tot_ref = ray.put((sources, totals))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        srcs, tot = ray.get(tot_ref)
        s_idx = {s: i for i, s in enumerate(srcs)}
        nt = np.array([tot[s] for s in srcs], dtype=np.float64)
        df = group.select(["token", "source", "n"]).to_pandas()
        # fold duplicate (source, token) partials from different batches
        df = df.groupby(["token", "source"], sort=False)["n"].sum().reset_index()
        empty = pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "jq": pa.array([], pa.int64()),
            }
        )
        if not len(df):
            return empty
        toks, tinv = np.unique(df["token"].to_numpy(), return_inverse=True)
        sidx = df["source"].map(s_idx).to_numpy()
        cnt = np.zeros((len(toks), len(srcs)), dtype=np.int64)
        cnt[tinv, sidx] = df["n"].to_numpy()
        p = cnt / nt[None, :]  # (tokens × sources) float64
        acc = np.zeros((len(srcs), len(srcs)), dtype=np.int64)
        for a in range(len(srcs)):
            pa_col = p[:, a]
            for b in range(a + 1, len(srcs)):
                pb_col = p[:, b]
                m = (pa_col + pb_col) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    ja = np.where(
                        pa_col > 0,
                        np.round(0.5 * pa_col * np.log(pa_col / m) * _JSD_Q40),
                        0.0,
                    )
                    jb = np.where(
                        pb_col > 0,
                        np.round(0.5 * pb_col * np.log(pb_col / m) * _JSD_Q40),
                        0.0,
                    )
                acc[a, b] = int(ja.astype(np.int64).sum()) + int(jb.astype(np.int64).sum())
        ia, ib = np.triu_indices(len(srcs), 1)
        return pa.table(
            {
                "source_a": pa.array([srcs[i] for i in ia], pa.string()),
                "source_b": pa.array([srcs[j] for j in ib], pa.string()),
                "jq": pa.array(acc[ia, ib], pa.int64()),
            }
        )

    agg = (
        counted.groupby("tbkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("jq", alias_name="jsd_q40"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source_a": batch.column("source_a"),
                "source_b": batch.column("source_b"),
                "jsd_q40": batch.column("jsd_q40").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["source_a", "source_b"]
    )


_ZIPF_Q20 = 1048576.0  # 2^20 — fixed-point grid for the ln regression


def zipf_slope_by_source(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Zipf rank–frequency slope per source: the least-squares slope of
    ln(count) on ln(rank) over each source's token vocabulary (natural
    text sits near −1; synthetic/templated slices drift — a cheap corpus
    forensic beside `lexical_diversity`).

    Exactness: ln(rank) and ln(count) are quantized once to
    round_even(x·2^20) int64; the regression moments are exact integer
    sums (folded as arbitrary-precision Python ints via decimal-string
    partials, the `pearson_price_qty` pattern), and the single float
    division at the end uses the identical operand order as the HUGEINT
    twin.

    Scale shape: per-batch (source, token) count partials → ONE
    crc-token-bucket shuffle folds exact per-(source, token) counts; the
    global per-source rank over (count DESC, token) is the two-pass
    distributed ranking with ``63 − bit_length(count)`` as the
    order-preserving range bucket (monotone in count), so no global sort;
    each rank bucket emits constant-size moment partials.

    Returns (source, vocab, zipf_slope_ppm) sorted by source.
    """
    import math
    import zlib

    import ray
    from ray.data.aggregate import Count, Sum

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def count_rows(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        import pandas as pd

        src = np.array(batch.column("source").to_pylist(), dtype=object)[rows]
        toks = np.array(dic.to_pylist(), dtype=object)[codes]
        g = (
            pd.DataFrame({"source": src, "token": toks})
            .groupby(["source", "token"], sort=False)
            .size()
            .reset_index(name="n")
        )
        tb = np.array(
            [zlib.crc32(t.encode("utf-8")) % num_buckets for t in g["token"]],
            dtype=np.int64,
        )
        return pa.table(
            {
                "tbkt": pa.array(tb),
                "token": pa.array(g["token"], pa.string()),
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    def fold_counts(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.select(["source", "token", "n"]).to_pandas()
        g = df.groupby(["source", "token"], sort=False)["n"].sum().reset_index()
        n = g["n"].to_numpy().astype(np.int64)
        # order-preserving range bucket for the DESC-count ranking pass
        cb = 63 - np.frompyfunc(int.bit_length, 1, 1)(n.astype(object)).astype(
            np.int64
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "token": pa.array(g["token"], pa.string()),
                "n": pa.array(n),
                "cbkt": pa.array(cb),
            }
        )

    counted = (
        ds.map_batches(count_rows, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(fold_counts, batch_format="pyarrow")
        .materialize()
    )
    parts = (
        counted.groupby(["source", "cbkt"]).aggregate(Count(alias_name="m")).take_all()
    )
    offsets: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["source"], r["cbkt"])):
        offsets[(r["source"], r["cbkt"])] = acc.get(r["source"], 0)
        acc[r["source"]] = acc.get(r["source"], 0) + r["m"]
    off_ref = ray.put(offsets)

    def moments(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        src = group.column("source")[0].as_py()
        base = off[(src, int(group.column("cbkt")[0].as_py()))]
        n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        toks = np.array(group.column("token").to_pylist())
        order = np.lexsort((toks, -n))
        rk = np.empty(len(n), dtype=np.int64)
        rk[order] = base + np.arange(1, len(n) + 1)
        xq = np.round(np.log(rk.astype(np.float64)) * _ZIPF_Q20).astype(np.int64)
        yq = np.round(np.log(n.astype(np.float64)) * _ZIPF_Q20).astype(np.int64)
        m = len(n)
        sx, sy = int(xq.sum()), int(yq.sum())
        sxx = sxy = 0
        for i in range(0, m, 4096):  # overflow-safe int64 slices
            cx, cy = xq[i : i + 4096], yq[i : i + 4096]
            sxx += int((cx * cx).sum())
            sxy += int((cx * cy).sum())
        return pa.table(
            {
                "source": pa.array([src], pa.string()),
                "m": pa.array([str(m)], pa.string()),
                "sx": pa.array([str(sx)], pa.string()),
                "sy": pa.array([str(sy)], pa.string()),
                "sxx": pa.array([str(sxx)], pa.string()),
                "sxy": pa.array([str(sxy)], pa.string()),
            }
        )

    rows = (
        counted.groupby(["source", "cbkt"])
        .map_groups(moments, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[str, list[int]] = {}
    for r in rows:
        a = agg.setdefault(r["source"], [0, 0, 0, 0, 0])
        for i, k in enumerate(("m", "sx", "sy", "sxx", "sxy")):
            a[i] += int(r[k])
    sources = sorted(agg)
    vocab, slope = [], []
    for s in sources:
        m, sx, sy, sxx, sxy = agg[s]
        den = m * sxx - sx * sx
        if den == 0:
            slope.append(0)
        else:
            num = m * sxy - sx * sy
            slope.append(int(np.round(float(num) / float(den) * 1_000_000)))
        vocab.append(m)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(sources, pa.string()),
                "vocab": pa.array(vocab, pa.int64()),
                "zipf_slope_ppm": pa.array(slope, pa.int64()),
            }
        )
    )


def dataset_card(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """The one-row DATASET CARD summary a corpus release publishes:
    corpus size, token mass, slice count, exact-duplicate rate, and the
    Gopher / C4 quality keep-rates — every signal from ONE corpus pass
    (the fused-hygiene principle of `curate_training_mix`), with the
    distinct-text count folded through one sha-bucket shuffle.

    All rates are exact integer ppm.  Returns (n_docs, n_tokens,
    n_sources, n_distinct_texts, dup_rate_ppm, gopher_pass_ppm,
    c4_keep_ppm); the twin recomputes every component wholesale from the
    same rule expressions as the component operators' twins.
    """
    import hashlib as _hl

    from ray.data.aggregate import Sum

    from .decontam import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        _c4_flags_batch,
        gopher_quality_signals_batch,
    )

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        m = len(texts)
        ntok = int(
            pc.sum(
                pc.count_substring_regex(
                    pc.fill_null(batch.column("text").combine_chunks(), ""), r"\S+"
                )
            ).as_py()
            or 0
        )
        # gopher pass (mirrors gopher_quality_flags' rounded rule; the
        # card's own twin recomputes it, so drift is caught either way)
        nw, sl, na, ns, sym = gopher_quality_signals_batch(texts)
        gp = 0
        for w, s, a, st, sy in zip(
            nw.tolist(), sl.tolist(), na.tolist(), ns.tolist(), sym.tolist()
        ):
            if w == 0:
                continue
            ml = round(float(s) / float(w), 6)
            af = round(float(a) / float(w), 6)
            sr = round(float(sy) / float(w), 6)
            if (
                GOPHER_MIN_WORDS <= w <= GOPHER_MAX_WORDS
                and GOPHER_MIN_MEAN_WORD_LEN <= ml <= GOPHER_MAX_MEAN_WORD_LEN
                and af >= GOPHER_MIN_ALPHA_FRAC
                and sr <= GOPHER_MAX_SYMBOL_RATIO
                and st >= GOPHER_MIN_STOPWORDS
            ):
                gp += 1
        c4 = _c4_flags_batch(batch.select(["doc_id", "text"]))
        c4n = int(pc.sum(c4.column("c4_keep")).as_py() or 0)
        keys = sorted({_hl.sha1((t or "").encode("utf-8")).hexdigest() for t in texts})
        srcs = sorted({s for s in batch.column("source").to_pylist()})
        n1 = len(keys)
        n2 = len(srcs)
        return pa.table(
            {
                "kind": pa.array([0] + [1] * n1 + [2] * n2, pa.int64()),
                "bkt": pa.array(
                    [0] + [int(k[:8], 16) % num_buckets for k in keys] + [0] * n2,
                    pa.int64(),
                ),
                "key": pa.array([""] + keys + srcs, pa.string()),
                "n_docs": pa.array([m] + [0] * (n1 + n2), pa.int64()),
                "n_tokens": pa.array([ntok] + [0] * (n1 + n2), pa.int64()),
                "gopher_n": pa.array([gp] + [0] * (n1 + n2), pa.int64()),
                "c4_n": pa.array([c4n] + [0] * (n1 + n2), pa.int64()),
            }
        )

    tagged = ds.map_batches(partials, batch_format="pyarrow").materialize()
    scal = tagged.filter(expr="kind == 0").take_all()
    n_docs = sum(r["n_docs"] for r in scal)
    n_tokens = sum(r["n_tokens"] for r in scal)
    gopher_n = sum(r["gopher_n"] for r in scal)
    c4_n = sum(r["c4_n"] for r in scal)
    sources = {r["key"] for r in tagged.filter(expr="kind == 2").take_all()}

    def bucket_distinct(group: pa.Table) -> pa.Table:
        g = group.filter(pc.equal(group.column("kind"), 1))
        ks = set(g.column("key").to_pylist())
        return pa.table({"d": pa.array([len(ks)], pa.int64())})

    dparts = (
        tagged.filter(expr="kind == 1")
        .groupby("bkt")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .take_all()
    )
    n_distinct = sum(r["d"] for r in dparts)
    denom = max(n_docs, 1)
    return rd.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_tokens": pa.array([n_tokens], pa.int64()),
                "n_sources": pa.array([len(sources)], pa.int64()),
                "n_distinct_texts": pa.array([n_distinct], pa.int64()),
                "dup_rate_ppm": pa.array(
                    [(n_docs - n_distinct) * 1_000_000 // denom], pa.int64()
                ),
                "gopher_pass_ppm": pa.array(
                    [gopher_n * 1_000_000 // denom], pa.int64()
                ),
                "c4_keep_ppm": pa.array([c4_n * 1_000_000 // denom], pa.int64()),
            }
        )
    )


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """Language-ID confusion against the labeled ``lang`` column: per
    (lang_label, lang_detected), document counts — the detector-quality
    matrix that decides whether the heuristic can gate a language filter
    (`langid_counts` gives the marginals; this gives the errors).
    Shuffle-free map + one labels×langs-sized aggregate; identical
    stopword-score heuristic as `langid_batch` on both sides.

    Returns (lang_label, lang_detected, n_docs) sorted.
    """
    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, "documents", columns=["lang", "text"])

    def detect(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pred = langid_batch(batch.column("text").to_pylist())
        df = pd.DataFrame(
            {
                "lang_label": [
                    (s or "") for s in batch.column("lang").to_pylist()
                ],
                "lang_detected": pred,
            }
        )
        g = (
            df.groupby(["lang_label", "lang_detected"], sort=False)
            .size()
            .reset_index(name="n_docs")
        )
        return pa.table(
            {
                "lang_label": pa.array(g["lang_label"], pa.string()),
                "lang_detected": pa.array(g["lang_detected"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            }
        )

    agg = (
        ds.map_batches(detect, batch_format="pyarrow")
        .groupby(["lang_label", "lang_detected"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_label": batch.column("lang_label"),
                "lang_detected": batch.column("lang_detected"),
                "n_docs": batch.column("n_docs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["lang_label", "lang_detected"]
    )


def hapax_rate_by_source(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Hapax legomena rate per source — the share of each source's
    vocabulary occurring exactly ONCE (Heaps-law health next to
    `zipf_slope_by_source`): a high hapax rate means open vocabulary
    (good for coverage, expensive for tokenizers), a collapsing one
    means templated/duplicated text.

    Scale shape: one corpus pass emits per-batch (source, token,
    occurrence-count) partials via the shared `_token_occurrences`
    dictionary primitive; tokens bucket by ``crc32(token) % B`` so each
    bucket sees ALL occurrences of its tokens and folds exact global
    (source, token) counts locally, emitting only sources-sized
    (n_distinct, n_hapax) partials.  Returns
    (source, n_distinct_tokens, n_hapax, hapax_ppm) sorted by source.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def occ_partials(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        key = si * nd + codes
        ukey, counts = np.unique(key, return_counts=True)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        crc = np.fromiter(
            (zlib.crc32(t.encode()) % num_buckets for t in dic.to_pylist()),
            dtype=np.int64,
            count=nd,
        )
        return pa.table(
            {
                "tbkt": pa.array(crc[ut]),
                "token": pc.take(dic, pa.array(ut)),
                "source": pc.take(senc.dictionary, pa.array(us)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        ti = np.asarray(tenc.indices, dtype=np.int64)
        si = np.asarray(senc.indices, dtype=np.int64)
        n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        nt = max(len(tenc.dictionary), 1)
        key = si * nt + ti
        order = np.argsort(key, kind="stable")
        key, ns = key[order], n[order]
        ukey, starts = np.unique(key, return_index=True)
        tot = np.add.reduceat(ns, starts) if len(key) else np.array([], np.int64)
        us = (ukey // nt).astype(np.int64)
        sdic = senc.dictionary.to_pylist()
        out_src, out_d, out_h = [], [], []
        for s in range(len(sdic)):
            sel = us == s
            if not sel.any():
                continue
            out_src.append(sdic[s])
            out_d.append(int(sel.sum()))
            out_h.append(int((tot[sel] == 1).sum()))
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "nd": pa.array(out_d, pa.int64()),
                "nh": pa.array(out_h, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(occ_partials, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("nd", alias_name="n_distinct_tokens"),
            Sum("nh", alias_name="n_hapax"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_distinct_tokens").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        nh = batch.column("n_hapax").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "hapax_ppm", pa.array(nh * 1_000_000 // np.maximum(nd, 1))
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def hourly_approx_uniques(sf_dir: str) -> rd.Dataset:
    """Approximate distinct ACTIVE USERS per hour via mergeable HLL
    sketches — the windowed-sketch composition every streaming metrics
    layer runs (exact hourly COUNT(DISTINCT) needs a user×hour shuffle;
    the sketch needs one 4 KiB register row per hour per block, and
    yesterday's registers merge with today's for free).

    Each batch emits one (hour, registers) row per hour seen; the
    groupby max-folds registers elementwise.  The register fold is
    associative/commutative, so the estimate is bit-deterministic across
    batchings — the DuckDB twin RECOMPUTES registers + estimate wholesale
    (md5-64 hash, exact-integer harmonic sum — the `approx_distinct`
    computed-twin contract) and `oracle_dedup.hll_hourly_users` pins the
    same rows in pytest.  Returns (hour, approx_unique).
    """
    from ..functions import sketch

    ds = sf_table(sf_dir, "events", columns=["ts", "user_id"])

    def batch_sketches(batch: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(batch.column("ts"), unit="hour").to_pylist()
        uids = batch.column("user_id").to_pylist()
        groups: dict = {}
        for h, u in zip(hours, uids):
            groups.setdefault(h, []).append(str(u))
        hs, regs = [], []
        for h, vals in groups.items():
            hs.append(h)
            regs.append(sketch.hll_sketch_md5(vals).tobytes())
        return pa.table(
            {
                "hour": pa.array(hs, pa.timestamp("us")),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    partials = ds.map_batches(batch_sketches, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        from ..functions import sketch as sk

        sketches = [
            np.frombuffer(b, dtype=np.uint8) for b in group.column("regs").to_pylist()
        ]
        est = sk.hll_count(sk.hll_merge(sketches))
        return pa.table(
            {
                "hour": pa.array([group.column("hour")[0].as_py()], pa.timestamp("us")),
                "approx_unique": pa.array([est], pa.int64()),
            }
        )

    return partials.groupby("hour").map_groups(merge, batch_format="pyarrow")


def hourly_uniques_digest(sf_dir: str) -> "pa.Table":
    """Digest gate over `hourly_approx_uniques` (the
    `approx_distinct_digest` contract: COMPUTED DuckDB twin recomputing
    registers, estimate and md5-fold wholesale; sequential oracle pins
    the rows in pytest)."""
    from .interpret import fold_digest

    ds = hourly_approx_uniques(sf_dir)

    def payload(batch):
        return pa.table(
            {
                "doc_id": pa.array(
                    [str(h) for h in batch["hour"].to_pylist()], pa.string()
                ),
                "payload": pa.array(
                    [str(n) for n in batch["approx_unique"].to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def readability_by_source(sf_dir: str) -> rd.Dataset:
    """Per-source Flesch reading-ease score (Flesch 1948 — the classic
    document-difficulty signal used as a corpus-quality filter axis).

    FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    over the SOURCE totals, with the three counts defined by pure RE2
    kernels so both sides are bitwise the same counters:

      * words      = matches of ``\\S+``       (the repo token contract)
      * sentences  = per-doc ``max(1, matches of [.!?]+)`` — a document
        with no terminal punctuation is one sentence (the standard
        fallback; without it a punctuation-free corpus degenerates to 0)
      * syllables  = matches of ``[aeiouyAEIOUY]+``  (vowel-group
        heuristic, case-class not case-fold — no lower() on either side,
        so no Unicode case-table dependency)

    Scale shape: one corpus pass emits per-batch per-source int64 partial
    sums (map-side combine — the shuffle moves ≤ sources rows per batch),
    a tiny ``groupby(source)`` folds them, and the final map computes ONE
    double expression per source with identical operand order to the SQL
    twin: ``206.835 - 1.015*(w/s) - 84.6*(y/w)`` with each integer cast to
    double BEFORE the divide (mirroring DuckDB's ``::DOUBLE`` casts),
    quantized to ppm half-even.  Degenerate sources (no sentences or no
    words) score 0 on both sides.
    """
    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text").combine_chunks(), "")
        w = np.asarray(pc.count_substring_regex(texts, _TOKEN_RE), dtype=np.int64)
        s = np.maximum(
            1, np.asarray(pc.count_substring_regex(texts, r"[.!?]+"), dtype=np.int64)
        )
        y = np.asarray(
            pc.count_substring_regex(texts, r"[aeiouyAEIOUY]+"), dtype=np.int64
        )
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        nsrc = len(senc.dictionary)
        cols = {"n_docs": np.ones(len(si), np.int64), "n_words": w,
                "n_sentences": s, "n_syllables": y}
        out = {"source": senc.dictionary}
        for name, vals in cols.items():
            acc = np.zeros(nsrc, dtype=np.int64)  # int64-exact partials
            np.add.at(acc, si, vals)
            out[name] = pa.array(acc, pa.int64())
        return pa.table(out)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_sentences", alias_name="n_sentences"),
            Sum("n_syllables", alias_name="n_syllables"),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        w = batch.column("n_words").to_numpy(zero_copy_only=False)
        s = batch.column("n_sentences").to_numpy(zero_copy_only=False)
        y = batch.column("n_syllables").to_numpy(zero_copy_only=False)
        ppm = np.zeros(len(w), dtype=np.int64)
        ok = (w > 0) & (s > 0)
        if ok.any():
            wf, sf, yf = (v.astype(np.float64) for v in (w, s, y))
            v = 206.835 - 1.015 * (wf[ok] / sf[ok]) - 84.6 * (yf[ok] / wf[ok])
            ppm[ok] = np.round(v * 1_000_000).astype(np.int64)
        return batch.append_column("fre_ppm", pa.array(ppm, pa.int64()))

    return agg.map_batches(score, batch_format="pyarrow").sort("source")


def encoding_audit(sf_dir: str) -> rd.Dataset:
    """Per-source character-hygiene audit — the encoding-sanity pass every
    web-scale ingest runs before trusting a crawl slice: counts of C0
    control characters (excluding \\t \\n \\r), U+FFFD replacement
    characters (the mojibake tell), NBSP, and zero-width characters
    (ZWSP/ZWNJ/ZWJ/BOM), plus the number of documents flagged by ANY of
    them.  All-integer output — no float anywhere — and every counter is
    a pure RE2 class evaluated bitwise-identically by pyarrow and the
    DuckDB twin (single-quoted SQL literals pass the ``\\x{...}`` escapes
    through to RE2 untouched).

    A fully clean corpus (the synthetic tables) legitimately reports
    zeros in every hygiene column — ``n_docs`` / ``n_chars_total`` carry
    the per-source variance; the planted-dirty-docs pytest pins the
    non-zero behavior.  Scale shape: one pass, per-batch ``np.add.at``
    int64 partials per source, a tiny source-keyed aggregate.
    """
    _CONTROL = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
    _REPLACE = "\\x{FFFD}"
    _NBSP = "\\x{00A0}"
    _ZWIDTH = "[\\x{200B}-\\x{200D}\\x{FEFF}]"

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text").combine_chunks(), "")
        ctl = np.asarray(pc.count_substring_regex(texts, _CONTROL), dtype=np.int64)
        rep = np.asarray(pc.count_substring_regex(texts, _REPLACE), dtype=np.int64)
        nb = np.asarray(pc.count_substring_regex(texts, _NBSP), dtype=np.int64)
        zw = np.asarray(pc.count_substring_regex(texts, _ZWIDTH), dtype=np.int64)
        nch = np.asarray(pc.utf8_length(texts), dtype=np.int64)
        flagged = ((ctl + rep + nb + zw) > 0).astype(np.int64)
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        nsrc = len(senc.dictionary)
        cols = {
            "n_docs": np.ones(len(si), np.int64),
            "n_chars_total": nch,
            "n_control": ctl,
            "n_replacement": rep,
            "n_nbsp": nb,
            "n_zero_width": zw,
            "n_docs_flagged": flagged,
        }
        out = {"source": senc.dictionary}
        for name, vals in cols.items():
            acc = np.zeros(nsrc, dtype=np.int64)
            np.add.at(acc, si, vals)
            out[name] = pa.array(acc, pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars_total", alias_name="n_chars_total"),
            Sum("n_control", alias_name="n_control"),
            Sum("n_replacement", alias_name="n_replacement"),
            Sum("n_nbsp", alias_name="n_nbsp"),
            Sum("n_zero_width", alias_name="n_zero_width"),
            Sum("n_docs_flagged", alias_name="n_docs_flagged"),
        )
        .sort("source")
    )


def compression_ratio_hist(sf_dir: str) -> rd.Dataset:
    """Per-source histogram of zlib COMPRESSION RATIOS — the classic
    cheap-repetition quality signal (text that compresses far better than
    prose is boilerplate/template spam; text that barely compresses is
    noise), used alongside the Gopher/C4 heuristics when curating web
    corpora.

    Per doc: ``ratio_pct = len(zlib.compress(utf8, level=6)) * 100 //
    len(utf8)`` (integer floor — exact), bucketed into
    ``bucket = min(ratio_pct, 119) // 10`` (0..11, the open top bucket
    catching incompressible + overhead-dominated tiny docs).  Empty/null
    texts are excluded (no ratio exists).  Output
    (source, bucket, n_docs) sorted; gated through
    `compression_ratio_digest` (zlib is not SQL-expressible — pinned
    from the sequential `oracle_dedup.compression_hist_rows`, same
    level-6 zlib, which is deterministic for a fixed zlib build).

    Scale shape: one pass; the per-doc ``zlib.compress`` is the
    legitimate per-row C kernel (no vectorized form exists), counts
    combine map-side into ≤ sources×12 rows per batch, tiny groupby.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        counts: dict[tuple[str, int], int] = {}
        for s, t in zip(srcs, texts):
            if not t:
                continue
            raw = t.encode("utf-8")
            pct = len(zlib.compress(raw, 6)) * 100 // len(raw)
            b = min(pct, 119) // 10
            counts[(s, b)] = counts.get((s, b), 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "bucket": pa.array([k[1] for k in ks], pa.int64()),
                "n_docs": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort(["source", "bucket"])
    )


def compression_ratio_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `compression_ratio_hist`: one row
    (n_rows, digest) — md5 fold over (source·bucket, n_docs)."""
    from .interpret import DIGEST_MOD, row_digest

    rows = compression_ratio_hist(sf_dir).take_all()
    dg = 0
    for r in rows:
        dg = (
            dg + row_digest(f"{r['source']}\x1f{r['bucket']}", str(r["n_docs"]))
        ) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


ENTROPY_GRID = 1 << 20  # per-token c·ln(c) quantization (the q40-family grid)


def token_entropy_by_source(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Shannon entropy of each source's unigram distribution — the
    vocabulary-concentration signal next to `lexical_diversity`'s TTR
    (low entropy = template/boilerplate slice, high = diverse prose), via

        H = ln(N) − (Σ_tokens c·ln(c)) / N

    with every per-token contribution quantized ONCE to
    ``round_even(c·ln(c)·2^20)`` — the `source_jsd_matrix` grid
    convention — so the big sum is an exact order-free integer (carried
    as Python-int strings per bucket partial; per-token terms stay under
    int64 but vocabulary-sized sums do not), and H is ONE double
    expression with the twin's operand order, ppm half-even.

    Scale shape: the `lexical_diversity` token-bucket pattern — per-batch
    distinct (source, token) multiplicity rows, ONE crc-bucket shuffle
    (a pair lands wholly in one bucket, so the bucket computes the
    token's GLOBAL count), per-bucket per-source partials
    (≤ B×sources rows to the driver).  Returns
    (source, n_tokens, n_distinct_tokens, entropy_ppm) sorted.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "lbkt": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        ukey, cnt = np.unique(si * nd + codes, return_counts=True)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        sdic = senc.dictionary.to_pylist()
        tdic = dic.to_pylist()
        bkt = np.fromiter(
            (
                zlib.crc32(f"{sdic[a]}\x1f{tdic[b]}".encode()) % num_buckets
                for a, b in zip(us, ut)
            ),
            dtype=np.int64,
            count=len(ukey),
        )
        return pa.table(
            {
                "lbkt": pa.array(bkt),
                "source": pc.take(senc.dictionary, pa.array(us)),
                "token": pc.take(dic, pa.array(ut)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        ti = np.asarray(tenc.indices, dtype=np.int64)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nt = max(len(tenc.dictionary), 1)
        pair = si * nt + ti
        upair, inv = np.unique(pair, return_inverse=True)
        ctot = np.zeros(len(upair), dtype=np.int64)
        np.add.at(ctot, inv, c)  # GLOBAL count per (source, token)
        cf = ctot.astype(np.float64)
        contrib = np.zeros(len(upair), dtype=np.int64)
        pos = ctot > 1  # c == 1 → c·ln(c) = 0 exactly
        contrib[pos] = np.round(cf[pos] * np.log(cf[pos]) * ENTROPY_GRID).astype(
            np.int64
        )
        src_of_pair = (upair // nt).astype(np.int64)
        ns = len(senc.dictionary)
        n_tok = np.zeros(ns, dtype=np.int64)
        np.add.at(n_tok, src_of_pair, ctot)
        n_dis = np.bincount(src_of_pair, minlength=ns).astype(np.int64)
        sq = [0] * ns
        for s_ix, q in zip(src_of_pair.tolist(), contrib.tolist()):
            sq[s_ix] += q  # Python ints: no overflow at any vocabulary
        return pa.table(
            {
                "source": senc.dictionary,
                "n_part": pa.array(n_tok),
                "d_part": pa.array(n_dis),
                "sq_part": pa.array([str(v) for v in sq], pa.string()),
            }
        )

    rows = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("lbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .take_all()  # ≤ num_buckets × sources partial rows
    )
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["source"], [0, 0, 0])
        a[0] += int(r["n_part"])
        a[1] += int(r["d_part"])
        a[2] += int(r["sq_part"])
    srcs = sorted(acc)
    ents = []
    for s in srcs:
        n, _, sq = acc[s]
        if n == 0:
            ents.append(0)
        else:
            h = np.log(float(n)) - (float(sq) / float(ENTROPY_GRID)) / float(n)
            ents.append(int(np.round(h * 1_000_000)))
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n_tokens": pa.array([acc[s][0] for s in srcs], pa.int64()),
                "n_distinct_tokens": pa.array([acc[s][1] for s in srcs], pa.int64()),
                "entropy_ppm": pa.array(ents, pa.int64()),
            }
        )
    )


def vocab_overlap_sketch(sf_dir: str) -> pa.Table:
    """Pairwise vocabulary overlap between sources via HLL SET ALGEBRA —
    the sketch counterpart of `source_vocab_overlap` (which pays a
    token-bucket shuffle for exact counts): per-source 4 KiB register
    arrays merge elementwise, the union sketch of a pair is the
    elementwise max, and the intersection estimate falls out of
    inclusion–exclusion — the standard mergeable-sketch trick that
    estimates |A∩B| at any scale while moving only sources × 4 KiB.

    Every estimate is the integer-rounded HLL value (the
    `approx_distinct_texts` determinism contract), so the output is
    exact-integer and digest-gateable: (source_a, source_b, est_a,
    est_b, est_union, est_inter, jaccard_ppm) for a < b, where
    ``est_inter = est_a + est_b − est_union`` (kept raw — a slightly
    negative estimate is honest sketch behavior, clamped only in the
    jaccard) and ``jaccard_ppm = max(est_inter, 0)·10⁶ // est_union``.
    Tokens hash under the `hll_sketch_md5` rule (md5-64 of the token,
    the `_py_tokens` ASCII-'\\S+' tokenizer) and estimates fold on the
    exact-integer grid (`sketch.hll_count`), so the DuckDB twin
    RECOMPUTES registers, per-source and pairwise-union estimates and
    the digest wholesale; `oracle_dedup.vocab_sketch_rows` pins the same
    rows in pytest.
    """
    from ..functions import sketch

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def batch_sketches(batch: pa.Table) -> pa.Table:
        groups: dict[str, set] = {}
        for s, t in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            groups.setdefault(s, set()).update(_py_tokens(t or ""))
        srcs, regs = [], []
        for s, toks in groups.items():
            srcs.append(s)
            regs.append(sketch.hll_sketch_md5(sorted(toks)).tobytes())
        return pa.table(
            {"source": pa.array(srcs, pa.string()), "regs": pa.array(regs, pa.binary())}
        )

    rows = ds.map_batches(batch_sketches, batch_format="pyarrow").take_all()
    merged: dict[str, np.ndarray] = {}
    for r in rows:  # sources × blocks 4 KiB sketches: tiny driver fold
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["source"])
        merged[r["source"]] = (
            regs.copy() if cur is None else np.maximum(cur, regs)
        )
    srcs = sorted(merged)
    est = {s: sketch.hll_count(merged[s]) for s in srcs}
    out = {k: [] for k in ("source_a", "source_b", "est_a", "est_b",
                           "est_union", "est_inter", "jaccard_ppm")}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            u = sketch.hll_count(np.maximum(merged[a], merged[b]))
            inter = est[a] + est[b] - u
            out["source_a"].append(a)
            out["source_b"].append(b)
            out["est_a"].append(est[a])
            out["est_b"].append(est[b])
            out["est_union"].append(u)
            out["est_inter"].append(inter)
            out["jaccard_ppm"].append(max(inter, 0) * 1_000_000 // u if u else 0)
    return pa.table(
        {
            "source_a": pa.array(out["source_a"], pa.string()),
            "source_b": pa.array(out["source_b"], pa.string()),
            "est_a": pa.array(out["est_a"], pa.int64()),
            "est_b": pa.array(out["est_b"], pa.int64()),
            "est_union": pa.array(out["est_union"], pa.int64()),
            "est_inter": pa.array(out["est_inter"], pa.int64()),
            "jaccard_ppm": pa.array(out["jaccard_ppm"], pa.int64()),
        }
    )


def vocab_sketch_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `vocab_overlap_sketch`: (n_pairs, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = vocab_overlap_sketch(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        key = f"{t.column('source_a')[i].as_py()}\x1f{t.column('source_b')[i].as_py()}"
        pay = "\x1f".join(
            str(t.column(c)[i].as_py())
            for c in ("est_a", "est_b", "est_union", "est_inter", "jaccard_ppm")
        )
        dg = (dg + row_digest(key, pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_pairs": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


RAKE_MAX_PHRASE = 3
RAKE_TOP_K = 20
RAKE_GRID = 1 << 20


def rake_keyphrases(
    sf_dir: str, *, top_k: int = RAKE_TOP_K, num_buckets: int = 64
) -> pa.Table:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus — the
    unsupervised keyphrase family beside tf-idf's per-doc terms and PMI's
    bigram collocations: candidate phrases are maximal stopword-free
    token runs (lowercased, capped at ``RAKE_MAX_PHRASE`` words), a
    word's score is ``deg(w)/freq(w)`` over the candidate set, and a
    phrase scores the sum of its words.

    Exactness: word scores quantize ONCE to the q20 grid
    (``round_even(deg/freq · 2^20)``), so phrase scores and all folds
    are exact integers; ranking is (score_q20 desc, n desc, phrase asc).

    Scale shape — NO vocabulary-sized driver state (the `token_rarity`
    bucket-join pattern): one corpus pass emits per-batch combined
    (phrase, n) partials and (word, freq, deg) partials; a word-keyed
    groupby folds global word stats; phrase→word pairs route by the
    word's crc bucket to attach scores (shuffle moves phrase-word pairs,
    ≤ 3 per phrase), and a phrase-keyed groupby sums.  The global top-k
    is a sort+limit over phrase rows.  Returns
    (rank, phrase, n, score_q20); pinned via `rake_digest` from
    `oracle_dedup.rake_rows` (plain-Counter reimplementation).
    """
    import zlib

    from ..functions.textstats import STOPWORDS

    stop = frozenset(STOPWORDS["en"])
    ds = sf_table(sf_dir, "documents", columns=["text"])

    def phrase_rows(batch: pa.Table) -> tuple[dict, dict, dict]:
        phr: dict[tuple, int] = {}
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            toks = [w.lower() for w in _py_tokens(t or "")]
            run: list[str] = []
            runs = []
            for w in toks:
                if w in stop:
                    if run:
                        runs.append(run)
                        run = []
                else:
                    run.append(w)
            if run:
                runs.append(run)
            for r in runs:
                for i in range(0, len(r), RAKE_MAX_PHRASE):
                    ph = tuple(r[i : i + RAKE_MAX_PHRASE])
                    phr[ph] = phr.get(ph, 0) + 1
                    for w in ph:
                        freq[w] = freq.get(w, 0) + 1
                        deg[w] = deg.get(w, 0) + len(ph)
        return phr, freq, deg

    def partials(batch: pa.Table) -> pa.Table:
        phr, freq, deg = phrase_rows(batch)
        kinds, keys, n1, n2 = [], [], [], []
        for ph, n in phr.items():
            kinds.append(0)
            keys.append(" ".join(ph))
            n1.append(n)
            n2.append(0)
        for w in freq:
            kinds.append(1)
            keys.append(w)
            n1.append(freq[w])
            n2.append(deg[w])
        return pa.table(
            {
                "kind": pa.array(kinds, pa.int64()),
                "key": pa.array(keys, pa.string()),
                "n1": pa.array(n1, pa.int64()),
                "n2": pa.array(n2, pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["kind", "key"])
        .aggregate(Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2"))
    )

    def route(batch: pa.Table) -> pa.Table:
        # word rows route to their own bucket with their q20 score;
        # phrase rows explode to one row per word, routed the same way
        out = {"bkt": [], "is_score": [], "word": [], "phrase": [],
               "n": [], "score_q": []}
        for kind, key, n1, n2 in zip(
            batch.column("kind").to_pylist(),
            batch.column("key").to_pylist(),
            batch.column("n1").to_pylist(),
            batch.column("n2").to_pylist(),
        ):
            if kind == 1:
                sq = int(np.round(float(n2) / float(n1) * RAKE_GRID))
                out["bkt"].append(zlib.crc32(key.encode()) % num_buckets)
                out["is_score"].append(1)
                out["word"].append(key)
                out["phrase"].append("")
                out["n"].append(0)
                out["score_q"].append(sq)
            else:
                for w in key.split(" "):
                    out["bkt"].append(zlib.crc32(w.encode()) % num_buckets)
                    out["is_score"].append(0)
                    out["word"].append(w)
                    out["phrase"].append(key)
                    out["n"].append(n1)
                    out["score_q"].append(0)
        return pa.table(
            {
                "bkt": pa.array(out["bkt"], pa.int64()),
                "is_score": pa.array(out["is_score"], pa.int64()),
                "word": pa.array(out["word"], pa.string()),
                "phrase": pa.array(out["phrase"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "score_q": pa.array(out["score_q"], pa.int64()),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        score: dict[str, int] = {}
        for w, s_, k_ in zip(
            group.column("word").to_pylist(),
            group.column("score_q").to_pylist(),
            group.column("is_score").to_pylist(),
        ):
            if k_ == 1:
                score[w] = s_
        out = {"phrase": [], "n": [], "part_q": []}
        for w, ph, n, k_ in zip(
            group.column("word").to_pylist(),
            group.column("phrase").to_pylist(),
            group.column("n").to_pylist(),
            group.column("is_score").to_pylist(),
        ):
            if k_ == 0:
                out["phrase"].append(ph)
                out["n"].append(n)
                out["part_q"].append(score[w])
        return pa.table(
            {
                "phrase": pa.array(out["phrase"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "part_q": pa.array(out["part_q"], pa.int64()),
            }
        )

    scored = (
        folded.map_batches(route, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("phrase")
        .aggregate(Max("n", alias_name="n"), Sum("part_q", alias_name="score_q20"))
    )
    rows = (
        scored.sort(
            ["score_q20", "n", "phrase"], descending=[True, True, False]
        )
        .limit(top_k)
        .take_all()  # k rows — the only driver pull
    )
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
            "phrase": pa.array([r["phrase"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
            "score_q20": pa.array([int(r["score_q20"]) for r in rows], pa.int64()),
        }
    )


def rake_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `rake_keyphrases`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = rake_keyphrases(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        pay = "\x1f".join(
            str(t.column(c)[i].as_py()) for c in ("phrase", "n", "score_q20")
        )
        dg = (dg + row_digest(str(t.column("rank")[i].as_py()), pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- keyness: log-odds-ratio with Dirichlet prior ---------------------------


def keyness_log_odds(
    sf_dir: str, *, top_k: int = 10, num_buckets: int = 64
) -> rd.Dataset:
    """Per-source keyness: the ``top_k`` terms most over-represented in a
    source vs the REST of the corpus, ranked by the log-odds-ratio z-score
    with a symmetric Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    "Fightin' Words", α_w = 1):

        δ  = ln((c+1)/(n_s + V − c − 1)) − ln((y_r+1)/(n_r + V − y_r − 1))
        z  = δ / sqrt(1/(c+1) + 1/(y_r+1))

    with c the (source, token) count, y_r the rest-of-corpus token count,
    n_s / n_r the side totals and V the corpus vocabulary size — the
    corpus-comparison primitive behind "what is slice X actually made
    of" curation audits (tf-idf ranks within a document; keyness ranks
    against a contrast corpus).

    Exactness: every input to z is an exact integer off ONE token-bucket
    shuffle (a token's rows co-locate, so its global count is
    bucket-local; side totals and V fold from bucket-count-sized
    partials on the driver), and z itself is one float64 expression in
    the twin's operand order quantized ``round_even(z·2^40)`` — the BM25
    grid convention — so (z_q DESC, token) is a total order and the
    per-source top-k cut is deterministic.

    Scale shape: per-batch distinct (source, token) multiplicity rows →
    ONE crc(token) bucket shuffle → per-bucket fold emits scored pairs
    plus tiny stat partials; a per-block top-k prune bounds the final
    per-source selection at B·S·k rows.  No vocabulary ever sits on the
    driver.  Returns (source, rank, token, z_q) sorted.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])
    _Q40 = 1099511627776.0

    def pair_partials(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "tbkt": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        ukey, cnt = np.unique(si * nd + codes, return_counts=True)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        tdic = dic.to_pylist()
        per_tok = np.array(
            [zlib.crc32(t.encode("utf-8")) % num_buckets for t in tdic],
            dtype=np.int64,
        )
        return pa.table(
            {
                "tbkt": pa.array(per_tok[ut]),
                "source": pc.take(senc.dictionary, pa.array(us)),
                "token": pc.take(dic, pa.array(ut)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        """Global (source, token) counts + per-token global counts of this
        bucket (kind=0 rows), plus per-source token-total partials
        (kind=1) and the bucket's distinct-token count (kind=2)."""
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        ti = np.asarray(tenc.indices, dtype=np.int64)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nt = max(len(tenc.dictionary), 1)
        pair = si * nt + ti
        order = np.argsort(pair, kind="stable")
        sp = pair[order]
        new = np.concatenate([[True], sp[1:] != sp[:-1]])
        starts = np.nonzero(new)[0]
        pc_sum = np.add.reduceat(c[order], starts)
        p_src = (sp[starts] // nt).astype(np.int64)
        p_tok = (sp[starts] % nt).astype(np.int64)
        y_tok = np.zeros(nt, np.int64)
        np.add.at(y_tok, p_tok, pc_sum)
        ns = len(senc.dictionary)
        t_part = np.zeros(ns, np.int64)
        np.add.at(t_part, si, c)
        n_pairs, n_src = len(starts), ns
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.zeros(n_pairs, np.int64),
                            np.ones(n_src, np.int64),
                            np.array([2], np.int64),
                        ]
                    )
                ),
                "source": pa.concat_arrays(
                    [
                        pc.take(senc.dictionary, pa.array(p_src)),
                        senc.dictionary,
                        pa.array([""], pa.string()),
                    ]
                ),
                "token": pa.concat_arrays(
                    [
                        pc.take(tenc.dictionary, pa.array(p_tok)),
                        pa.nulls(n_src, pa.string()),
                        pa.nulls(1, pa.string()),
                    ]
                ),
                "c": pa.array(
                    np.concatenate([pc_sum, t_part, np.array([nt], np.int64)])
                ),
                "y": pa.array(
                    np.concatenate(
                        [y_tok[p_tok], np.zeros(n_src, np.int64), np.zeros(1, np.int64)]
                    )
                ),
            }
        )

    folded = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .materialize()
    )
    stats = folded.filter(expr="kind > 0").take_all()
    n_s: dict[str, int] = {}
    v_total = 0
    for r in stats:
        if r["kind"] == 1:
            n_s[r["source"]] = n_s.get(r["source"], 0) + r["c"]
        else:
            v_total += r["c"]
    n_total = sum(n_s.values())
    import ray as _ray

    ns_ref = _ray.put((n_s, v_total, n_total))

    def score(batch: pa.Table) -> pa.Table:
        from .joins import _get_broadcast

        ns_map, V, n = _get_broadcast(ns_ref)
        g = batch.filter(pc.equal(batch.column("kind"), 0))
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "z_q": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        src = g.column("source").to_pylist()
        c = g.column("c").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        y = g.column("y").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        nsv = np.array([ns_map[s] for s in src], dtype=np.float64)
        yr = y - c
        nr = n - nsv
        # one float64 expression, operand order identical to the twin
        z = (
            (
                np.log((c + 1.0) / (nsv + V - c - 1.0))
                - np.log((yr + 1.0) / (nr + V - yr - 1.0))
            )
            / np.sqrt(1.0 / (c + 1.0) + 1.0 / (yr + 1.0))
            * _Q40
        )
        zq = np.round(z).astype(np.int64)
        out = pa.table(
            {"source": g.column("source"), "token": g.column("token"), "z_q": pa.array(zq)}
        )
        # block-local prune: only a per-source top-k row can reach the cut
        df = out.to_pandas()
        df = (
            df.sort_values(["source", "z_q", "token"], ascending=[True, False, True])
            .groupby("source", sort=False)
            .head(top_k)
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def final_topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df.sort_values(["z_q", "token"], ascending=[False, True]).head(top_k)
        df["rank"] = range(1, len(df) + 1)
        return pa.Table.from_pandas(
            df[["source", "rank", "token", "z_q"]], preserve_index=False
        ).replace_schema_metadata(None)

    return (
        folded.map_batches(score, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
        .sort(["source", "rank"])
    )


def vocab_concentration(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Vocabulary-concentration moments per source: Yule's K and Simpson's
    repeat-rate — the second-moment complements of `lexical_diversity`'s
    TTR and `token_entropy_by_source`'s entropy (K is length-invariant,
    so it compares template-heavy slices across sizes):

        K·10^6  = (S₂ − N) · 10^10 // N²            (Yule 1944)
        D_ppb   = (S₂ − N) · 10^9  // (N² − N)      (Simpson repeat-rate)

    with N = Σc, S₂ = Σc² over the source's global token counts — ALL
    integer arithmetic (S₂ partials ride as Python-int strings, the
    `token_entropy_by_source` convention, so vocabulary-sized squared
    sums never overflow), floor-divided once on the driver; HUGEINT twin.

    Scale shape: identical to the entropy pass — one crc(source, token)
    bucket shuffle, per-bucket global pair counts, ≤ B×sources partial
    rows to the driver.  Returns (source, n_tokens, n_distinct_tokens,
    yule_k_micro, simpson_ppb) sorted.
    """
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        empty = pa.table(
            {
                "lbkt": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(rows):
            return empty
        senc = pc.dictionary_encode(batch.column("source").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)[rows]
        nd = len(dic)
        ukey, cnt = np.unique(si * nd + codes, return_counts=True)
        us = (ukey // nd).astype(np.int64)
        ut = (ukey % nd).astype(np.int64)
        sdic = senc.dictionary.to_pylist()
        tdic = dic.to_pylist()
        bkt = np.fromiter(
            (
                zlib.crc32(f"{sdic[a]}\x1f{tdic[b]}".encode()) % num_buckets
                for a, b in zip(us, ut)
            ),
            dtype=np.int64,
            count=len(ukey),
        )
        return pa.table(
            {
                "lbkt": pa.array(bkt),
                "source": pc.take(senc.dictionary, pa.array(us)),
                "token": pc.take(dic, pa.array(ut)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        ti = np.asarray(tenc.indices, dtype=np.int64)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nt = max(len(tenc.dictionary), 1)
        pair = si * nt + ti
        upair, inv = np.unique(pair, return_inverse=True)
        ctot = np.zeros(len(upair), dtype=np.int64)
        np.add.at(ctot, inv, c)  # GLOBAL count per (source, token)
        src_of_pair = (upair // nt).astype(np.int64)
        ns = len(senc.dictionary)
        n_tok = np.zeros(ns, dtype=np.int64)
        np.add.at(n_tok, src_of_pair, ctot)
        n_dis = np.bincount(src_of_pair, minlength=ns).astype(np.int64)
        m2 = [0] * ns
        for s_ix, cv in zip(src_of_pair.tolist(), ctot.tolist()):
            m2[s_ix] += cv * cv  # Python ints: exact at any vocabulary
        return pa.table(
            {
                "source": senc.dictionary,
                "n_part": pa.array(n_tok),
                "d_part": pa.array(n_dis),
                "m2_part": pa.array([str(v) for v in m2], pa.string()),
            }
        )

    rows = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("lbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .take_all()  # ≤ num_buckets × sources partial rows
    )
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["source"], [0, 0, 0])
        a[0] += int(r["n_part"])
        a[1] += int(r["d_part"])
        a[2] += int(r["m2_part"])
    srcs = sorted(acc)
    yk, sp = [], []
    for s in srcs:
        n, _, s2 = acc[s]
        yk.append((s2 - n) * 10_000_000_000 // (n * n) if n > 0 else 0)
        sp.append((s2 - n) * 1_000_000_000 // (n * n - n) if n > 1 else 0)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n_tokens": pa.array([acc[s][0] for s in srcs], pa.int64()),
                "n_distinct_tokens": pa.array([acc[s][1] for s in srcs], pa.int64()),
                "yule_k_micro": pa.array(yk, pa.int64()),
                "simpson_ppb": pa.array(sp, pa.int64()),
            }
        )
    )


# --- token dispersion (Gries' DP) -------------------------------------------
DISPERSION_TOP_K = 20


def token_dispersion(
    sf_dir: str, *, top_k: int = DISPERSION_TOP_K, num_buckets: int = 64
) -> rd.Dataset:
    """Gries' *deviation of proportions* (DP, Gries 2008) for the corpus's
    ``top_k`` tokens: how unevenly a token's occurrences spread over
    documents relative to document sizes —

        DP(w) = ½ Σ_docs |c_i(w)/c(w) − len_i/N|

    DP → 0 means the token tracks document mass (function words); DP → 1
    means it concentrates in few docs (topic/template/boilerplate
    markers).  Frequency says none of this — dispersion is the standard
    corpus-linguistics complement, and the template-detection signal
    beside `compression_ratio`.

    EXACT integers end-to-end: with the common denominator c·N,

        DP·2cN = Σ_{docs with w} |c_i·N − len_i·c|  +  c·(N − Σ_{occ} len_i)

    (the second term folds every non-occurring doc in closed form), all
    Python-int partials, one floor division to ppm at the end; HUGEINT
    twin.

    Scale shape: pass 1 = the `heavy_hitters`-style global top-k (token
    buckets → exact counts → k-row driver broadcast, tie-break (count
    DESC, token ASC)); pass 2 = one corpus pass computing per-batch
    partials Σ|c_i·N − len_i·c| and Σ len_i per tracked token (k-sized
    rows per batch).  Returns (token, c_total, dp_ppm) sorted by
    (dp_ppm DESC, token).
    """
    import ray as _ray

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    # pass 1a: global token counts via the shared bucket shuffle; global
    # N and the top-k cut
    def occ_partials(batch: pa.Table) -> pa.Table:
        import zlib

        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        if not len(rows):
            return pa.table(
                {
                    "tbkt": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        uc, cnt = np.unique(codes, return_counts=True)
        tdic = dic.to_pylist()
        bkt = np.fromiter(
            (zlib.crc32(tdic[i].encode()) % num_buckets for i in uc),
            dtype=np.int64,
            count=len(uc),
        )
        return pa.table(
            {
                "tbkt": pa.array(bkt),
                "token": pc.take(dic, pa.array(uc)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        tenc = pc.dictionary_encode(group.column("token").combine_chunks())
        ti = np.asarray(tenc.indices, dtype=np.int64)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nt = len(tenc.dictionary)
        tot = np.zeros(nt, np.int64)
        np.add.at(tot, ti, c)
        # block-local top-k prune: only a bucket top-k row can reach the cut
        names = tenc.dictionary.to_pylist()
        order = sorted(range(nt), key=lambda i: (-tot[i], names[i]))[:top_k]
        return pa.table(
            {
                "token": pc.take(tenc.dictionary, pa.array(order, pa.int64())),
                "c": pa.array(tot[order]),
            }
        )

    counted = (
        ds.map_batches(occ_partials, batch_format="pyarrow")
        .groupby("tbkt")
        .map_groups(bucket_counts, batch_format="pyarrow")
        .take_all()
    )  # ≤ B×k rows
    top = sorted(counted, key=lambda r: (-r["c"], r["token"]))[:top_k]
    tokens = [r["token"] for r in top]
    c_of = {r["token"]: r["c"] for r in top}

    # pass 1b: N (total corpus tokens) — counted was top-k-pruned per
    # bucket, so N comes from its own cheap scalar pass
    def len_partial(batch: pa.Table) -> pa.Table:
        rows, _, _ = _token_occurrences(batch.column("text").to_pylist())
        return pa.table({"n": pa.array([int(len(rows))], pa.int64())})

    n_total = int(
        sum(r["n"] for r in ds.map_batches(len_partial, batch_format="pyarrow").take_all())
    )
    ref = _ray.put((tokens, c_of, n_total))

    def dp_partials(batch: pa.Table) -> pa.Table:
        from .joins import _get_broadcast

        toks, cmap, N = _get_broadcast(ref)
        rows, codes, dic = _token_occurrences(batch.column("text").to_pylist())
        out_tok, out_num, out_len = [], [], []
        if len(rows):
            m = batch.num_rows
            dl = np.bincount(rows, minlength=m).astype(np.int64)
            wc = pc.index_in(pa.array(toks), value_set=dic)
            for j, w in enumerate(toks):
                code = wc[j].as_py()
                num = 0
                occ_len = 0
                if code is not None:
                    sel = codes == code
                    if sel.any():
                        hit_rows, ci = np.unique(rows[sel], return_counts=True)
                        c = cmap[w]
                        # Python ints: c_i·N and len_i·c stay exact at any N
                        for r_ix, cv in zip(hit_rows.tolist(), ci.tolist()):
                            num += abs(cv * N - int(dl[r_ix]) * c)
                            occ_len += int(dl[r_ix])
                out_tok.append(w)
                out_num.append(str(num))
                out_len.append(occ_len)
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "num": pa.array(out_num, pa.string()),
                "occ_len": pa.array(out_len, pa.int64()),
            }
        )

    parts = ds.map_batches(dp_partials, batch_format="pyarrow").take_all()
    num_of: dict[str, int] = {w: 0 for w in tokens}
    occ_of: dict[str, int] = {w: 0 for w in tokens}
    for r in parts:
        num_of[r["token"]] += int(r["num"])
        occ_of[r["token"]] += int(r["occ_len"])
    out = []
    for w in tokens:
        c = c_of[w]
        total_num = num_of[w] + c * (n_total - occ_of[w])
        dp_ppm = total_num * 1_000_000 // (2 * c * n_total)
        out.append((w, c, dp_ppm))
    out.sort(key=lambda t: (-t[2], t[0]))
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array([t[0] for t in out], pa.string()),
                "c_total": pa.array([t[1] for t in out], pa.int64()),
                "dp_ppm": pa.array([t[2] for t in out], pa.int64()),
            }
        )
    )


# --- quality-signal agreement matrix ----------------------------------------
_SIGNALS = ("n_chars", "n_tokens", "n_distinct_tokens", "n_alpha_chars")
_ALPHA_RE = _pyre.compile(r"[A-Za-z]")


def signal_agreement(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Pairwise SPEARMAN agreement between per-document quality signals
    (chars, tokens, distinct tokens, alpha chars) — the curation
    meta-analysis that says which cheap signals are redundant and which
    add independent information before you weight them into a filter
    (`dataset_card` reports the signals; this reports their geometry).

    Docs are uniquely keyed, so every ranking is the deterministic
    ``row_number() OVER (ORDER BY signal, doc_id)`` — no tie machinery
    needed (the `spearman_qty_price` uid trick degenerates to doc_id).
    Scale shape: one pass computes all four integer signals; each signal
    then gets the zipf-style two-pass ranking (bit_length range buckets
    → exclusive driver offsets → per-bucket sort) as FOUR CHAINED passes
    that carry the row, so rank columns accumulate in place; a final map
    folds Σd² per signal pair as decimal-string partials (Σd² ≤ n³).
    Returns C(4,2) = 6 rows (sig_a, sig_b, n, sum_d2, rho_ppm) sorted.
    """
    from itertools import combinations

    import ray as _ray

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def signals(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        rows, codes, dic = _token_occurrences(texts)
        m = len(texts)
        ntok = np.bincount(rows, minlength=m).astype(np.int64)
        ndis = np.zeros(m, np.int64)
        if len(rows):
            pair = rows * max(len(dic), 1) + codes
            urows = (np.unique(pair) // max(len(dic), 1)).astype(np.int64)
            ndis = np.bincount(urows, minlength=m).astype(np.int64)
        txt = pc.fill_null(batch.column("text").combine_chunks(), "")
        nch = np.asarray(pc.utf8_length(txt), dtype=np.int64)
        nal = np.fromiter(
            (len(_ALPHA_RE.findall(t or "")) for t in texts),
            dtype=np.int64,
            count=m,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": pa.array(nch),
                "n_tokens": pa.array(ntok),
                "n_distinct_tokens": pa.array(ndis),
                "n_alpha_chars": pa.array(nal),
            }
        )

    base = ds.map_batches(signals, batch_format="pyarrow").materialize()

    def offsets_for(sig: str) -> dict[int, int]:
        from ray.data.aggregate import Count

        def part(batch: pa.Table) -> pa.Table:
            v = batch.column(sig).combine_chunks().to_numpy(zero_copy_only=False)
            bl = np.array([int(x).bit_length() for x in v], dtype=np.int64)
            ub, cnt = np.unique(bl, return_counts=True)
            return pa.table({"b": pa.array(ub), "n": pa.array(cnt.astype(np.int64))})

        parts = (
            base.map_batches(part, batch_format="pyarrow")
            .groupby("b")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        off: dict[int, int] = {}
        acc = 0
        for r in sorted(parts, key=lambda r: r["b"]):
            off[r["b"]] = acc
            acc += r["n"]
        return off

    offs = {s: offsets_for(s) for s in _SIGNALS}
    off_ref = _ray.put(offs)

    cur = base
    for k, sig in enumerate(_SIGNALS):
        def bucketize(batch: pa.Table, *, sig=sig) -> pa.Table:
            v = batch.column(sig).combine_chunks().to_numpy(zero_copy_only=False)
            bl = np.array([int(x).bit_length() for x in v], dtype=np.int64)
            return batch.append_column("_bkt", pa.array(bl))

        def rank_pass(group: pa.Table, *, sig=sig) -> pa.Table:
            from .joins import _get_broadcast

            off = _get_broadcast(off_ref)[sig][group.column("_bkt")[0].as_py()]
            v = group.column(sig).combine_chunks().to_numpy(zero_copy_only=False)
            d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((d, v))
            rank = np.empty(len(v), np.int64)
            rank[order] = off + 1 + np.arange(len(v), dtype=np.int64)
            out = group.drop_columns(["_bkt"])
            return out.append_column(f"_r_{sig}", pa.array(rank))

        cur = (
            cur.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bkt")
            .map_groups(rank_pass, batch_format="pyarrow")
        )

    def d2_partials(batch: pa.Table) -> pa.Table:
        out = {"pair": [], "n": [], "sd2": []}
        ranks = {
            s: batch.column(f"_r_{s}").combine_chunks().to_numpy(zero_copy_only=False)
            for s in _SIGNALS
        }
        for a, b in combinations(_SIGNALS, 2):
            d = ranks[a] - ranks[b]
            out["pair"].append(f"{a}\x1f{b}")
            out["n"].append(batch.num_rows)
            out["sd2"].append(str(int(np.dot(d.astype(object), d.astype(object)))))
        return pa.table(
            {
                "pair": pa.array(out["pair"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "sd2": pa.array(out["sd2"], pa.string()),
            }
        )

    rows = cur.map_batches(d2_partials, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["pair"], [0, 0])
        a[0] += r["n"]
        a[1] += int(r["sd2"])
    out_rows = []
    for a, b in combinations(_SIGNALS, 2):
        n, sd2 = acc.get(f"{a}\x1f{b}", [0, 0])
        den = n * (n * n - 1)
        rho = (
            int(np.round((1.0 - float(6 * sd2) / float(den)) * 1_000_000))
            if den
            else 0
        )
        out_rows.append((a, b, n, str(sd2), rho))
    out_rows.sort()
    return rd.from_arrow(
        pa.table(
            {
                "sig_a": pa.array([r[0] for r in out_rows], pa.string()),
                "sig_b": pa.array([r[1] for r in out_rows], pa.string()),
                "n": pa.array([r[2] for r in out_rows], pa.int64()),
                "sum_d2": pa.array([r[3] for r in out_rows], pa.string()),
                "rho_ppm": pa.array([r[4] for r in out_rows], pa.int64()),
            }
        )
    )

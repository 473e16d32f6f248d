"""Distributed BPE vocabulary training (Sennrich et al. 2016 — public).

The classic subword-vocabulary trainer: pre-tokenize the corpus into words,
count word frequencies, then greedily merge the most frequent adjacent
symbol pair ``num_merges`` times, starting from characters plus an
end-of-word marker.  The merge list IS the tokenizer.

Scale shape — exactly how reference trainers (subword-nmt, HuggingFace
tokenizers) split the work:

1. the ONLY corpus-sized stage is the word-frequency count: per-batch
   partial counts (one RE2 split + ``dictionary_encode``), one
   vocabulary-keyed groupby, then a map-side top-``max_vocab_words`` prune
   (block-local top-V is a superset of the global top-V) + sort + limit —
   the driver receives a BOUNDED table (top-V by (count DESC, word ASC))
   no matter the corpus size;
2. the merge loop runs on that bounded word-frequency table — per-word
   Python over V entries × num_merges, corpus-independent (the same
   frequency-floor bound every practical BPE trainer applies).

Fully deterministic: counts are integers, the merge argmax tie-breaks by
(count DESC, (left, right) ASC).  Gated by a pinned-literal digest from an
INDEPENDENT sequential oracle (`oracle_dedup.bpe_merges` — per-doc Counter
over the raw texts, naive merge loop), the `kmeans_digest` pattern.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import sf_table

BPE_MERGES = 40
BPE_MAX_VOCAB = 65536
BPE_EOW = "</w>"


def merge_loop(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Greedy BPE merges over a (word, freq) table — shared by the pipeline
    and (deliberately NOT by the oracle, which reimplements it naively) the
    `bpe_train` driver step.  Returns (rank, left, right, merged,
    pair_count) rows; stops early when no adjacent pair remains."""
    from collections import defaultdict

    seqs: list[list[str]] = [list(w) + [BPE_EOW] for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    # incremental pair bookkeeping (the subword-nmt trick): counts once up
    # front, then per merge only the words CONTAINING the merged pair are
    # rescanned — value-identical to the full recount (argmax over the same
    # positive counts; pinned by the oracle-equality and hand-merge tests),
    # but O(affected words) instead of O(V) per merge.
    pairs: Counter[tuple[str, str]] = Counter()
    occ: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (seq, f) in enumerate(zip(seqs, freqs)):
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] += f
            occ[(a, b)].add(idx)
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best: tuple[str, str] | None = None
        best_cnt = 0
        for p, c in pairs.items():
            if c > 0 and (
                best is None or (-c, p) < (-best_cnt, best)
            ):
                best, best_cnt = p, c
        if best is None:
            break
        left, right = best
        merged = left + right
        for idx in list(occ.get(best, ())):
            seq, f = seqs[idx], freqs[idx]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] -= f
                occ[(a, b)].discard(idx)
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
                occ[(a, b)].add(idx)
        out.append((rank, left, right, merged, int(best_cnt)))
    return out


def _word_freq_table(
    sf_dir: str, *, max_vocab_words: int
) -> list[tuple[str, int]]:
    """Top-``max_vocab_words`` (word, count) by (count DESC, word ASC) —
    one corpus pass, bounded driver state."""
    from ..functions.tokenize import WORD_SPLIT, explode_tokens

    docs = sf_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        rows, codes, dic = explode_tokens(
            batch.column("text").to_pylist(), pattern=WORD_SPLIT, lower=True
        )
        if not len(codes):
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        return pa.table({"word": dic, "n": pa.array(cnt)})

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= max_vocab_words:
            return batch
        n = batch.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        words = np.asarray(batch.column("word").to_pylist(), dtype=object)
        order = np.lexsort((words, -n))[:max_vocab_words]
        return batch.take(pa.array(np.sort(order)))

    rows = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(prune, batch_format="pyarrow")
        .sort(["n", "word"], descending=[True, False])
        .limit(max_vocab_words)
        .take_all()
    )
    return [(r["word"], int(r["n"])) for r in rows]


def bpe_train(
    sf_dir: str,
    *,
    num_merges: int = BPE_MERGES,
    max_vocab_words: int = BPE_MAX_VOCAB,
) -> pa.Table:
    """Train a BPE merge list over the corpus.  Returns (rank, left, right,
    merged, pair_count) — ``num_merges`` rows (fewer if pairs run out)."""
    merges = merge_loop(
        _word_freq_table(sf_dir, max_vocab_words=max_vocab_words), num_merges
    )
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "merged": pa.array([m[3] for m in merges], pa.string()),
            "pair_count": pa.array([m[4] for m in merges], pa.int64()),
        }
    )


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of subwords the trained merge list leaves for ``word`` —
    canonical BPE application (subword-nmt / GPT-2 shape): repeatedly merge
    the LOWEST-rank adjacent pair present, all its occurrences left-to-right
    in one pass, until no adjacent pair is in the merge table."""
    seq = list(word) + [BPE_EOW]
    while len(seq) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(seq, seq[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        left, right = best_pair
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == left and seq[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


class _BpeEncoder:
    """Actor-pool encode stage: the rank table is deserialized ONCE per
    actor in ``__init__`` and the per-distinct-word subword counts are
    cached across batches (zipfian corpora hit the cache almost always —
    the same word-level memoization every production BPE tokenizer ships).
    ``__call__`` touches Python only per *distinct uncached* word; row
    arithmetic is numpy over dictionary codes."""

    def __init__(self, ranks_ref) -> None:
        import ray

        self.ranks: dict[tuple[str, str], int] = ray.get(ranks_ref)
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import WORD_SPLIT, explode_tokens

        ids = batch.column("doc_id")
        n = batch.num_rows
        rows, codes, dic = explode_tokens(
            batch.column("text").to_pylist(), pattern=WORD_SPLIT, lower=True
        )
        dic_py = dic.to_pylist()
        sub_per_word = np.empty(max(1, len(dic_py)), np.int64)
        for i, w in enumerate(dic_py):
            c = self.cache.get(w)
            if c is None:
                c = apply_merges(w, self.ranks)
                self.cache[w] = c
            sub_per_word[i] = c
        n_words = np.bincount(rows, minlength=n).astype(np.int64)
        n_subwords = np.zeros(n, np.int64)
        if len(rows):
            np.add.at(n_subwords, rows, sub_per_word[codes])
        return pa.table(
            {
                "doc_id": ids,
                "n_words": pa.array(n_words),
                "n_subwords": pa.array(n_subwords),
            }
        )


def bpe_encode_stats(
    sf_dir: str,
    *,
    num_merges: int = BPE_MERGES,
    max_vocab_words: int = BPE_MAX_VOCAB,
    concurrency: int = 4,
) -> rd.Dataset:
    """Train THEN tokenize: the full train→apply story of a production
    subword pipeline in one engine invocation.  Returns per-doc
    ``(doc_id, n_words, n_subwords)`` — the real token-counting surface a
    packing / budget-sampling stage consumes (the \\S+ counters elsewhere
    are its cheap approximation).

    Scale shape: `bpe_train`'s bounded word-frequency pass (the only
    corpus-sized training stage), a tiny rank table broadcast ONCE via
    ``ray.put``, then one shuffle-free actor-pool encode pass over the
    corpus with per-actor word caches.  No driver state beyond the merge
    table; output streams."""
    import ray

    merges = merge_loop(
        _word_freq_table(sf_dir, max_vocab_words=max_vocab_words), num_merges
    )
    ranks = {(l, r): rank for rank, l, r, _m, _c in merges}
    ranks_ref = ray.put(ranks)
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    # (1, N) autoscaling pool: min 1 leaves CPUs for the upstream read tasks
    # on small clusters (a fixed pool == num_cpus starves the read and
    # deadlocks the streaming executor — observed at the 4-CPU test scale).
    return docs.map_batches(
        _BpeEncoder,
        fn_constructor_args=(ranks_ref,),
        concurrency=(1, concurrency),
        num_cpus=1,
        batch_format="pyarrow",
    )


def bpe_encode_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `bpe_encode_stats` (pure-integer surface, no margin
    check needed).  Literal from the independent
    `oracle_dedup.bpe_encode_rows`."""
    from .interpret import fold_digest

    ds = bpe_encode_stats(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(
                    [
                        f"{w}:{s}"
                        for w, s in zip(
                            batch.column("n_words").to_pylist(),
                            batch.column("n_subwords").to_pylist(),
                        )
                    ],
                    pa.string(),
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def bpe_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `bpe_train` (pure integer/string surface — no
    float anywhere, so the pin needs no margin check).  Literal from the
    independent `oracle_dedup.bpe_merges`."""
    from .interpret import fold_digest

    t = bpe_train(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("rank"),
                "payload": pa.array(
                    [
                        f"{l}|{r}:{c}"
                        for l, r, c in zip(
                            batch.column("left").to_pylist(),
                            batch.column("right").to_pylist(),
                            batch.column("pair_count").to_pylist(),
                        )
                    ],
                    pa.string(),
                ),
            }
        )

    return fold_digest(
        rd.from_arrow(t).map_batches(payload, batch_format="pyarrow"), "payload"
    )

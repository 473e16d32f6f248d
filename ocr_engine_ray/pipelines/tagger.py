"""Multi-pattern regex attribute tagging + inline redaction (the
Dolma/CCNet-style corpus "tagger" family: PII counts, blocklist hits,
masking) as shuffle-free vectorized Ray Data passes.

Both kernels ride ``pyarrow.compute``'s RE2 engine
(``count_substring_regex`` / ``replace_substring_regex``) — the SAME
regex engine as DuckDB's ``regexp_extract_all`` / ``regexp_replace``,
so the SQL twins are bit-identical by construction (the repo's
established RE2-parity convention; see the tokenizer notes in
``textstats``).

Scale shape: ONE map pass over ``(doc_id, text)``, no shuffle, no
driver state.  The tagger dict is a plan-time constant shipped in the
task closure (pattern tables are KBs even at production blocklist
sizes); per batch the cost is T vectorized RE2 scans over the Arrow
string column.  The documented trade vs an Aho-Corasick automaton
(one combined scan for all patterns) is that T independent RE2 kernels
keep the hot loop inside Arrow C++ with zero per-row Python — for the
tagger counts an LLM-curation pass actually uses (T ≲ 100) the
vectorized form wins well before an automaton pays off.

Reference seam: the reference's only text-masking surface is the
inline-redaction mode (``app.py`` REDACT prompt mode, rebuilt in
``pipelines/modes.py``); this module is the beyond-reference
corpus-hygiene generalization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import sf_table

# Corpus-relevant defaults for the synthetic lexicon (non-vacuous at every
# sf); the PII presets below are exercised over a planted corpus in pytest.
DEFAULT_TAGGERS: dict[str, str] = {
    "tag_spark": r"\bspark\b",
    "tag_perf": r"\b(fast|slow)\b",
    "tag_struct": r"\b(table|column|row)\b",
}

# Dolma-style PII presets (counts only — masking goes through redact_digest).
PII_TAGGERS: dict[str, str] = {
    "pii_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "pii_ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "pii_phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def regex_tag(
    sf_dir: str, *, taggers: dict[str, str] | None = None
) -> rd.Dataset:
    """Per-doc non-overlapping match counts for every tagger pattern plus a
    ``tagged`` any-hit flag — the attribute table a quality-filter join
    consumes downstream.  Columns: ``doc_id``, one int64 count per tagger
    name, ``tagged`` (int64 0/1)."""
    tags = dict(taggers or DEFAULT_TAGGERS)

    def tag_batch(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "doc_id": batch.column("doc_id")
        }
        any_hit = None
        for name, pat in tags.items():
            n = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            cols[name] = n
            hit = pc.greater(n, 0)
            any_hit = hit if any_hit is None else pc.or_(any_hit, hit)
        cols["tagged"] = pc.cast(any_hit, pa.int64())
        return pa.table(cols)

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(tag_batch, batch_format="pyarrow")


def redact_digest(
    sf_dir: str,
    *,
    pattern: str = r"\b(customer|value)\b",
    replacement: str = "[MASK]",
) -> pa.Table:
    """Order-independent md5-fold digest of the corpus AFTER global regex
    masking — pins the full redacted-text surface through one shuffle-free
    pass (``fold_digest`` partials; only block-count scalars reach the
    driver).  Twin: the HUGEINT md5-fold over DuckDB
    ``regexp_replace(coalesce(text,''), pattern, replacement, 'g')``."""
    from .interpret import fold_digest

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def mask(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "masked": pc.replace_substring_regex(text, pattern, replacement),
            }
        )

    return fold_digest(docs.map_batches(mask, batch_format="pyarrow"), "masked")


PSEUDO_SALT = "s7"


def pseudonymize_user_activity(sf_dir: str, *, salt: str = PSEUDO_SALT) -> rd.Dataset:
    """PSEUDONYMIZATION: replace user ids with deterministic keyed
    surrogates while preserving joinability and aggregate shape — the
    governance pass next to `redact_digest` (that one masks free text;
    this one tokenizes KEYS so downstream analytics run without raw ids).

    The surrogate is the first 60 bits of ``md5(salt || ':' || user_id)``
    (deterministic → the same user maps to the same surrogate in every
    table and run; keyed → un-reversible without the salt).  Correctness
    is pinned by aggregating per surrogate: the distribution is identical
    to the per-user one with only the labels swapped — which the SQL twin
    recomputes exactly, and a bijectivity check rides in the tests.

    One map pass + one groupby (surrogate cardinality == user
    cardinality).  Returns (pseudo_id, n_events, value_cents) sorted by
    pseudo_id.
    """
    import hashlib

    import numpy as np

    from .analytics import _cents

    ev = sf_table(sf_dir, "events", columns=["user_id", "value"])

    def mask(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("user_id")))
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # hash per DISTINCT id per batch, not per row
        uu, inv = np.unique(uid, return_inverse=True)
        surr = np.array(
            [
                int(hashlib.md5(f"{salt}:{u}".encode()).hexdigest()[:15], 16)
                for u in uu
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "pseudo_id": pa.array(surr[inv]),
                "cents": _cents(batch.column("value")),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    agg = (
        ev.map_batches(mask, batch_format="pyarrow", batch_size=65536)
        .groupby("pseudo_id")
        .aggregate(Sum("one", alias_name="n_events"), Sum("cents", alias_name="value_cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pseudo_id": batch.column("pseudo_id").cast(pa.int64()),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "value_cents": batch.column("value_cents").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("pseudo_id")


def _luhn_ok(run: str) -> bool:
    """Luhn checksum (ISO/IEC 7812) — the payment-card validity test."""
    total = 0
    for i, ch in enumerate(reversed(run), start=1):
        d = ord(ch) - 48
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def luhn_pii_scan(sf_dir: str) -> rd.Dataset:
    """Payment-card-number PII scan — candidate digit runs (maximal
    ``[0-9]+`` runs of length 13–19, the PAN length range) validated by
    the Luhn checksum, counted per source: the standard
    regex-plus-checksum PII detector that plain `regex_tag` cannot
    express (a checksum is not a regular language).

    All-integer output (source, n_docs, n_digit_runs, n_luhn_valid,
    n_docs_flagged); a corpus with no long digit runs legitimately
    reports zeros everywhere except n_docs (the planted-PAN pytest pins
    the nonzero path).  The SQL twin computes the SAME checksum with a
    ``list_transform`` lambda over the run's digits — checksum algebra
    is exactly portable because it is pure integer arithmetic.

    Scale shape: one pass; per-doc regex findall + per-candidate O(19)
    checksum (candidates are rare by construction), map-side combined
    counts, tiny source-keyed aggregate.
    """
    import re as _re

    from ray.data.aggregate import Sum

    run_re = _re.compile(r"[0-9]+")
    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        counts: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            a = counts.setdefault(s, [0, 0, 0, 0])
            a[0] += 1
            if not t:
                continue
            doc_valid = 0
            for run in run_re.findall(t):
                if not (13 <= len(run) <= 19):
                    continue
                a[1] += 1
                if _luhn_ok(run):
                    a[2] += 1
                    doc_valid = 1
            a[3] += doc_valid
        ks = sorted(counts)
        return pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n_docs": pa.array([counts[k][0] for k in ks], pa.int64()),
                "n_digit_runs": pa.array([counts[k][1] for k in ks], pa.int64()),
                "n_luhn_valid": pa.array([counts[k][2] for k in ks], pa.int64()),
                "n_docs_flagged": pa.array([counts[k][3] for k in ks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_digit_runs", alias_name="n_digit_runs"),
            Sum("n_luhn_valid", alias_name="n_luhn_valid"),
            Sum("n_docs_flagged", alias_name="n_docs_flagged"),
        )
        .sort("source")
    )


# --- Aho-Corasick dictionary tagging (actor-pool stage) ---------------------


class AhoCorasickTagger:
    """Stateful dictionary tagger: builds the Aho-Corasick automaton
    (Aho & Corasick 1975) ONCE per actor in ``__init__`` and streams every
    batch through it in a single pass — the A4 actor-pool contract
    (`stages/extract.py`): setup cost is per-actor, never per batch.

    Single-pass multi-pattern matching is the scale path when the
    dictionary is large: `keyword_hits` runs one Arrow ``count_substring``
    C kernel PER KEYWORD per batch (O(|dict| · corpus) — unbeatable for a
    handful of brand terms), while the automaton walks the corpus once
    regardless of dictionary size (O(corpus + matches)).  Per-keyword
    counts keep `keyword_hits`' NON-OVERLAPPING (greedy-from-left)
    semantics, derived from the automaton's match end-positions, so the
    two operators are row-identical and share the generated SQL twin
    (pytest-pinned).
    """

    def __init__(self, keywords: tuple[str, ...]):
        self.keywords = list(keywords)
        self.lens = [len(k) for k in self.keywords]
        # trie as dicts: goto[state][ch] -> state; output[state] = [kw ids]
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for ki, kw in enumerate(self.keywords):
            s = 0
            for ch in kw:
                if ch not in goto[s]:
                    goto.append({})
                    out.append([])
                    goto[s][ch] = len(goto) - 1
                s = goto[s][ch]
            out[s].append(ki)
        # failure links, BFS order
        from collections import deque

        fail = [0] * len(goto)
        dq = deque(goto[0].values())
        while dq:
            s = dq.popleft()
            for ch, t in goto[s].items():
                dq.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                out[t] = out[t] + out[fail[t]]
        self.goto, self.fail, self.out = goto, fail, out
        # --- dense tables for the vectorized lockstep walk ------------------
        # character classes: 0 = "not in any keyword" (always routes to the
        # root), 1..C for each distinct keyword char; delta resolves every
        # failure chain at build time (standard AC-to-DFA conversion), so
        # the scan is ONE gather per character position across all docs.
        import numpy as np

        chars = sorted({ch for kw in self.keywords for ch in kw})
        self._lut_size = (max(ord(c) for c in chars) + 1) if chars else 1
        lut = np.zeros(self._lut_size, np.int32)
        for i, c in enumerate(chars, start=1):
            lut[ord(c)] = i
        self._lut = lut
        S, C = len(goto), len(chars)
        delta = np.zeros((S, C + 1), np.int32)
        from collections import deque as _dq

        order = list(goto[0].values())
        bfs = _dq(order)
        seen = set(order)
        while bfs:
            s = bfs.popleft()
            for t in goto[s].values():
                if t not in seen:
                    seen.add(t)
                    order.append(t)
                    bfs.append(t)
        for i, c in enumerate(chars, start=1):
            delta[0, i] = goto[0].get(c, 0)
        for s in order:  # BFS order: fail[s] already resolved
            for i, c in enumerate(chars, start=1):
                delta[s, i] = goto[s][c] if c in goto[s] else delta[fail[s], i]
        self._delta = delta
        deg = np.array([len(o) for o in out], np.int64)
        self._out_deg = deg
        self._out_ptr = np.concatenate([[0], np.cumsum(deg)])
        self._out_ids = np.array(
            [ki for o in out for ki in o], np.int64
        ) if deg.sum() else np.empty(0, np.int64)

    def _scan(self, text: str) -> list[list[int]]:
        """Per-keyword sorted match END indices (exclusive) in one pass."""
        ends: list[list[int]] = [[] for _ in self.keywords]
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for ki in out[s]:
                    ends[ki].append(i + 1)
        return ends

    def _scan_lockstep(self, texts: list[str]) -> dict[tuple[int, int], list[int]]:
        """Vectorized walk: all docs advance through the DFA in lockstep —
        one ``delta[states, cls[:, t]]`` gather per character position over
        the whole batch (the per-char Python loop of `_scan` was the
        round-4 bench tail).  Returns {(doc#, kw#): sorted match ends}."""
        import numpy as np

        out: dict[tuple[int, int], list[int]] = {}
        CH = 2_000_000  # cap the codepoint matrix at ~8 MB per chunk
        n_all = len(texts)
        base = 0
        while base < n_all:
            dlen_all = [len(t) for t in texts[base:]]
            take, cells = 0, 0
            lmax = 0
            for L in dlen_all:
                nx = max(lmax, L) * (take + 1)
                if take and nx > CH:
                    break
                take += 1
                lmax = max(lmax, L)
                cells = nx
            chunk = texts[base : base + take]
            dlen = np.array([len(t) for t in chunk], np.int64)
            Lmax = int(dlen.max()) if take else 0
            if Lmax == 0:
                base += take
                continue
            codes = np.zeros((take, Lmax), np.int32)
            for i, t in enumerate(chunk):
                if t:
                    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                    codes[i, : len(cp)] = cp.astype(np.int32)
            cls = np.where(
                codes < self._lut_size,
                self._lut[np.clip(codes, 0, self._lut_size - 1)],
                0,
            )
            states = np.zeros(take, np.int32)
            hd_parts, ht_parts, hs_parts = [], [], []
            deg = self._out_deg
            for t in range(Lmax):
                states = self._delta[states, cls[:, t]]
                m = (deg[states] > 0) & (t < dlen)
                if m.any():
                    w = np.nonzero(m)[0]
                    hd_parts.append(w)
                    ht_parts.append(np.full(len(w), t, np.int64))
                    hs_parts.append(states[w])
            if hd_parts:
                hd = np.concatenate(hd_parts)
                ht = np.concatenate(ht_parts)
                hs = np.concatenate(hs_parts)
                g = deg[hs]
                total = int(g.sum())
                ptr = self._out_ptr[hs]
                cum = np.cumsum(g)
                within = np.arange(total) - np.repeat(cum - g, g)
                kw_ids = self._out_ids[np.repeat(ptr, g) + within]
                doc_r = np.repeat(hd, g) + base
                end_r = np.repeat(ht + 1, g)
                order = np.lexsort((end_r, kw_ids, doc_r))
                for o in order:
                    out.setdefault((int(doc_r[o]), int(kw_ids[o])), []).append(
                        int(end_r[o])
                    )
            base += take
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        texts = [t or "" for t in batch.column("text").to_pylist()]
        src = batch.column("source").to_pylist()
        # seed every (source, keyword) combo: zero-hit rows survive the
        # aggregate exactly like keyword_hits' per-doc partials do
        rows: dict[tuple[str, str], list[int]] = {
            (sc, kw): [0, 0] for sc in set(src) for kw in self.keywords
        }
        for (di, ki), ends in self._scan_lockstep(texts).items():
            # greedy-from-left non-overlap == count_substring semantics
            n = 0
            last = 0
            L = self.lens[ki]
            for e in ends:
                if e - L >= last:
                    n += 1
                    last = e
            if n:
                acc = rows[(src[di], self.keywords[ki])]
                acc[0] += 1
                acc[1] += n
        if not rows:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "keyword": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        ks = sorted(rows)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "keyword": pa.array([k[1] for k in ks], pa.string()),
                "n_docs": pa.array([rows[k][0] for k in ks], pa.int64()),
                "n_hits": pa.array([rows[k][1] for k in ks], pa.int64()),
            }
        )


def keyword_hits_ac(
    sf_dir: str,
    *,
    keywords: tuple[str, ...] | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    actor_threshold: int = 64,
) -> rd.Dataset:
    """`keyword_hits` through the Aho-Corasick automaton: one combined
    scan per corpus pass regardless of dictionary size.  Row-identical to
    the per-keyword kernel scan (shared generated twin); documents with
    zero hits for a keyword contribute nothing, exactly like the
    (cnt > 0) partials.

    Dispatch: a SMALL dictionary (< ``actor_threshold`` keywords) builds
    the automaton ONCE on the driver and ships the KB-sized dense tables
    in the task closure — plain task pool, no actor spin-up (the round-4
    bench showed pool startup dominating the whole query at seconds
    scale).  A LARGE dictionary keeps the A4 actor-pool contract: the
    expensive automaton build runs once per actor in ``__init__``, never
    per task.

    Returns (source, keyword, n_docs, n_hits) sorted by (source, keyword).
    """
    from .textstats import KEYWORD_LIST

    kws = tuple(keywords) if keywords is not None else KEYWORD_LIST
    ds = sf_table(sf_dir, "documents", columns=["source", "text"])
    if len(kws) < actor_threshold:
        tagged = ds.map_batches(
            AhoCorasickTagger(kws), batch_format="pyarrow"
        )
    else:
        tagged = ds.map_batches(
            AhoCorasickTagger,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs={"keywords": kws},
        )
    agg = (
        tagged.groupby(["source", "keyword"])
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

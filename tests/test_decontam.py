"""Planted-corpus tests for the corpus-hygiene operators (decontaminate,
repetition_flags, normalized_dedup, rollup_pricing) — the sf testdata has no
normalized dups / duplicate lines, so these plant them explicitly."""

from __future__ import annotations


import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines import analytics, decontam
from ocr_engine_ray.pipelines import dedup as dd

BENCH_SENT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _write(tmp_path) -> str:
    texts = {
        # benchmark (src0)
        0: f"intro words then {BENCH_SENT} and some closing words",
        1: "a benchmark doc with no overlap at all in its phrasing",
        # training (src1): contaminated — contains the benchmark sentence
        10: f"training doc copying {BENCH_SENT} straight from the eval set",
        # training: clean
        11: "a perfectly clean training document about something else entirely",
        # training: too short for any 8-gram
        12: "only five words right here",
        # repetition cases
        13: "repeat line\nrepeat line\nunique line",  # dup_line_frac = 1/3
        14: "spam spam spam spam only one other word",  # top_word_frac = 0.5
        # normalization dups
        20: "Hello, World! This IS a Test.",
        21: "hello world this is a test",
        22: "hello   world\tthis is a test...",
        23: "a genuinely different document",
    }
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": "en",
            "source": "src0" if i < 10 else "src1",
            "n_chars": len(t),
        }
        for i, t in texts.items()
    ]
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    li = [
        {"l_returnflag": f, "l_linestatus": s, "l_extendedprice": p, "l_discount": dsc}
        for f, s, p, dsc in [
            ("A", "F", 100.0, 0.1),
            ("A", "F", 50.0, 0.0),
            ("A", "O", 10.0, 0.5),
            ("R", "F", 200.0, 0.25),
        ]
    ]
    pq.write_table(pa.Table.from_pylist(li), str(d / "lineitem.parquet"))
    return str(d)


class TestDecontaminate:
    def test_planted_contamination(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        rows = {r["doc_id"]: r for r in decontam.decontaminate(sf).take_all()}
        assert set(rows) == {10, 11, 12, 13, 14, 20, 21, 22, 23}  # train side only
        assert rows[10]["contaminated"]
        # 10-word shared run inside differing contexts → 3 shared 8-grams
        assert rows[10]["n_gram_hits"] == 3
        assert not rows[11]["contaminated"] and rows[11]["n_gram_hits"] == 0
        assert rows[12]["n_gram_hits"] == 0  # <8 words → no grams at all

    def test_no_benchmark_grams(self, ray_session, tmp_path):
        d = tmp_path / "c2"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pylist(
                [
                    {"doc_id": 0, "text": "short bench", "lang": "en",
                     "source": "src0", "n_chars": 11},
                    {"doc_id": 1, "text": " ".join(["w%d" % i for i in range(20)]),
                     "lang": "en", "source": "src1", "n_chars": 50},
                ]
            ),
            str(d / "documents.parquet"),
        )
        rows = decontam.decontaminate(str(d)).take_all()
        assert [(r["doc_id"], r["n_gram_hits"]) for r in rows] == [(1, 0)]


class TestRepetitionFlags:
    def test_planted_repetition(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        rows = {r["doc_id"]: r for r in decontam.repetition_flags(sf).take_all()}
        r13 = rows[13]
        assert r13["dup_line_frac"] == pytest.approx(round(1 / 3, 6))
        assert r13["flagged"]  # 0.333 > 0.30
        r14 = rows[14]
        assert r14["top_word_frac"] == 0.5 and r14["flagged"]
        assert not rows[11]["flagged"]

    def test_empty_text(self, ray_session, tmp_path):
        d = tmp_path / "c3"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": 0, "text": "", "lang": "en", "source": "s", "n_chars": 0}]
            ),
            str(d / "documents.parquet"),
        )
        (r,) = decontam.repetition_flags(str(d)).take_all()
        assert r["dup_line_frac"] == 0.0 and r["top_word_frac"] == 0.0
        assert not r["flagged"]


class TestNormalizedDedup:
    def test_reformatted_copies_collapse(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        survivors = {r["doc_id"] for r in dd.normalized_dedup(sf).take_all()}
        # 20/21/22 normalize to the same string -> keep-first 20 only
        assert 20 in survivors
        assert 21 not in survivors and 22 not in survivors
        assert 23 in survivors
        # everything else is unique post-normalization
        assert survivors == {0, 1, 10, 11, 12, 13, 14, 20, 23}

    def test_sorted_output(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        ids = [r["doc_id"] for r in dd.normalized_dedup(sf).take_all()]
        assert ids == sorted(ids)


class TestRollupPricing:
    def test_levels_exact(self, ray_session, tmp_path):
        sf = _write(tmp_path)
        rows = analytics.rollup_pricing(sf).take_all()
        by_key = {(r["l_returnflag"], r["l_linestatus"]): r for r in rows}
        assert by_key[("A", "F")]["sum_disc_price"] == pytest.approx(140.0)
        assert by_key[("A", "F")]["n_items"] == 2
        assert by_key[("A", "O")]["sum_disc_price"] == pytest.approx(5.0)
        assert by_key[("A", None)]["sum_disc_price"] == pytest.approx(145.0)
        assert by_key[("A", None)]["n_items"] == 3
        assert by_key[(None, None)]["sum_disc_price"] == pytest.approx(295.0)
        assert by_key[(None, None)]["n_items"] == 4
        assert len(rows) == 3 + 2 + 1  # fine + per-flag + grand total


class TestCurateTrainingMix:
    def test_composition_semantics(self, ray_session, tmp_path):
        """Each stage's effect is visible on the planted corpus: benchmark
        docs gone, contaminated doc gone, flagged docs gone, reformatted
        copies collapsed, survivors packed in doc_id order."""
        from ocr_engine_ray.pipelines import curate

        sf = _write(tmp_path)
        rows = curate.curate_training_mix(sf, alpha=1.0).take_all()
        ids = [r["doc_id"] for r in rows]
        assert 0 not in ids and 1 not in ids      # benchmark side excluded
        assert 10 not in ids                      # contaminated
        assert 13 not in ids and 14 not in ids    # repetition-flagged
        assert 21 not in ids and 22 not in ids    # normalized dups of 20
        # 23 ("a genuinely different document") has 4 distinct words ->
        # top_word_frac 0.25 > 0.20: legitimately repetition-flagged
        assert ids == [11, 12, 20]
        # alpha=1.0 -> no rebalance drop; offsets are per-source cumsums
        by_src: dict[str, int] = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["tok_offset"] == by_src.get(r["source"], 0)
            by_src[r["source"]] = r["tok_offset"] + r["n_tokens"]

    def test_empty_benchmark_only_corpus(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines import curate

        d = tmp_path / "b"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": 0, "text": "only benchmark", "lang": "en",
                  "source": "src0", "n_chars": 14}]
            ),
            str(d / "documents.parquet"),
        )
        assert curate.curate_training_mix(str(d)).take_all() == []


class TestDuplicateNgramSpans:
    def test_planted_boilerplate(self, ray_session, tmp_path):
        """Docs sharing a licence-style 8-gram block are counted position-
        exactly; unique docs and repeated-within-one-doc grams don't fire."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.decontam import duplicate_ngram_spans

        boiler = "this content is licensed under creative commons attribution terms"
        rows = [
            {"doc_id": 0, "text": f"{boiler} alpha beta", "lang": "en",
             "source": "s", "n_chars": 0},
            {"doc_id": 1, "text": f"intro words {boiler}", "lang": "en",
             "source": "s", "n_chars": 0},
            # unique doc: no cross-doc grams
            {"doc_id": 2, "text": "completely unrelated text with many words "
                                  "that never repeat elsewhere at all today",
             "lang": "en", "source": "s", "n_chars": 0},
            # repeats WITHIN one doc only: count(DISTINCT doc) == 1, no fire
            {"doc_id": 3, "text": ("w1 w2 w3 w4 w5 w6 w7 w8 " * 3).strip(),
             "lang": "en", "source": "s", "n_chars": 0},
        ]
        d = tmp_path / "dup"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = {r["doc_id"]: r["n_dup_positions"]
               for r in duplicate_ngram_spans(str(d)).take_all()}
        # boiler = 9 words -> 2 grams per doc; both docs' 2 positions fire
        assert got == {0: 2, 1: 2}


class TestParagraphDedup:
    def test_planted_paragraph_dups(self, ray_session, tmp_path):
        """Corpus-wide keep-first at paragraph granularity: a licence block
        shared by four docs survives only in the earliest (doc_id, position)
        instance; within-doc repeats and empty-paragraph dups also drop.
        Pinned by hand AND against the DuckDB unnest twin (the sf testdata
        is single-paragraph, so this planted corpus is what actually
        exercises the sub-document path)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entry
        from ocr_engine_ray.pipelines import dedup as dd

        texts = {
            0: "unique intro\n\nSHARED LICENCE BLOCK\n\nbody zero",
            1: "SHARED LICENCE BLOCK\n\nbody one",
            2: "body two\n\nSHARED LICENCE BLOCK",
            3: "SHARED LICENCE BLOCK",          # whole doc is a dup
            4: "body two\n\nbody two",          # cross-doc AND within-doc dup
            5: "",                               # first empty paragraph: kept
            6: "",                               # empty dup: dropped
            7: "a\n\n\n\nb",                     # middle "" dups doc 5's
        }
        rows = [
            {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
            for i, t in texts.items()
        ]
        d = tmp_path / "paras"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

        got = dd.paragraph_dedup(str(d)).take_all()
        by_doc = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_chars"]) for r in got}
        assert by_doc == {
            0: (3, 3, 12 + 20 + 9),
            1: (2, 1, len("body one")),
            2: (2, 1, len("body two")),
            3: (1, 0, 0),
            4: (2, 0, 0),
            5: (1, 1, 0),
            6: (1, 0, 0),
            7: (3, 2, 2),
        }

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(entry.oracle_sql()["paragraph_dedup"]).fetch_arrow_table()
        assert [
            (r["doc_id"], r["n_paras"], r["n_kept"], r["kept_chars"]) for r in got
        ] == list(
            zip(*(want.column(c).to_pylist() for c in
                  ("doc_id", "n_paras", "n_kept", "kept_chars")))
        )

    def test_bucket_count_invariance(self, ray_session, tmp_path):
        """Results are a pure function of the corpus, not of num_buckets."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines import dedup as dd

        rows = [
            {"doc_id": i, "text": f"shared\n\nbody {i % 3}", "lang": "en",
             "source": "s", "n_chars": 0}
            for i in range(12)
        ]
        d = tmp_path / "inv"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        a = dd.paragraph_dedup(str(d), num_buckets=3).take_all()
        b = dd.paragraph_dedup(str(d), num_buckets=64).take_all()
        assert a == b and len(a) == 12


class TestLineWordStatsBatch:
    """`line_word_stats_batch` must be value-identical to the historical
    per-doc split/Counter loop it replaced in repetition_flags and
    curate_training_mix's hygiene pass."""

    @staticmethod
    def _naive(texts):
        import re
        from collections import Counter

        wr = re.compile(r"[0-9A-Za-z_]+")
        out = []
        for t in texts:
            t = t or ""
            lines = t.split("\n")
            words = wr.findall(t.lower())
            top = Counter(words).most_common(1)[0][1] if words else 0
            out.append((len(lines), len(set(lines)), len(words), top))
        return out

    def test_handwritten_edges(self):
        texts = [
            "", None, "\n", "\n\n", "a\nb\na", "a a a b", "..!!", "_1 _1",
            "x" * 5, "line\nline\nline", "é ø_1 _1", "tab\tsep words words",
        ]
        nl, nu, nw, tc = decontam.line_word_stats_batch(texts)
        got = list(zip(nl.tolist(), nu.tolist(), nw.tolist(), tc.tolist()))
        assert got == self._naive(texts)

    def test_empty_batch(self):
        nl, nu, nw, tc = decontam.line_word_stats_batch([])
        assert len(nl) == len(nu) == len(nw) == len(tc) == 0

    def test_hypothesis_agreement(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.none(),
                    st.text(
                        alphabet=st.characters(
                            codec="utf-8", exclude_characters=["\x00"]
                        ),
                        max_size=80,
                    ),
                ),
                max_size=12,
            )
        )
        def check(texts):
            nl, nu, nw, tc = decontam.line_word_stats_batch(texts)
            got = list(zip(nl.tolist(), nu.tolist(), nw.tolist(), tc.tolist()))
            assert got == self._naive(texts)

        check()


class TestGramRowsBatch:
    """`gram_rows_batch` must induce the same gram IDENTITY as the per-doc
    string-hash reference (`_gram_hashes` / `_gram_hashes_all`): same
    distinct-gram count and positional multiplicities per doc, and the same
    cross-doc gram-set intersections (hash VALUES differ by design — they
    never surface in gated outputs)."""

    @staticmethod
    def _naive_grams(t, n):
        import re

        wr = re.compile(r"[0-9A-Za-z_]+")
        words = wr.findall((t or "").lower())
        return [
            " ".join(words[i : i + n]) for i in range(max(0, len(words) - n + 1))
        ]

    def _check(self, texts, n):
        from collections import Counter

        rows, g, cnt = decontam.gram_rows_batch(texts, n)
        got = {i: {} for i in range(len(texts))}
        for r, h, c in zip(rows.tolist(), g.tolist(), cnt.tolist()):
            got[r][h] = c
        # per-doc multiplicity multisets match the string reference
        str_grams = [Counter(self._naive_grams(t, n)) for t in texts]
        h2s: dict[tuple[int, int], str] = {}
        for i, sc in enumerate(str_grams):
            assert sorted(got[i].values()) == sorted(sc.values()), (i, texts[i])
        # cross-doc intersections match (hash identity == string identity)
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                want = len(set(str_grams[i]) & set(str_grams[j]))
                have = len(set(got[i]) & set(got[j]))
                assert want == have, (i, j, texts[i], texts[j])

    def test_handwritten(self):
        texts = [
            "a b c d e", "a b c d e", "a b c d e f", "b c d e a",
            "", None, "one two", "a a a a a", "x Y z w X y Z W",
        ]
        self._check(texts, 4)

    def test_hypothesis_agreement(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        words = st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "Zz", "_1", "é"]),
            max_size=14,
        ).map(" ".join)

        @settings(max_examples=150, deadline=None)
        @given(st.lists(st.one_of(st.none(), words), max_size=8),
               st.integers(min_value=2, max_value=4))
        def check(texts, n):
            self._check(texts, n)

        check()


class TestGramNovelty:
    def _write(self, tmp_path, texts: dict[int, str]) -> str:
        rows = [
            {"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)}
            for i, t in texts.items()
        ]
        d = tmp_path / "novelty"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        return str(d)

    _SENT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

    def test_planted_novelty(self, ray_session, tmp_path):
        sf = self._write(
            tmp_path,
            {
                0: self._SENT,                       # first occurrence: all novel
                1: self._SENT,                       # verbatim restatement: 0 novel
                2: "one two three four five six seven eight nine ten",  # fresh
                3: "too short for an eight gram",    # < 8 words: no row
            },
        )
        got = {r["doc_id"]: r for r in decontam.gram_novelty(sf).take_all()}
        assert set(got) == {0, 1, 2}
        assert got[0]["novelty"] == 1.0 and got[0]["n_grams"] == 3
        assert got[1]["novelty"] == 0.0 and got[1]["n_novel"] == 0
        assert got[2]["novelty"] == 1.0

    def test_matches_duckdb_twin(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        sf = self._write(
            tmp_path,
            {
                0: self._SENT + " closing words here",
                1: "prefix words then " + self._SENT,
                2: "one two three four five six seven eight nine",
                5: "Mixed CASE tokens one two three four five six seven",
            },
        )
        got = decontam.gram_novelty(sf).take_all()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(
            entry.oracle_sql()["gram_novelty"] + " ORDER BY doc_id"
        ).fetchall()
        assert [
            (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty"]) for r in got
        ] == [tuple(w) for w in want]

    def test_bucket_count_invariance(self, ray_session, tmp_path):
        sf = self._write(
            tmp_path,
            {i: self._SENT + f" tail{i % 2}" for i in range(10)},
        )
        a = decontam.gram_novelty(sf, num_buckets=3).take_all()
        b = decontam.gram_novelty(sf, num_buckets=64).take_all()
        assert a == b


class TestGopherQualityFlags:
    def _naive(self, text: str):
        import re

        toks = re.findall(r"[^ \t\n\f\r]+", text or "")
        if not toks:
            return None
        nw = len(toks)
        sl = sum(len(t) for t in toks)
        na = sum(1 for t in toks if re.search(r"[A-Za-z]", t))
        ns = sum(1 for t in toks if t.lower() in decontam.GOPHER_STOPWORDS)
        sym = (text or "").count("#") + len(re.findall(r"\.\.\.", text or ""))
        return nw, sl, na, ns, sym

    def test_signals_match_naive(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=150, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.none(),
                    st.text(
                        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                        max_size=40,
                    ),
                    st.sampled_from(
                        ["the cat and ### dog...", "  ", "a\tb\nc", "x...y...z"]
                    ),
                ),
                max_size=8,
            )
        )
        def check(texts):
            nw, sl, na, ns, sym = decontam.gopher_quality_signals_batch(texts)
            for i, t in enumerate(texts):
                want = self._naive(t or "")
                got = (nw[i], sl[i], na[i], ns[i], sym[i])
                if want is None:
                    assert got[0] == 0
                else:
                    assert got == want, (t, got, want)

        check()

    def test_planted_flags(self, ray_session, tmp_path):
        good = ("the quick brown fox jumps over the lazy dog and that "
                "pack of zebras went to be with all of those other fine "
                "animals that have come along with the caravan to see "
                "the wide river of the southern valley and the hills "
                "where the herd waits beside the old stone bridge that "
                "spans the slow water")  # 57 words, mean len ~4, 25 stopwords
        rows = [
            {"doc_id": 0, "text": good, "lang": "en", "source": "s",
             "n_chars": len(good)},
            {"doc_id": 1, "text": "way too short", "lang": "en", "source": "s",
             "n_chars": 13},   # word-count floor
            {"doc_id": 2, "text": "### " * 60, "lang": "en", "source": "s",
             "n_chars": 240},  # symbol ratio + no alpha
            {"doc_id": 3, "text": "", "lang": "en", "source": "s",
             "n_chars": 0},    # tokenless: no row
        ]
        d = tmp_path / "gopher"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = {r["doc_id"]: r
               for r in decontam.gopher_quality_flags(str(d)).take_all()}
        assert set(got) == {0, 1, 2}
        assert got[0]["gopher_pass"] and got[0]["stopword_count"] >= 2
        assert not got[1]["gopher_pass"]
        assert not got[2]["gopher_pass"]
        assert got[2]["alpha_word_frac"] == 0.0

        import duckdb

        import __ray_entry__ as entry

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(
            entry.oracle_sql()["gopher_quality_flags"] + " ORDER BY doc_id"
        ).fetchall()
        assert [
            (r["doc_id"], r["n_words"], r["mean_word_len"], r["alpha_word_frac"],
             r["symbol_ratio"], r["stopword_count"], r["gopher_pass"])
            for r in sorted(got.values(), key=lambda r: r["doc_id"])
        ] == [tuple(w) for w in want]

def test_novelty_collapse_exact_byte_identical(ray_session, tmp_path):
    """The crawl-scale collapsed gram_novelty path must equal the direct
    path on a duplicate-heavy corpus (groups of identical texts, a fresh
    doc, partial restatements, and sub-8-word texts)."""
    texts = {}
    base = TestGramNovelty._SENT
    for i in range(6):
        texts[i] = base              # one big exact group
    texts[6] = base + " extra closing words"   # near-dup, not exact
    texts[7] = "one two three four five six seven eight nine ten"
    texts[8] = texts[7]              # second exact group
    texts[9] = "short text"          # no grams (and an exact twin below)
    texts[10] = "short text"
    texts[11] = "prefix words then " + base    # shares grams with group 1
    sf = TestGramNovelty()._write(tmp_path, texts)
    direct = decontam.gram_novelty(sf).take_all()
    collapsed = decontam.gram_novelty(sf, collapse_exact=True).take_all()
    assert direct == collapsed
    # and the first member of each exact group owns the novelty
    by_doc = {r["doc_id"]: r for r in collapsed}
    assert by_doc[0]["novelty"] == 1.0
    assert all(by_doc[i]["novelty"] == 0.0 for i in range(1, 6))
    assert 9 not in by_doc and 10 not in by_doc

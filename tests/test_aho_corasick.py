"""Aho-Corasick actor-pool tagging, pinned equal to the kernel scan."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.tagger import AhoCorasickTagger, keyword_hits_ac
from ocr_engine_ray.pipelines.textstats import keyword_hits

SF = "/root/testdata/sf0.001"


def test_scan_counts_match_str_count_fuzz():
    """The automaton's greedy non-overlap counts equal str.count (the
    count_substring semantics) on adversarial overlapping patterns."""
    kws = ("aa", "aba", "ab", "b", "abab")
    tagger = AhoCorasickTagger(kws)
    rng = random.Random(3)
    texts = ["aaaa", "ababab", "", "b" * 7, "abba abab aab"]
    texts += ["".join(rng.choice("ab ") for _ in range(rng.randint(0, 30))) for _ in range(300)]
    for t in texts:
        ends = tagger._scan(t)
        for ki, kw in enumerate(kws):
            n, last = 0, 0
            for e in ends[ki]:
                if e - len(kw) >= last:
                    n += 1
                    last = e
            assert n == t.count(kw), (t, kw)


@pytest.mark.usefixtures("ray_session")
class TestKeywordHitsAC:
    def test_equals_kernel_scan(self):
        a = [tuple(r.values()) for r in keyword_hits_ac(SF).take_all()]
        b = [tuple(r.values()) for r in keyword_hits(SF).take_all()]
        assert a == b

    def test_custom_overlapping_dictionary(self, tmp_path):
        d = tmp_path / "docs"
        d.mkdir()
        texts = ["the spark sparks sparked", "no hits", "spark spark spark"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(3), pa.int64()),
                    "source": pa.array(["s0", "s0", "s1"], pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        kws = ("spark", "sparks", "park")
        a = [tuple(r.values()) for r in keyword_hits_ac(str(d), keywords=kws).take_all()]
        b = [tuple(r.values()) for r in keyword_hits(str(d), keywords=kws).take_all()]
        assert a == b
